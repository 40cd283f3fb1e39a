"""Merge-on-read vs copy-on-write epoch cost on a pre-seeded table.

The round-5 bench showed the streaming wall's top term is the
ManifestParquetSink's bucket-granular CoW MERGE: md5-uniform keys touch
every bucket once a batch holds >~n_buckets keys, so each epoch rewrites
~the whole table. The fix is Iceberg's second write mode — merge-on-read
(manifest.py merge_strategy='mor'): each epoch appends batch-sized delta
files and reads/compaction resolve them.

This script is the VERDICT-r5 #2 done-criterion measurement: the SAME
event stream applied through ApplyJob into a CoW sink and a MoR sink,
each pre-seeded with a table SEED_FACTORS[x] times larger than the
stream's own key space. CoW's per-epoch wall grows with the seeded table
size; MoR's stays ~flat (batch-proportional). Afterwards the MoR table
is folded (rewrite_data_files) and checked row/hash-equal to the CoW
table — parity on the full streamed input, not a crafted fixture.

Writes BENCH/MOR_MERGE_r6.md. Usage: python BENCH/mor_merge.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SEED_FACTORS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SEED_FACTORS", "1,10,50").split(",")
)
#: best-of-N per (strategy, factor) cell — the first streaming query of a
#: session pays JVM warm-up, which a single-trial protocol books entirely
#: to whichever cell runs first
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))


def seed_batch(spark, n_keys: int):
    """n_keys deterministic synthetic rows in collapsed form (epoch-0
    seed merge). Keys are disjoint from the stream's (repo prefix), so the
    seed only grows the table the stream must merge INTO."""
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.operators.reassemble import COLLAPSED_SCHEMA

    return (
        spark.range(n_keys)
        .select(
            F.concat(F.lit("seed-repo-"), (F.col("id") % 97).cast("string")).alias("repo"),
            F.concat(F.lit("seed/"), F.col("id").cast("string")).alias("path"),
            F.lit("I").alias("row_status"),
            F.create_map(
                F.lit("commit"), F.md5(F.col("id").cast("string")),
                F.lit("lang"), F.lit("py"),
                F.lit("content"), F.repeat(F.md5((F.col("id") + 1).cast("string")), 4),
            ).alias("image"),
            F.lit(True).alias("full_image"),
            F.col("id").alias("gtid_seq"),
            F.lit(1).alias("schema_version"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("updated_ts"),
        )
        .select([f.name for f in COLLAPSED_SCHEMA.fields])
    )


def main() -> int:
    from pyspark.sql import functions as F

    from bench import _write_binlog_files, amplified_events
    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.session import get_spark
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    spark = get_spark("mtm-mor-merge", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    tmp = tempfile.mkdtemp(prefix="mtm_mor_")

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    n_stream_keys = ev.select("repo", "path").distinct().count()
    n_events = ev.where(F.col("op").isin("I", "U", "D")).count()
    n_ep = 4
    bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
    file_of = F.lit(0)
    for b in bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    binlog = os.path.join(tmp, "binlog")
    _write_binlog_files(spark, ev, tmp, binlog, n_ep, file_of)

    # maxFilesPerTrigger=4 -> 4 micro-batches of the 16 epoch files, so
    # the per-epoch merge cost is sampled 4x per run
    cfg = EngineConfig(
        shuffle_partitions=int(CPUS), max_files_per_trigger=4, write_changelog=False
    )

    results = []
    tables = {}
    try:
        for factor in SEED_FACTORS:
            n_seed = n_stream_keys * factor
            seed = seed_batch(spark, n_seed).persist()
            seed.count()
            for strategy in ("cow", "mor"):
                tag = f"{strategy}_x{factor}"
                cell = []
                for t in range(TRIALS):
                    root = os.path.join(tmp, f"sink_{tag}_t{t}")
                    sink = ManifestParquetSink(
                        spark, root, n_buckets=int(CPUS), merge_strategy=strategy
                    )
                    t0 = time.time()
                    sink.merge(seed, epoch_id=0)
                    seed_wall = time.time() - t0
                    t0 = time.time()
                    ApplyJob(
                        spark, binlog, sink, cfg,
                        checkpoint_dir=os.path.join(tmp, f"ckpt_{tag}_t{t}"),
                    ).run_available(timeout_sec=3500)
                    stream_wall = time.time() - t0
                    cell.append((stream_wall, seed_wall, sink))
                stream_wall, seed_wall, sink = min(cell, key=lambda c: c[0])
                # bytes the STREAM epochs wrote (excludes the seed commit):
                # the load-independent scale metric — CoW rewrites ~the
                # whole table per epoch, MoR appends ~the batch
                stream_bytes = 0
                for dirpath, _dirs, files in os.walk(os.path.join(sink.root, "data")):
                    seg = os.path.relpath(dirpath, os.path.join(sink.root, "data"))
                    if seg.split(os.sep)[0].startswith("s000001"):
                        continue  # the seed merge's own snapshot
                    stream_bytes += sum(
                        os.path.getsize(os.path.join(dirpath, fn))
                        for fn in files
                        if fn.endswith(".parquet")
                    )
                r = {
                    "strategy": strategy,
                    "seed_factor": factor,
                    "seed_rows": n_seed,
                    "seed_merge_sec": round(seed_wall, 2),
                    "stream_sec": round(stream_wall, 2),
                    "per_epoch_sec": round(stream_wall / n_ep, 2),
                    "write_mb_per_epoch": round(stream_bytes / n_ep / (1 << 20), 1),
                    "trials": [round(c[0], 2) for c in cell],
                }
                results.append(r)
                tables[tag] = sink
                print(json.dumps(r), flush=True)
            seed.unpersist()

        # parity: fold each MoR table and compare to its CoW twin
        parity = {}
        for factor in SEED_FACTORS:
            mor = tables[f"mor_x{factor}"]
            fold = mor.rewrite_data_files()
            cow_df, mor_df = tables[f"cow_x{factor}"].read(), mor.read()

            def fingerprint(df):
                cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(df.columns)]
                return df.agg(
                    F.count("*").alias("n"),
                    F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                ).head()

            a, b = fingerprint(cow_df), fingerprint(mor_df)
            parity[f"x{factor}"] = {
                "rows_cow": a["n"], "rows_mor": b["n"],
                "hash_equal": bool(a["h"] == b["h"] and a["n"] == b["n"]),
                "fold": fold,
            }
            print(json.dumps(parity[f"x{factor}"]), flush=True)

        by = {(r["strategy"], r["seed_factor"]): r for r in results}
        f0, f1 = SEED_FACTORS[0], SEED_FACTORS[-1]
        cow_growth = by[("cow", f1)]["per_epoch_sec"] / by[("cow", f0)]["per_epoch_sec"]
        mor_growth = by[("mor", f1)]["per_epoch_sec"] / by[("mor", f0)]["per_epoch_sec"]
        lines = [
            "# BENCH/MOR_MERGE_r6.md — merge-on-read vs copy-on-write epoch cost",
            "",
            f"Input: sf0.1 sql-mode log amplify x{AMPLIFY} = {n_events:,} row events over",
            f"{n_stream_keys:,} keys, ApplyJob AvailableNow in {n_ep} micro-batches,",
            f"local[{CPUS}], {CPUS} buckets. Each sink pre-seeded (epoch 0) with",
            f"seed_factor x {n_stream_keys:,} disjoint keys before the stream runs.",
            "",
            "| strategy | seed x | seeded rows | stream wall | per-epoch | MB written/epoch |",
            "|---|---|---|---|---|---|",
        ]
        for r in results:
            lines.append(
                f"| {r['strategy']} | {r['seed_factor']} | {r['seed_rows']:,} "
                f"| {r['stream_sec']}s | {r['per_epoch_sec']}s "
                f"| {r['write_mb_per_epoch']} |"
            )
        cow_wgrowth = (
            by[("cow", f1)]["write_mb_per_epoch"] / by[("cow", f0)]["write_mb_per_epoch"]
        )
        mor_wgrowth = (
            by[("mor", f1)]["write_mb_per_epoch"] / by[("mor", f0)]["write_mb_per_epoch"]
        )
        lines += [
            "",
            f"Per-epoch WALL growth {f0}x -> {f1}x table size: CoW **{cow_growth:.2f}x**, "
            f"MoR **{mor_growth:.2f}x**. Per-epoch BYTES-WRITTEN growth (the",
            "load-independent scale metric — wall hides the rewrite under fixed",
            f"costs at this absolute table size): CoW **{cow_wgrowth:.2f}x**, MoR "
            f"**{mor_wgrowth:.2f}x** (1.0 = fully table-size-independent — the",
            "scale property frequent-trigger streaming needs at 100 TB).",
            "",
            "Parity after rewrite_data_files() folds the MoR deltas:",
        ]
        for k, p in parity.items():
            lines.append(
                f"* seed {k}: rows {p['rows_cow']:,} vs {p['rows_mor']:,}, "
                f"hash_equal={p['hash_equal']}, fold={p['fold']}"
            )
        md = "\n".join(lines) + "\n"
        with open(os.path.join(REPO, "BENCH", "MOR_MERGE_r6.md"), "w") as f:
            f.write(md)
        print(md)
        assert all(p["hash_equal"] for p in parity.values()), "MoR/CoW parity broken"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
