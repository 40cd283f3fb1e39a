"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the north-star path: end-to-end CDC apply — simulated
binlog stream -> salted applyInPandas reassembly -> fenced manifest MERGE —
reported both as wall seconds and derived change-events/sec. Scaling
evidence across parallelism levels lives in BENCH/scaling.py (writes
BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
#: event-log amplification for the CDC apply benchmark (churn is replayed
#: K times with shifted gtids — deterministic, no RNG)
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))


def amplified_events(spark, sf_dir, k):
    """sql_mode churn replayed k times with shifted (gtid, key-suffix) — a
    deterministic way to scale event volume without external data."""
    from pyspark.sql import functions as F

    from fixtures.gen_binlog import sql_mode_events

    ev = sql_mode_events(spark, sf_dir)
    if k <= 1:
        return ev
    max_gtid = 1_000_000_000
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    return (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("gtid_seq", F.col("gtid_seq") + F.col("_rep") * max_gtid)
        .withColumn("txn_id", F.col("txn_id") + F.col("_rep") * max_gtid)
        .drop("_rep")
    )


def main():
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    sf = float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else None
    spark = get_spark("mtm-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # warm the JVM/file listing outside the timed region
    for t in ("events", "documents", "embeddings", "lineitem", "customer", "orders"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    # -- headline: end-to-end CDC apply (batch replay of the amplified log) --
    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    n_row_events = ev.where(F.col("op").isin("I", "U", "D")).count()

    def run_cdc(impl):
        from mysql_time_machine_spark.config import EngineConfig
        from mysql_time_machine_spark.plans.replay import replay_batch
        from mysql_time_machine_spark.schema import BASE_COLUMNS

        out = replay_batch(ev, list(BASE_COLUMNS), EngineConfig(shuffle_partitions=int(CPUS)), impl=impl)
        # force full materialization of every column (checksum, no collect)
        out.agg(F.sum(F.crc32("content")), F.sum(F.crc32("commit")), F.count("*")).collect()

    timed("cdc_replay_pandas", lambda: run_cdc("pandas"))
    timed("cdc_replay_sql", lambda: run_cdc("sql"))
    extra["cdc_row_events"] = n_row_events
    extra["cdc_events_per_sec_pandas"] = round(n_row_events / timings["cdc_replay_pandas"], 1)
    extra["cdc_events_per_sec_sql"] = round(n_row_events / timings["cdc_replay_sql"], 1)

    # -- streaming apply with the fenced sink (the full north-star path) -----
    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    tmp = tempfile.mkdtemp(prefix="mtm_bench_")
    try:
        binlog_dir = os.path.join(tmp, "binlog")
        os.makedirs(binlog_dir)
        # 4 epoch files, written sequentially (setup, untimed)
        n_ep = 4
        for e in range(n_ep):
            ev.where(F.pmod(F.col("txn_id"), n_ep) == e).coalesce(4).write.parquet(
                os.path.join(tmp, f"stage{e}")
            )
            for i, fn in enumerate(sorted(os.listdir(os.path.join(tmp, f"stage{e}")))):
                if fn.endswith(".parquet"):
                    shutil.copyfile(
                        os.path.join(tmp, f"stage{e}", fn),
                        os.path.join(binlog_dir, f"epoch-{e:03d}-{i:02d}.parquet"),
                    )
            time.sleep(0.05)

        def run_stream():
            sink = ManifestParquetSink(spark, os.path.join(tmp, "sink"), n_buckets=int(CPUS))
            cfg = EngineConfig(shuffle_partitions=int(CPUS), max_files_per_trigger=8, write_changelog=False)
            ApplyJob(spark, binlog_dir, sink, cfg, checkpoint_dir=os.path.join(tmp, "ckpt")).run_available()

        timed("cdc_stream_apply", run_stream)
        extra["cdc_stream_events_per_sec"] = round(n_row_events / timings["cdc_stream_apply"], 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # -- operator headliners ---------------------------------------------------
    qs = entry_mod.queries()
    for name in (
        "q1_pricing_summary",
        "w1_lww_collapse",
        "events_enriched",
        "dedup_exact",
        "dedup_simhash",
        "sim_bruteforce_topk",
        "text_quality",
        "mm_media_features",
    ):
        df_fn = qs[name]
        timed(name, lambda f=df_fn: f(spark, SF_DIR).agg(F.count("*")).collect())

    timed(
        "dedup_minhash_lsh",
        lambda: qs["dedup_minhash_lsh"](spark, SF_DIR).agg(F.count("*")).collect(),
    )
    def run_simhash_pairs():
        extra["simhash_pairs_found"] = qs["dedup_simhash_pairs"](spark, SF_DIR).agg(
            F.count("*")
        ).collect()[0][0]

    timed("dedup_simhash_pairs", run_simhash_pairs)
    # scale evidence for the pigeonhole banding: candidates examined by the
    # banded equi-join vs the all-pairs count it replaces
    from mysql_time_machine_spark.operators.dedup import _simhash_chunks, simhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select(F.col("lang"), simhash("text").alias("h")).localCheckpoint(eager=True)

    def banded_candidates(df):
        chunked = df.select(
            "lang",
            F.explode(
                F.array(*[F.struct(F.lit(i).alias("ci"), cv.alias("cv"))
                          for i, cv in enumerate(_simhash_chunks(F.col("h"), 5))])
            ).alias("c"),
        ).select("lang", "c.ci", "c.cv")
        return int(
            chunked.groupBy("lang", "ci", "cv").count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
            .head()[0]
        )

    # the operator bands DISTINCT (lang, fingerprint) representatives —
    # candidate volume is quadratic in distinct fingerprints per bucket,
    # never in docs; the doc-level number is what the pre-round-3 banding
    # paid (the identical-fingerprint mega-bucket floor)
    extra["simhash_banded_candidates"] = banded_candidates(base.distinct())
    extra["simhash_doclevel_candidates"] = banded_candidates(base)
    n_docs = docs.count()
    langs = docs.groupBy("lang").count().agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).head()[0]
    extra["simhash_allpairs_within_lang"] = int(langs)
    extra["simhash_n_docs"] = n_docs
    # interpretability: this synthetic corpus is dup-dense (seeded near-dups
    # + templated text), so the pair OUTPUT is bounded below by true pairs;
    # the distinct-fingerprint count is what the banding is now quadratic in
    extra["simhash_distinct_fingerprints"] = base.select("h").distinct().count()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end-to-end CDC apply + operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(CPUS),
                "amplify": AMPLIFY,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
