"""Round-7 (session 3): why is the plain stream leg ~1.5-2 s slower inside
bench.py than in an isolated harness?

Reproduces the bench's leg ORDER in one JVM: run_cdc(pandas) + run_cdc(sql)
first (like bench trial order), then the plain stream leg — vs a control
that runs the stream leg first. If order matters, some session state the
replay legs leave behind (Arrow batch tune, broadcast/cache pressure, GC)
taxes the streaming epochs.

Usage: python BENCH/stream_context_probe_r7.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(
        "mtm-ctx-probe", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    from bench import _write_binlog_files, amplified_events

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.plans.replay import replay_batch
    from mysql_time_machine_spark.schema import BASE_COLUMNS
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    tmp = tempfile.mkdtemp(prefix="mtm_ctx_")
    n_ep = 4
    qs_bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
    file_of = F.lit(0)
    for b in qs_bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    _write_binlog_files(spark, ev, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)

    def run_cdc(impl):
        out = replay_batch(
            ev, list(BASE_COLUMNS), EngineConfig(shuffle_partitions=int(CPUS)), impl=impl
        )
        out.agg(F.sum(F.crc32("content")), F.sum(F.crc32("commit")), F.count("*")).collect()

    def run_stream(tag):
        sink = ManifestParquetSink(
            spark, os.path.join(tmp, f"sink_{tag}"), n_buckets=int(CPUS)
        )
        cfg = EngineConfig(
            shuffle_partitions=int(CPUS), max_files_per_trigger=8, write_changelog=False
        )
        t0 = time.time()
        ApplyJob(
            spark,
            os.path.join(tmp, "binlog"),
            sink,
            cfg,
            checkpoint_dir=os.path.join(tmp, f"ckpt_{tag}"),
        ).run_available(timeout_sec=3500)
        return round(time.time() - t0, 3)

    try:
        res = {}
        # warm everything once (cold JVM pays codegen/planning either way)
        res["stream_cold"] = run_stream("w0")
        res["stream_warm_clean"] = run_stream("w1")
        for t in range(3):
            t0 = time.time()
            run_cdc("pandas")
            p = round(time.time() - t0, 3)
            t0 = time.time()
            run_cdc("sql")
            s = round(time.time() - t0, 3)
            res[f"trial{t}"] = {
                "pandas": p,
                "sql": s,
                "stream_after_replays": run_stream(f"t{t}"),
                "stream_again": run_stream(f"t{t}b"),
            }
            print(json.dumps({f"trial{t}": res[f"trial{t}"]}), flush=True)
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
