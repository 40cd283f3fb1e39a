"""Round-7 continuation evidence: the per-epoch Arrow width estimate vs
the direct byte cap.

Two measurements:

1. A/B of the streaming job's per-epoch stats aggregate WITH and WITHOUT
   the ``avg(event_payload_bytes())`` width term, on the bench's amplified
   event log (sf0.1, amplify 10, local[32]). The width term forces the
   scan to read + length-fold BOTH map columns; the narrow aggregate
   (count/max-ts/max-gtid) reads none of them. Measured (warm best):
   no-width 0.28 s, width 1.01 s per full pass — the term was ~3x the
   rest of the aggregate, paid once per micro-batch.

2. Behavioral probe that ``spark.sql.execution.arrow.maxBytesPerBatch``
   (Spark 4; default 64m in this build, pinned to 128 MiB by
   session.get_spark) chunks mapInPandas transfers BY BYTES: with a 4 MB
   cap and ~200 KB rows the Python kernel receives ~20-row batches where
   the records ceiling alone would deliver 100k. GroupedPythonArrowInput
   honors the same conf, so grouped-map kernels are covered too.

Conclusion (shipped in r7 continuation): the streaming job's per-epoch
width estimate + tune + restore machinery is removed; the byte cap is the
hard fat-row guard. Plain streaming leg at bench conditions: 4.97 s ->
4.62 s warm (stats-agg per epoch 0.19-0.24 s -> 0.13-0.16 s).

Usage: PYTHONPATH=/root/repo python BENCH/arrow_bytecap_r7.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import pandas as pd

    from mysql_time_machine_spark.functions.core import classify_event, event_payload_bytes
    from mysql_time_machine_spark.session import get_spark

    spark = get_spark("arrow-bytecap-ab", master="local[32]", shuffle_partitions=32)
    import bench

    ev = bench.amplified_events(spark, SF_DIR, 10)
    tmp = tempfile.mkdtemp(prefix="bytecap_ab_")
    ev.write.mode("overwrite").parquet(os.path.join(tmp, "ev"))
    batch = spark.read.parquet(os.path.join(tmp, "ev")).withColumn("_class", classify_event())

    base_aggs = [
        F.count("*").alias("n"),
        F.max(F.when(F.col("_class") != "ROTATE", F.col("ts"))).alias("max_ts"),
        F.max("gtid_seq").alias("max_gtid"),
    ]

    def run(tag, aggs):
        walls = []
        for _ in range(4):
            t0 = time.time()
            batch.groupBy("_class").agg(*aggs).collect()
            walls.append(round(time.time() - t0, 3))
        print(f"{tag:10s} walls={walls} best={min(walls)}")

    print("-- 1: stats aggregate with vs without the width term --")
    run("no-width", base_aggs)
    run("width", base_aggs + [F.avg(event_payload_bytes()).alias("w")])

    print("-- 2: maxBytesPerBatch chunks mapInPandas by bytes --")
    key = "spark.sql.execution.arrow.maxBytesPerBatch"
    print("session default:", spark.conf.get(key))
    spark.conf.set(key, str(4 << 20))
    df = spark.range(2000).select(F.col("id"), F.expr("repeat('x', 200000) as payload"))

    def probe(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    sizes = sorted(r["n"] for r in df.repartition(2).mapInPandas(probe, "n long").collect())
    print(f"batch row-counts under 4MB cap: min={sizes[0]} max={sizes[-1]} nbatches={len(sizes)}")
    assert sizes[-1] <= 64, "byte cap not enforced"
    spark.conf.set(key, os.environ.get("SPARK_GRAFT_ARROW_TARGET_BYTES", str(128 << 20)))

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
