"""Metrics subsystem: delay exclusion, per-table counters, observe."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql_time_machine_spark.metrics import (
    observe_ingest,
    per_table_counters,
    replication_delay_sec,
)


def test_replication_delay_excludes_rotate(spark):
    """ROTATE carries ts=0 and must NOT appear in the delay series
    (CHANGES.txt:58-61)."""
    df = spark.createDataFrame(
        [Row(op="U", ts="2024-01-01 00:00:00"), Row(op="ROTATE", ts="1970-01-01 00:00:00")]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = df.select("op", replication_delay_sec().alias("d")).collect()
    by_op = {r["op"]: r["d"] for r in rows}
    assert by_op["ROTATE"] is None
    assert by_op["U"] is not None and by_op["U"] > 0


def test_observe_ingest_counts(spark):
    df = spark.createDataFrame(
        [Row(op=o, ts="2024-01-01 00:00:00") for o in ["I", "I", "U", "D", "DDL", "ROTATE"]]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    observed, obs = observe_ingest(df)
    observed.collect()
    m = obs.get
    assert (m["events"], m["n_I"], m["n_U"], m["n_D"], m["n_DDL"]) == (6, 2, 1, 1, 1)


def test_per_table_counters_totals(spark):
    df = spark.createDataFrame(
        [
            Row(repo="a", op="I", gtid_seq=1),
            Row(repo="a", op="U", gtid_seq=2),
            Row(repo="b", op="D", gtid_seq=3),
        ]
    )
    got = {r["repo"]: r for r in per_table_counters(df).collect()}
    assert got["a"]["n_events"] == 2 and got["b"]["n_D"] == 1
    assert got["__total__"]["n_events"] == 3 and got["__total__"]["max_gtid_seq"] == 3
