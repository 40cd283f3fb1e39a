"""Metrics / validation subsystem (SURVEY.md §2.5 A3-A5).

The reference keeps a two-level counter taxonomy — events consumed vs rows
applied (/root/reference/CHANGES.txt:171-172) — plus per-table counters
whose lost increments were bug classes (:113-116,124) and a replication
delay time-series that must skip ROTATE's ts=0 (:58-61,154). Our lineage
counters live inside sink manifests (atomic with the data commit, :115-116
semantics); this module adds the derived views and checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def replication_delay_sec(ts: Column | str = "ts", op: Column | str = "op") -> Column:
    """A5: now - event_ts, NULL for ROTATE events (their ts=0 would spike
    the series to +inf-delay, the CHANGES.txt:58-61 pathology)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    op = F.col(op) if isinstance(op, str) else op
    return F.when(
        op != "ROTATE",
        F.unix_timestamp(F.current_timestamp()) - F.unix_timestamp(ts),
    )


def observe_ingest(df: DataFrame, name: str = "mtm_ingest"):
    """Attach event-level observed metrics to a batch plan (A3): counts by
    op class + max non-rotate event ts. Collected for free with the action
    that executes the plan. Returns (df, Observation) — read
    ``observation.get`` after an action ran."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count("*").alias("events"),
        F.count_if(F.col("op") == "I").alias("n_I"),
        F.count_if(F.col("op") == "U").alias("n_U"),
        F.count_if(F.col("op") == "D").alias("n_D"),
        F.count_if(F.col("op") == "DDL").alias("n_DDL"),
        F.max(F.when(F.col("op") != "ROTATE", F.col("ts"))).alias("max_event_ts"),
    )
    return observed, obs


def per_table_counters(rows: DataFrame) -> DataFrame:
    """A4: per-table (repo) counters and totals, the reference's per-table
    metric tree (CHANGES.txt:124)."""
    per = rows.groupBy("repo").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("op") == "I").alias("n_I"),
        F.count_if(F.col("op") == "U").alias("n_U"),
        F.count_if(F.col("op") == "D").alias("n_D"),
        F.max("gtid_seq").alias("max_gtid_seq"),
    )
    total = per.agg(
        F.lit("__total__").alias("repo"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_I").alias("n_I"),
        F.sum("n_U").alias("n_U"),
        F.sum("n_D").alias("n_D"),
        F.max("max_gtid_seq").alias("max_gtid_seq"),
    )
    return per.unionByName(total)


def reconcile_lineage(sink_lineage: DataFrame, expected: dict[str, int]) -> dict:
    """§5.2.6: sum of committed per-epoch counters must equal the
    generator's emitted totals. Returns a diff dict (empty == consistent)."""
    got = sink_lineage.agg(
        F.sum("n_I").alias("n_I"), F.sum("n_U").alias("n_U"), F.sum("n_D").alias("n_D")
    ).head()
    diffs = {}
    for k in ("n_I", "n_U", "n_D"):
        if k in expected and got[k] != expected[k]:
            diffs[k] = {"expected": expected[k], "got": got[k]}
    return diffs
