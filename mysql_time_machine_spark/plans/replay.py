"""Batch replay plan — the flagship query (SURVEY.md §7.1 M1).

Reads an entire binlog event log as one DataFrame and produces the final
table state: the reference's end-to-end correctness check ("replay a known
binlog, compare final store state") as a single Spark job. The same
collapse kernel powers the streaming apply job; batch replay is also the
initial-snapshot path (CHANGES.txt:139) since snapshot INSERTs are just
events at gtid 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_time_machine_spark.config import EngineConfig
from mysql_time_machine_spark.operators.reassemble import (
    collapse_events_pandas,
    collapse_events_sorted,
    collapse_events_sql,
    materialize,
)


def filter_events(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """F1 table-regex gate (CHANGES.txt:41-42) + S4 end-binlog-file bound
    (CHANGES.txt:129). Catalyst pushes both into the scan."""
    out = events
    if cfg.end_log_file:
        out = out.where(F.col("log_file") <= cfg.end_log_file)
    if cfg.table_regex and cfg.table_regex != ".*":
        out = out.where(
            F.col("repo").isNull() | F.col("repo").rlike(cfg.table_regex)
        )
    return out


def replay_batch(
    events: DataFrame,
    business_columns: list[tuple[str, str]],
    cfg: EngineConfig | None = None,
    impl: str = "auto",
    keep_tombstones: bool = False,
) -> DataFrame:
    """events -> final table state (one row per surviving key).

    ``impl='auto'`` resolves to the pure-Catalyst kernel — big-batch
    replay is throughput-bound and it is the measured winner there
    (EngineConfig.collapse_impl documents the regime split)."""
    cfg = cfg or EngineConfig()
    if impl == "auto":
        impl = cfg.resolved_collapse_impl("batch")
    ev = filter_events(events, cfg)
    if impl in ("pandas", "sorted") and cfg.auto_arrow_batch:
        # byte-aware Arrow batch cap for the Python kernels: estimate the
        # payload width from a bounded sample (limit() stops the scan
        # early) so multi-MB cells (no-max-cell-size rule) shrink the
        # batch instead of the executor; narrow rows keep the measured
        # 100k ceiling — same plan, same perf
        from mysql_time_machine_spark.functions.core import event_payload_bytes
        from mysql_time_machine_spark.session import tune_arrow_batch_for_width

        est = (
            ev.limit(2048)
            .agg(F.avg(event_payload_bytes()).alias("w"))
            .head()["w"]
        )
        if est is not None:
            tune_arrow_batch_for_width(ev.sparkSession, int(est))
    if impl == "pandas":
        collapsed = collapse_events_pandas(ev, n_buckets=cfg.shuffle_partitions * 2)
    elif impl == "sorted":
        collapsed = collapse_events_sorted(ev, n_buckets=cfg.shuffle_partitions * 2)
    elif impl == "sql":
        # batch regime: AQE is available, so the join-prefilter shape drops
        # dead events before the cell explode at no exchange cost (the
        # streaming escalation keeps the aggregate-first default)
        collapsed = collapse_events_sql(ev, join_prefilter=True)
    else:  # pragma: no cover
        raise ValueError(f"unknown impl {impl!r}")
    out = materialize(collapsed, business_columns)
    if not keep_tombstones:
        out = out.where(F.col("row_status") != "D")
    return out
