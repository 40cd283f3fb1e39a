"""IcebergSink — the production sink when iceberg-spark-runtime is on the
classpath (it is NOT in this sandbox; ManifestParquetSink reproduces its
commit semantics jar-free and is the tested default).

Maps the reference applier (/root/reference/README.md:18-20) onto Iceberg:

  HBase versioned puts      -> MERGE INTO + snapshot history
  daily-changes yyyymmdd    -> changelog table, hidden partitioning days(ts)
  schema history table      -> ALTER TABLE ... ADD COLUMN + snapshot schema
  safe checkpoint (pGTID)   -> fence table row per (job, epoch)
  hbase-snapshotter         -> VERSION AS OF / TIMESTAMP AS OF reads

Commit protocol (Iceberg commits are atomic per TABLE, not across tables,
so exactly-once is fence-LAST + idempotent-replay):

  1. MERGE INTO target        — idempotent: per-key gtid guard means a
                                replayed batch re-applies the same values
  2. changelog delete+append  — idempotent per epoch: rows carry epoch_id
                                and the epoch's rows are deleted first
  3. fence append             — LAST; its presence marks the epoch done

A crash between any two steps replays the epoch on restart (fence row
absent), and steps 1-2 re-run without duplication. The MERGE's matched
semantics come from ``merge_logic`` — the SAME clause builder the
ManifestParquetSink equivalence test exercises — so the two sinks cannot
silently diverge: full_image rows replace the whole row (a NULL cell in
the image really becomes NULL), partial rows update exactly the cells
present in the image map (a cell may be SET to NULL; absent cells keep
their value).

Every DDL/SQL statement the sink issues is produced by the PURE builder
functions below (``bootstrap_statements``, ``merge_statement``,
``changelog_replay_statements``, ``column_props_statement``) — the
jarless unit tests (tests/test_merge_logic.py pattern) assert the exact
ordered statement text, which is how the jar-gated path stays honest
without a catalog in the sandbox.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_time_machine_spark.sinks.base import Sink
from mysql_time_machine_spark.sinks.merge_logic import (
    MATCHED_DELETE_COND,
    MATCHED_UPDATE_COND,
    NOT_MATCHED_INSERT_COND,
    iceberg_matched_set_sql,
    materialize_batch,
)

#: property key under which the sink persists its RICH engine column types
#: (time2 / latin1 / enum decode to STRING in the Iceberg schema, so the
#: schema alone cannot restore them on a cold restart)
COLUMNS_PROP = "mtm.columns"

#: Iceberg DDL type per engine type; rich textual types land as STRING
DDL_TYPES = {"string": "STRING", "long": "BIGINT", "int": "INT", "timestamp": "TIMESTAMP", "double": "DOUBLE"}

#: reverse map for the last-resort schema fallback; anything unmapped
#: (DATE, DECIMAL, ...) degrades to the KV-cell string form
REV_TYPES = {"string": "string", "bigint": "long", "int": "int", "timestamp": "timestamp", "double": "double"}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


# ---------------------------------------------------------------------------
# Pure statement builders — unit-testable without the jar
# ---------------------------------------------------------------------------


def bootstrap_statements(table: str, fence_table: str) -> list[str]:
    """Ordered DDL issued at sink construction. The changelog table is
    created HERE, beside the fence table — the first epoch that carries a
    changelog on a fresh catalog must not die on table-not-found. Hidden
    partitioning days(ts) gives partition-pruned daily-changes reads
    (the yyyymmdd analogue, CHANGES.txt:123,111,55)."""
    return [
        f"CREATE TABLE IF NOT EXISTS {fence_table} "
        "(job_id STRING, epoch_id BIGINT, max_gtid_seq BIGINT, lineage STRING) USING iceberg",
        f"CREATE TABLE IF NOT EXISTS {table}_changelog "
        "(repo STRING, path STRING, op STRING, gtid_seq BIGINT, log_file STRING, "
        "log_pos BIGINT, ts TIMESTAMP, schema_version INT, day_utc STRING, epoch_id BIGINT) "
        "USING iceberg PARTITIONED BY (days(ts))",
    ]


def add_column_statement(table: str, name: str, engine_type: str) -> str:
    return f"ALTER TABLE {table} ADD COLUMN {name} {DDL_TYPES.get(engine_type, 'STRING')}"


def column_props_statement(table: str, business_columns: list[tuple[str, str]]) -> str:
    """Persist the rich engine types in table properties so a job restart
    that merges BEFORE any DDL arrives still decodes time2/latin1/enum
    cells (the Iceberg schema alone stores only the decoded STRING shape)."""
    payload = json.dumps([list(c) for c in business_columns]).replace("'", "''")
    return f"ALTER TABLE {table} SET TBLPROPERTIES ('{COLUMNS_PROP}' = '{payload}')"


def merge_statement(table: str, business_columns: list[tuple[str, str]]) -> str:
    insert_cols = ["repo", "path", "row_status", "gtid_seq", "schema_version", "updated_ts"] + [
        c for c, _ in business_columns
    ]
    return (
        f"MERGE INTO {table} t\n"
        "USING _mtm_batch b\n"
        "ON t.repo = b.repo AND t.path = b.path\n"
        f"WHEN MATCHED AND {MATCHED_DELETE_COND} THEN DELETE\n"
        f"WHEN MATCHED AND {MATCHED_UPDATE_COND} THEN UPDATE SET\n"
        f"  {iceberg_matched_set_sql(business_columns)}\n"
        f"WHEN NOT MATCHED AND {NOT_MATCHED_INSERT_COND} THEN\n"
        f"  INSERT ({', '.join(insert_cols)})\n"
        f"  VALUES ({', '.join('b.' + c for c in insert_cols)})"
    )


def changelog_replay_statements(table: str, epoch_id: int) -> list[str]:
    """Idempotent-per-epoch changelog: delete the epoch's rows, then append
    (the append itself is a DataFrame writeTo, not SQL)."""
    return [f"DELETE FROM {table}_changelog WHERE epoch_id = {epoch_id}"]


def fence_read_statement(fence_table: str, job_id: str) -> str:
    """The fence probe every epoch starts with (``last_epoch``)."""
    return f"SELECT max(epoch_id) AS e FROM {fence_table} WHERE job_id = '{job_id}'"


def maintenance_statements(
    table: str, catalog: str = "spark_catalog", retain_last: int = 7,
    changelog_older_than_day: str | None = None,
    compact: bool = True,
) -> list[str]:
    """Retention maintenance for the jar-backed sink — the Iceberg-native
    twin of ``ManifestParquetSink.rewrite_data_files`` /
    ``expire_snapshots`` / ``remove_orphan_files`` / ``expire_changelog``,
    in the canonical order: compact first (a rewrite commits a NEW
    snapshot whose small source files stay referenced by prior snapshots),
    then expire snapshots (which reclaims the pre-compaction files once
    unreferenced — Iceberg deletes only files unreferenced by retained
    snapshots, the same rule the manifest sink implements by hand), then
    orphan cleanup, then the optional day-bounded changelog DELETE (cheap
    on the days(ts)-partitioned changelog: partition-level deletes)."""
    stmts = []
    if compact:
        stmts.append(
            f"CALL {catalog}.system.rewrite_data_files(table => '{table}', "
            "options => map('min-input-files', '2'))"
        )
    stmts += [
        f"CALL {catalog}.system.expire_snapshots(table => '{table}', retain_last => {retain_last})",
        f"CALL {catalog}.system.remove_orphan_files(table => '{table}')",
    ]
    if changelog_older_than_day is not None:
        d = changelog_older_than_day
        stmts.append(
            f"DELETE FROM {table}_changelog WHERE day_utc < '{d}'"
        )
    return stmts


def epoch_statement_plan(
    table: str,
    fence_table: str,
    job_id: str,
    epoch_id: int,
    business_columns: list[tuple[str, str]],
    new_columns: list[tuple[str, str]] = (),
    with_changelog: bool = True,
    crash_before_fence: bool = False,
) -> list[str]:
    """The exact ORDERED statement list one epoch drives through the sink,
    mirroring the real driving path (``ApplyJob.process_batch`` calls
    ``evolve_schema`` BEFORE ``merge``, and the fence probe lives inside
    ``merge``):

      ALTER per genuinely-new column -> TBLPROPERTIES (rich-type memory,
      re-set idempotently even when no column is new) -> fence read ->
      MERGE -> changelog DELETE (epoch-scoped) + append -> fence append

    Note the consequence the order encodes: schema evolution is applied
    even for an epoch the fence would skip — DDL replay is idempotent
    (ADD COLUMN guarded by existence, properties are a pure re-set), so a
    fenced replay may re-issue the props statement but never a second
    ALTER.

    The two DataFrame ``writeTo`` appends are not SQL; they appear as
    ``APPEND <table>`` markers so the commit ORDER — fence strictly last —
    is part of the pinned contract. With ``crash_before_fence`` the plan
    stops after the changelog append: exactly the statements a crashed
    epoch leaves behind, whose replay must be idempotent (the fence row is
    absent, so the epoch re-runs; the MERGE's per-key gtid guard and the
    epoch-scoped changelog DELETE absorb the half-applied work)."""
    stmts = []
    for name, typ in new_columns:
        stmts.append(add_column_statement(table, name, typ))
    stmts.append(column_props_statement(table, business_columns))
    stmts.append(fence_read_statement(fence_table, job_id))
    stmts.append(merge_statement(table, business_columns))
    if with_changelog:
        stmts.extend(changelog_replay_statements(table, epoch_id))
        stmts.append(f"APPEND {table}_changelog")
    if not crash_before_fence:
        stmts.append(f"APPEND {fence_table}")
    return stmts


class IcebergSink(Sink):
    """MERGE-INTO applier with epoch fencing via a `_fence` table."""

    def __init__(self, spark: SparkSession, table: str, fence_table: str | None = None, job_id: str = "mtm-apply"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime jar not on the classpath; use "
                "ManifestParquetSink (same commit semantics, jar-free)"
            )
        self.spark = spark
        self.table = table
        self.fence_table = fence_table or f"{table}_fence"
        self.job_id = job_id
        for stmt in bootstrap_statements(self.table, self.fence_table):
            spark.sql(stmt)

    def last_epoch(self) -> int:
        # the ONE canonical probe statement — the same builder the audit
        # plan and statement tests pin, so they cannot drift apart
        row = self.spark.sql(fence_read_statement(self.fence_table, self.job_id)).head()
        return -1 if row["e"] is None else row["e"]

    def evolve_schema(self, business_columns: list[tuple[str, str]], registry: list[dict] | None = None) -> None:
        existing = {f.name for f in self.spark.table(self.table).schema.fields}
        for name, t in business_columns:
            if name not in existing:
                self.spark.sql(add_column_statement(self.table, name, t))
        # remember the RICH engine types twice: in-process for this job, and
        # in table properties for a restarted job whose first epoch merges
        # before any DDL event re-populates the registry
        self._columns = [tuple(c) for c in business_columns]
        self.spark.sql(column_props_statement(self.table, self._columns))

    def _business_columns(self) -> list[tuple[str, str]]:
        if getattr(self, "_columns", None):
            return self._columns
        # cold restart: restore the rich engine types from table properties
        try:
            props = {
                r["key"]: r["value"]
                for r in self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
            }
            if COLUMNS_PROP in props:
                self._columns = [tuple(c) for c in json.loads(props[COLUMNS_PROP])]
                return self._columns
        except Exception:  # noqa: BLE001 — property read is best-effort
            pass
        # last resort: reverse-map the Iceberg schema. Rich types degrade to
        # their decoded string shape; unmapped Iceberg types degrade to
        # 'string' (the KV-cell form) instead of raising
        skip = {"repo", "path", "row_status", "gtid_seq", "schema_version", "updated_ts"}
        return [
            (f.name, REV_TYPES.get(f.dataType.simpleString(), "string"))
            for f in self.spark.table(self.table).schema.fields
            if f.name not in skip
        ]

    def merge(self, batch: DataFrame, epoch_id: int, lineage: dict[str, Any] | None = None, changelog: DataFrame | None = None) -> bool:
        if epoch_id <= self.last_epoch():
            return False  # fenced

        business_columns = self._business_columns()
        # batch view keeps the raw image map alongside materialized cells:
        # the matched-set CASEs test map_contains_key to distinguish
        # "cell set to NULL" from "cell absent from this partial update"
        materialize_batch(batch, business_columns).createOrReplaceTempView("_mtm_batch")
        self.spark.sql(merge_statement(self.table, business_columns))

        if changelog is not None:
            # idempotent per epoch: a replay deletes this epoch's rows first
            cl = changelog.withColumn("epoch_id", F.lit(epoch_id).cast("long"))
            for stmt in changelog_replay_statements(self.table, epoch_id):
                self.spark.sql(stmt)
            cl.writeTo(f"{self.table}_changelog").append()

        # fence LAST: only after target + changelog are durable does the
        # epoch count as committed; anything before this replays cleanly
        self.spark.createDataFrame(
            [(self.job_id, epoch_id, None, json.dumps(lineage or {}))],
            "job_id string, epoch_id long, max_gtid_seq long, lineage string",
        ).writeTo(self.fence_table).append()
        return True

    def snapshot_as_of(self, snapshot_id: int) -> DataFrame:
        return self.spark.read.option("snapshot-id", snapshot_id).table(self.table)
