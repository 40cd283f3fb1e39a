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


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


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
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.fence_table} "
            "(job_id STRING, epoch_id BIGINT, max_gtid_seq BIGINT, lineage STRING) USING iceberg"
        )

    def last_epoch(self) -> int:
        row = self.spark.sql(
            f"SELECT max(epoch_id) AS e FROM {self.fence_table} WHERE job_id = '{self.job_id}'"
        ).head()
        return -1 if row["e"] is None else row["e"]

    def evolve_schema(self, business_columns: list[tuple[str, str]], registry: list[dict] | None = None) -> None:
        existing = {f.name for f in self.spark.table(self.table).schema.fields}
        typ = {"string": "STRING", "long": "BIGINT", "int": "INT", "timestamp": "TIMESTAMP", "double": "DOUBLE"}
        for name, t in business_columns:
            if name not in existing:
                # rich types (time2 / latin1 / enum) decode to STRING
                ddl_t = typ.get(t, "STRING")
                self.spark.sql(f"ALTER TABLE {self.table} ADD COLUMN {name} {ddl_t}")
        # remember the RICH engine types: the Iceberg schema only stores the
        # decoded (string) shape, but materialize_batch needs time2/latin1/
        # enum to run the P2-P6 canonicalizers
        self._columns = [tuple(c) for c in business_columns]

    def _business_columns(self) -> list[tuple[str, str]]:
        if getattr(self, "_columns", None):
            return self._columns
        skip = {"repo", "path", "row_status", "gtid_seq", "schema_version", "updated_ts"}
        rev = {"string": "string", "bigint": "long", "int": "int", "timestamp": "timestamp", "double": "double"}
        return [
            (f.name, rev[f.dataType.simpleString()])
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

        insert_cols = ["repo", "path", "row_status", "gtid_seq", "schema_version", "updated_ts"] + [
            c for c, _ in business_columns
        ]
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING _mtm_batch b
            ON t.repo = b.repo AND t.path = b.path
            WHEN MATCHED AND {MATCHED_DELETE_COND} THEN DELETE
            WHEN MATCHED AND {MATCHED_UPDATE_COND} THEN UPDATE SET
              {iceberg_matched_set_sql(business_columns)}
            WHEN NOT MATCHED AND {NOT_MATCHED_INSERT_COND} THEN
              INSERT ({', '.join(insert_cols)})
              VALUES ({', '.join('b.' + c for c in insert_cols)})
            """
        )
        if changelog is not None:
            # idempotent per epoch: a replay deletes this epoch's rows first
            cl = changelog.withColumn("epoch_id", F.lit(epoch_id).cast("long"))
            self.spark.sql(f"DELETE FROM {self.table}_changelog WHERE epoch_id = {epoch_id}")
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
