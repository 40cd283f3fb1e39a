"""Binlog event source — file-based tail over multiple wire formats.

The reference consumes the binlog either directly from a MySQL server or
from flushed files; this engine tails a DIRECTORY of event files with
Spark's file stream source (exactly-once file tracking in the checkpoint,
``maxFilesPerTrigger`` backpressure — SURVEY §2.1 S1). The envelope schema
(schema.EVENT_SCHEMA) is identical across formats:

* ``parquet`` — the default and the fast path (columnar, predicate
  pushdown, maps are native).
* ``json``    — one JSON object per line (the reference's
  JSON-serializable AugmentedRow, CHANGES.txt:87); map columns parse
  natively from JSON objects. Useful when the flusher is a non-JVM tool.

Both functions also exist in batch form for replay jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_time_machine_spark.schema import EVENT_SCHEMA

FORMATS = ("parquet", "json")


def binlog_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming tail of a binlog directory; schema-enforced."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported binlog format {fmt!r}; one of {FORMATS}")
    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "json":
        # epoch-second timestamps keep the JSON wire format tz-unambiguous
        reader = reader.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    return getattr(reader, fmt)(path)


def read_binlog(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Batch read of the same directory (initial snapshot / replay jobs)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported binlog format {fmt!r}; one of {FORMATS}")
    reader = spark.read.schema(EVENT_SCHEMA)
    if fmt == "json":
        reader = reader.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    return getattr(reader, fmt)(path)
