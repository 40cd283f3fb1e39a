from mysql_time_machine_spark.sinks.base import ConsoleSink, NoopSink, Sink  # noqa: F401
from mysql_time_machine_spark.sinks.iceberg import IcebergSink, iceberg_available  # noqa: F401
from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink  # noqa: F401
