from mysql_time_machine_spark.sources.binlog import binlog_stream, read_binlog  # noqa: F401
