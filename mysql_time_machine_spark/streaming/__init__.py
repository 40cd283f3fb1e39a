from mysql_time_machine_spark.streaming.job import ApplyJob  # noqa: F401
