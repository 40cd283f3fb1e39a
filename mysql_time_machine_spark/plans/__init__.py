from mysql_time_machine_spark.plans.replay import replay_batch  # noqa: F401
