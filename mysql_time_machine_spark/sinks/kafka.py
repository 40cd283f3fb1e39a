"""KafkaSink — the reference's Kafka applier re-expressed for Spark
(/root/reference/README.md:20 "replicate to Kafka", CHANGES.txt:75 Kafka
as importer/applier, :30-31 producer batching).

Record shape (the brokerless-testable part, covered by unit tests):

  key   = the reference's salted row key (first-4-bytes-of-md5 ; pk,
          CHANGES.txt:102-104) — keeps one MySQL row in one Kafka
          partition, so per-key ordering survives the topic
  value = JSON of the materialized row (business columns + lineage), or
          NULL for deletes — a compacted-topic tombstone, the Kafka-native
          form of the reference's key-only delete (CHANGES.txt:184)
  topic = namespace-routed (F3) when rules are given

The wire send itself needs the spark-sql-kafka jar + a broker, neither of
which exists in this sandbox — ``merge`` is jar-gated exactly like the
IcebergSink. Exactly-once: Kafka gets at-least-once delivery keyed for
log compaction (idempotent consumers dedupe on (key, gtid_seq)); the
fence lives with the consumer, as in the reference's Kafka path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_time_machine_spark.functions.core import materialize_cell, namespace_route, salt_key
from mysql_time_machine_spark.sinks.base import Sink


def kafka_source_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def format_kafka_batch(
    batch: DataFrame,
    business_columns: list[tuple[str, str]],
    topic: str = "mtm.repos",
    table_regex: str | None = None,
    namespace_rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Collapsed batch -> (key, value, topic) in the Kafka writer's
    contract columns. Pure projection: testable without a broker."""
    out = batch
    if table_regex and table_regex != ".*":
        out = out.where(F.col("repo").rlike(table_regex))
    payload = [F.col("repo"), F.col("path")]
    for name, typ in business_columns:
        payload.append(materialize_cell("image", name, typ))
    # render the instant's UTC wall-clock regardless of the session
    # timezone: date_format alone renders in spark.sql.session.timeZone,
    # which would mislabel the hard-coded 'Z' suffix on non-UTC sessions
    payload += [F.col("row_status"), F.col("gtid_seq"), F.col("schema_version"),
                F.date_format(
                    F.to_utc_timestamp(F.col("updated_ts"), F.current_timezone()),
                    "yyyy-MM-dd'T'HH:mm:ss'Z'",
                ).alias("updated_ts")]
    value = F.when(
        F.col("row_status") == "D", F.lit(None).cast("string")
    ).otherwise(F.to_json(F.struct(*payload)))
    topic_col = (
        F.concat(namespace_route("repo", namespace_rules), F.lit("."), F.lit(topic))
        if namespace_rules
        else F.lit(topic)
    )
    return out.select(
        salt_key().alias("key"),
        value.alias("value"),
        topic_col.alias("topic"),
    )


class KafkaSink(Sink):
    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        topic: str = "mtm.repos",
        business_columns: list[tuple[str, str]] | None = None,
        table_regex: str | None = None,
        namespace_rules: list[tuple[str, str]] | None = None,
    ):
        if not kafka_source_available(spark):
            raise RuntimeError(
                "spark-sql-kafka jar not on the classpath; format_kafka_batch "
                "remains unit-testable without it"
            )
        self.spark = spark
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.business_columns = business_columns or []
        self.table_regex = table_regex
        self.namespace_rules = namespace_rules

    def evolve_schema(self, business_columns: list[tuple[str, str]], registry: list[dict] | None = None) -> None:
        self.business_columns = [tuple(c) for c in business_columns]

    def merge(self, batch: DataFrame, epoch_id: int, lineage: dict[str, Any] | None = None, changelog: DataFrame | None = None) -> bool:
        records = format_kafka_batch(
            batch, self.business_columns, self.topic, self.table_regex, self.namespace_rules
        )
        (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .save()
        )
        return True
