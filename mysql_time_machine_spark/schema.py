"""Schemas: the binlog event envelope, the target table, the schema registry.

The event envelope mirrors the reference's AugmentedRow unit
(/root/reference/CHANGES.txt:87 — JSON-serializable augmented rows) plus the
ordering/transaction metadata the replicator tracks: binlog file+pos
(CHANGES.txt:82,129), pseudo-GTID (CHANGES.txt:19-20,37), transaction uuid
buffering (CHANGES.txt:168 `uuidBuffer`), op markers I/U/D
(CHANGES.txt:174-175), and DDL/BEGIN/COMMIT/ROTATE control events
(CHANGES.txt:117,125,132).

``before``/``after`` are map<string,string>: the reference erases rich types
into KV cells (CHANGES.txt:160-163); a string map survives schema evolution
without envelope changes and lets one Parquet schema carry every table
version.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Binlog event envelope (FIXTURES.md §2)
# ---------------------------------------------------------------------------
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("log_file", T.StringType(), False),
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("txn_id", T.LongType(), True),
        T.StructField("seq_in_txn", T.IntegerType(), True),
        T.StructField("server_id", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ddl", T.StringType(), True),
    ]
)

#: ops that carry row data
ROW_OPS = ("I", "U", "D")
#: control events
CONTROL_OPS = ("BEGIN", "COMMIT", "DDL", "ROTATE")

# ---------------------------------------------------------------------------
# Target table: source-code repos (BASELINE.json input_hint) + lineage cols
# (row_status mirrors the d:row_status cell, CHANGES.txt:174-175)
# ---------------------------------------------------------------------------
#: base business columns, schema version 1
BASE_COLUMNS: list[tuple[str, str]] = [
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]

#: engine-owned lineage columns appended to every target row
LINEAGE_COLUMNS: list[tuple[str, str]] = [
    ("row_status", "string"),
    ("gtid_seq", "long"),
    ("schema_version", "int"),
    ("updated_ts", "timestamp"),
]

KEY_COLUMNS = ("repo", "path")


def spark_type(typ: str) -> T.DataType:
    """Engine type string -> Spark type. Rich MySQL types whose decoded
    canonical form is textual (TIME2 duration strings, latin1-decoded text,
    ENUM labels) land as strings."""
    if typ in ("time2", "latin1") or typ.startswith("enum("):
        return T.StringType()
    mapping = {
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "timestamp": T.TimestampType(),
        "double": T.DoubleType(),
    }
    return mapping[typ]


def target_struct(business_columns: list[tuple[str, str]]) -> T.StructType:
    """StructType of the live target table for a given business column set."""
    fields = [T.StructField(k, T.StringType(), False) for k in KEY_COLUMNS]
    fields += [T.StructField(n, spark_type(t), True) for n, t in business_columns]
    fields += [T.StructField(n, spark_type(t), True) for n, t in LINEAGE_COLUMNS]
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Schema registry (active-schema history, CHANGES.txt:44-46,57)
# ---------------------------------------------------------------------------
REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("valid_from_gtid_seq", T.LongType(), False),
        T.StructField("ddl", T.StringType(), True),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("type", T.StringType(), False),
                        T.StructField("enum_labels", T.ArrayType(T.StringType()), True),
                    ]
                )
            ),
            False,
        ),
    ]
)
