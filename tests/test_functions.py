"""Unit tests per scalar operator (SURVEY.md §5.2.7)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql_time_machine_spark.functions import (
    blob_hex,
    changed_cells,
    classify_event,
    content_sha256,
    daily_bucket_utc,
    delete_projection,
    enum_decode,
    salt_key,
    salted_shuffle_key,
    ts_to_epoch,
)


def test_salt_key_matches_reference_spec(spark):
    """salt = first 4 BYTES (8 hex chars) of md5(pk), joined with ';'
    (CHANGES.txt:102-104)."""
    df = spark.createDataFrame([Row(repo="org1", path="src/a.py")])
    got = df.select(salt_key().alias("k")).head()["k"]
    pk = "org1;src/a.py"
    expected = hashlib.md5(pk.encode()).hexdigest()[:8] + ";" + pk
    assert got == expected


def test_salted_shuffle_key_deterministic_and_bounded(spark):
    df = spark.range(200).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("repo"),
        F.lit("p").alias("path"),
    )
    rows = df.select(salted_shuffle_key(16).alias("b")).collect()
    assert all(0 <= r["b"] < 16 for r in rows)
    rows2 = df.select(salted_shuffle_key(16).alias("b")).collect()
    assert [r["b"] for r in rows] == [r["b"] for r in rows2]


def test_classify_event_ddl_vs_begin_trap(spark):
    """The CHANGES.txt:117 bug class: DDL containing BEGIN/COMMIT words."""
    rows = [
        Row(op="QUERY", ddl="BEGIN"),
        Row(op="QUERY", ddl="COMMIT"),
        Row(op="QUERY", ddl="CREATE TABLE begin_markers (id INT)"),
        Row(op="QUERY", ddl="ALTER TABLE repos COMMENT = 'commit history'"),
        Row(op="QUERY", ddl="  alter table t add column c int"),
        Row(op="I", ddl=None),
        Row(op="ROTATE", ddl=None),
    ]
    df = spark.createDataFrame(rows)
    got = [r["c"] for r in df.select(classify_event().alias("c")).collect()]
    assert got == ["BEGIN", "COMMIT", "DDL", "DDL", "DDL", "ROW", "ROTATE"]


def test_changed_cells_diff(spark):
    """UPDATE stores only changed cells (CHANGES.txt:173)."""
    df = spark.createDataFrame(
        [Row(before={"a": "1", "b": "2", "c": None}, after={"a": "1", "b": "3", "c": "4", "d": "5"})]
    )
    got = df.select(changed_cells().alias("d")).head()["d"]
    assert got == {"b": "3", "c": "4", "d": "5"}


def test_delete_projection_key_only(spark):
    """Deletes ignore all columns (CHANGES.txt:184)."""
    df = spark.createDataFrame([Row(op="D", after={"a": "1"}), Row(op="U", after={"a": "1"})])
    got = [r["m"] for r in df.select(delete_projection().alias("m")).collect()]
    assert got == [{}, {"a": "1"}]


def test_blob_hex_and_sha256_and_epoch(spark):
    df = spark.createDataFrame([Row(b=bytearray(b"\x00\xff"), content="hello", ts="2024-06-01 12:00:00")]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = df.select(
        blob_hex("b").alias("h"),
        content_sha256("content").alias("s"),
        ts_to_epoch("ts").alias("e"),
        daily_bucket_utc("ts").alias("d"),
    ).head()
    assert r["h"] == "00FF"
    assert r["s"] == hashlib.sha256(b"hello").hexdigest()
    assert r["e"] == 1717243200  # UTC — session tz pinned
    assert r["d"] == "20240601"


def test_enum_decode_one_based(spark):
    df = spark.createDataFrame([Row(idx="2")])
    got = df.select(enum_decode("idx", F.array(F.lit("red"), F.lit("green"), F.lit("blue"))).alias("l")).head()["l"]
    assert got == "green"


def test_enum_decode_null_index_is_null(spark):
    """Regression: Spark 4.1's runtime ElementAt maps a NULL non-literal
    ordinal to -1 (last element) — a missing ENUM cell must decode to NULL,
    not to the last label. The NULL must come from runtime data (a map
    lookup), not a literal, or constant folding hides the bug."""
    df = spark.createDataFrame([({"other_cell": "1"},)], "image map<string,string>")
    got = df.select(
        enum_decode(
            F.element_at("image", F.lit("lang_enum")),
            F.array(F.lit("red"), F.lit("green"), F.lit("blue")),
        ).alias("l")
    ).head()["l"]
    assert got is None


def test_namespace_route_first_match_wins(spark):
    from mysql_time_machine_spark.functions import namespace_route
    from mysql_time_machine_spark.sinks.base import route_sink_root

    rules = [("^org0/", "hot"), ("/r1$", "archive")]
    df = spark.createDataFrame(
        [Row(repo="org0/r1"), Row(repo="org5/r1"), Row(repo="org5/r9")]
    )
    got = [r["ns"] for r in df.select(namespace_route("repo", rules).alias("ns")).collect()]
    assert got == ["hot", "archive", "default"]  # first match wins
    # sink-side routing derives the same namespaces into root paths
    assert route_sink_root("/lake", "org0/r1", rules) == "/lake/hot/org0/r1"
    assert route_sink_root("/lake/", "org5/r9", rules) == "/lake/default/org5/r9"
