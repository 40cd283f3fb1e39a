"""Active-schema registry: DDL replay, as-of resolution (J0/W2)."""

from __future__ import annotations

from mysql_time_machine_spark.registry import (
    SchemaRegistry,
    parse_enum_labels,
    stamp_schema_version,
)


def test_apply_ddl_add_and_drop():
    r = SchemaRegistry.initial()
    assert r.apply_ddl("ALTER TABLE repos ADD COLUMN stars bigint", 100)
    assert r.current_columns[-1] == ("stars", "long")
    assert r.apply_ddl("ALTER TABLE repos DROP COLUMN stars", 200)
    assert ("stars", "long") not in r.current_columns
    assert r.current_version == 3


def test_apply_ddl_idempotent():
    """Replayed epochs re-apply their DDLs; the registry must not fork
    (crash-resume correctness)."""
    r = SchemaRegistry.initial()
    assert r.apply_ddl("ALTER TABLE repos ADD COLUMN stars bigint", 100)
    assert not r.apply_ddl("ALTER TABLE repos ADD COLUMN stars bigint", 100)
    assert len(r.versions) == 2


def test_non_structural_ddl_ignored():
    r = SchemaRegistry.initial()
    assert not r.apply_ddl("CREATE TABLE begin_markers (id INT)", 5)
    assert not r.apply_ddl("ALTER TABLE repos COMMENT = 'commit history'", 6)
    assert len(r.versions) == 1


def test_columns_at_asof():
    r = SchemaRegistry.initial()
    r.apply_ddl("ALTER TABLE repos ADD COLUMN stars bigint", 100)
    r.apply_ddl("ALTER TABLE repos ADD COLUMN license varchar", 200)
    assert [c[0] for c in r.columns_at(50)] == ["commit", "lang", "content"]
    assert [c[0] for c in r.columns_at(150)][-1] == "stars"
    assert [c[0] for c in r.columns_at(10_000)][-1] == "license"


def test_stamp_schema_version(spark):
    """W2: latest version <= event position, as one codegen'd expression."""
    r = SchemaRegistry.initial()
    r.apply_ddl("ALTER TABLE repos ADD COLUMN stars bigint", 100)
    df = spark.createDataFrame([(0,), (99,), (100,), (500,)], "gtid_seq long")
    got = {x["gtid_seq"]: x["resolved_schema_version"] for x in stamp_schema_version(df, r).collect()}
    assert got == {0: 1, 99: 1, 100: 2, 500: 2}


def test_parse_enum_labels():
    """ENUM labels regex-parsed from the column definition (CHANGES.txt:182)."""
    assert parse_enum_labels("enum('red','green','blue') NOT NULL") == ["red", "green", "blue"]
    assert parse_enum_labels("ENUM( 'a', 'b' )") == ["a", "b"]
    assert parse_enum_labels("varchar(255)") is None
