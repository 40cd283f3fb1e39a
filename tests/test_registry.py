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


def test_stamp_schema_version_range_join_fallback(spark):
    """DDL-heavy history: above case_fold_max the stamp switches to a
    broadcast range join — same answers as the CASE fold (checked pairwise
    on 500 versions), constant plan size (no 500-deep CASE chain that
    would blow the 64 KB codegen method limit), NULL gtid -> NULL."""
    from mysql_time_machine_spark.schema import BASE_COLUMNS

    n_versions = 500

    def vf_of(i):
        if i in (2, 3):  # two DDLs share gtid 3000: later version wins there
            return 3000
        if i == 480:  # OUT-OF-ORDER entry: a later list position with a
            return 475_500  # lower gtid — must neither win outside its
            # (suffix-min-bounded) range nor duplicate rows
        return i * 1000

    versions = [
        {
            "schema_version": i + 1,
            "valid_from_gtid_seq": vf_of(i),
            "ddl": None if i == 0 else f"ALTER TABLE repos ADD COLUMN c{i} varchar",
            "columns": [list(c) for c in BASE_COLUMNS],
        }
        for i in range(n_versions)
    ]
    r = SchemaRegistry(versions=versions)
    gtids = [None, 0, 999, 1000, 2999, 3000, 3001, 250_500,
             475_200, 476_000, 499_000, 10_000_000]
    df = spark.createDataFrame([(g,) for g in gtids], "gtid_seq long")

    ranged = stamp_schema_version(df, r)  # 500 > default threshold
    rows = ranged.collect()
    assert len(rows) == len(gtids)  # overlap-free intervals: no row dup
    got_r = {x["gtid_seq"]: x["resolved_schema_version"] for x in rows}

    # the CASE fold CANNOT run at this depth (a 500-deep nested CASE
    # overflows Catalyst's analysis stack — precisely why the fallback
    # exists), so the reference here is the registry's own driver-side
    # as-of rule
    def expected(g):
        if g is None:
            return None
        best = None
        for v in versions:
            if v["valid_from_gtid_seq"] <= g:
                best = v["schema_version"]
        return best

    assert got_r == {g: expected(g) for g in gtids}
    assert got_r[3000] == 4 and got_r[2999] == 2  # same-gtid supersede
    assert got_r[None] is None and got_r[10_000_000] == n_versions

    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("CASE WHEN") < 5  # no per-version expression chain


def test_parse_enum_labels():
    """ENUM labels regex-parsed from the column definition (CHANGES.txt:182)."""
    assert parse_enum_labels("enum('red','green','blue') NOT NULL") == ["red", "green", "blue"]
    assert parse_enum_labels("ENUM( 'a', 'b' )") == ["a", "b"]
    assert parse_enum_labels("varchar(255)") is None
