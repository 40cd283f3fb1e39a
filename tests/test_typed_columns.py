"""Rich type canonicalization end-to-end (P2 latin1, P5 ENUM, P6 TIME2):
DDLs add typed columns mid-stream, the registry parses the definitions
(ENUM label list, charset, fractional TIME), and replay materializes the
DECODED canonical values into the final table (CHANGES.txt:160,182,183)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pandas as pd
import pytest

from mysql_time_machine_spark.config import EngineConfig
from mysql_time_machine_spark.registry import SchemaRegistry, parse_column_type
from mysql_time_machine_spark.schema import EVENT_SCHEMA
from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
from mysql_time_machine_spark.streaming.job import ApplyJob

T0 = pd.Timestamp("2024-01-01")


def test_parse_column_type_rich():
    assert parse_column_type("ENUM('mit','gpl','apache')") == "enum(mit|gpl|apache)"
    assert parse_column_type("VARCHAR(64) CHARACTER SET latin1") == "latin1"
    assert parse_column_type("varchar(8) charset latin1 NOT NULL") == "latin1"
    assert parse_column_type("TIME(6)") == "time2"
    assert parse_column_type("TIME") == "time2"
    assert parse_column_type("BIGINT") == "long"
    assert parse_column_type("VARCHAR(255)") == "string"


def test_registry_applies_rich_ddl():
    reg = SchemaRegistry.initial()
    reg.apply_ddl("ALTER TABLE repos ADD COLUMN license ENUM('mit','gpl','apache')", 10)
    reg.apply_ddl("ALTER TABLE repos ADD COLUMN notes VARCHAR(64) CHARSET latin1", 20)
    reg.apply_ddl("ALTER TABLE repos ADD COLUMN build_time TIME(6)", 30)
    cols = dict(reg.current_columns)
    assert cols["license"] == "enum(mit|gpl|apache)"
    assert cols["notes"] == "latin1"
    assert cols["build_time"] == "time2"


@pytest.fixture(scope="module")
def typed_sink(spark, tmp_path_factory):
    """Stream: snapshot -> 3 typed DDLs -> typed updates, via ApplyJob."""
    rows = []

    def ev(epoch, op, g, repo=None, path=None, after=None, ddl=None, sv=1):
        rows.append(dict(
            log_file="binlog.000001", log_pos=g, gtid=f"u:{g}", gtid_seq=g,
            txn_id=-1, seq_in_txn=0, server_id=1, ts=T0 + pd.Timedelta(seconds=g),
            op=op, schema_version=sv, repo=repo, path=path,
            before=None, after=after, ddl=ddl, epoch=epoch,
        ))

    for i in range(4):
        ev(0, "I", i + 1, "org", f"k{i}",
           {"commit": f"c{i}", "lang": "py", "content": f"body-{i}"})
    ev(1, "DDL", 10, ddl="ALTER TABLE repos ADD COLUMN license ENUM('mit','gpl','apache')")
    ev(1, "DDL", 11, ddl="ALTER TABLE repos ADD COLUMN notes VARCHAR(64) CHARACTER SET latin1")
    ev(1, "DDL", 12, ddl="ALTER TABLE repos ADD COLUMN build_time TIME(6)")
    # k0: enum idx 2 -> 'gpl'; latin1 hex C9E9 -> 'Éé'; 1h2m3.000456s
    ev(1, "U", 20, "org", "k0",
       {"license": "2", "notes": "C9E9", "build_time": str(3_723_000_456)}, sv=4)
    # k1: enum idx 3; ASCII latin1; negative TIME
    ev(1, "U", 21, "org", "k1",
       {"license": "3", "notes": "68656C6C6F", "build_time": str(-90_000_000)}, sv=4)

    df = pd.DataFrame(rows)
    tmpdir = str(tmp_path_factory.mktemp("typed"))
    binlog = os.path.join(tmpdir, "binlog")
    os.makedirs(binlog)
    for e in range(2):
        sub = df[df["epoch"] == e].drop(columns=["epoch"])
        sdf = spark.createDataFrame(sub, schema=EVENT_SCHEMA)
        stage = os.path.join(tmpdir, f"s{e}")
        sdf.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copyfile(part, os.path.join(binlog, f"epoch-{e:03d}.parquet"))
        time.sleep(0.05)

    sink = ManifestParquetSink(spark, os.path.join(tmpdir, "sink"))
    cfg = EngineConfig(max_files_per_trigger=1, shuffle_partitions=4, write_changelog=False)
    ApplyJob(spark, binlog, sink, cfg).run_available()
    return sink


def test_typed_columns_replay_decoded(spark, typed_sink):
    rows = {r["path"]: r for r in typed_sink.read().collect()}
    assert rows["k0"]["license"] == "gpl"          # ENUM 1-based decode
    assert rows["k0"]["notes"] == "Éé"             # latin1 C9 E9 -> U+00C9 U+00E9
    assert rows["k0"]["build_time"] == "01:02:03.000456"
    assert rows["k1"]["license"] == "apache"
    assert rows["k1"]["notes"] == "hello"
    assert rows["k1"]["build_time"] == "-00:01:30.000000"
    # keys never touched post-DDL read NULL for the new columns (as-of
    # schema semantics) and keep their content byte-identical
    assert rows["k2"]["license"] is None and rows["k2"]["build_time"] is None
    assert rows["k2"]["content"] == "body-2"
    # schema history persisted with the data
    versions = typed_sink.current_manifest()["registry"]
    assert [v["schema_version"] for v in versions] == [1, 2, 3, 4]
    assert ["license", "enum(mit|gpl|apache)"] in versions[-1]["columns"]
