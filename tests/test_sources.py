"""Binlog source formats (S1): the same stream applied from parquet and
from JSON-lines epoch files produces the identical final table."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from fixtures.gen_binlog import events_df, generate_rich, write_epoch_files
from fixtures.oracle import replay_expected
from mysql_time_machine_spark.config import EngineConfig
from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
from mysql_time_machine_spark.sources.binlog import binlog_stream, read_binlog
from mysql_time_machine_spark.streaming.job import ApplyJob

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def _write_jsonl_epochs(log, out_dir: str, spark) -> None:
    os.makedirs(out_dir, exist_ok=True)
    df = events_df(log, spark)
    for e in range(log.n_epochs):
        # same txn-atomic epoch boundaries as write_epoch_files
        sub_pd = log.events[log.events["epoch"] == e].drop(columns=["epoch"])
        sdf = spark.createDataFrame(sub_pd, schema=df.schema)
        stage = os.path.join(out_dir, f"_stage{e}")
        (
            sdf.coalesce(1)
            .write.mode("overwrite")
            .option("timestampFormat", TS_FMT)
            .option("ignoreNullFields", "false")
            .json(stage)
        )
        part = glob.glob(os.path.join(stage, "part-*.json"))[0]
        shutil.copyfile(part, os.path.join(out_dir, f"epoch-{e:05d}.json"))
        shutil.rmtree(stage)
        time.sleep(0.05)


@pytest.fixture(scope="module")
def src_log():
    return generate_rich(seed=33, n_keys=25, n_txns=80, n_epochs=4)


def test_json_source_roundtrip_batch(spark, src_log, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jsonl"))
    _write_jsonl_epochs(src_log, d, spark)
    got = read_binlog(spark, d, fmt="json")
    exp = events_df(src_log, spark)
    assert got.count() == exp.count()
    # value-level roundtrip: same multiset of (gtid_seq, op, repo, sha of after)
    key = lambda df: sorted(
        df.select("gtid_seq", "op", F.coalesce("repo", F.lit("")),
                  F.coalesce(F.to_json("after"), F.lit(""))).collect()
    )
    assert key(got) == key(exp)


def test_json_source_streaming_apply_parity(spark, src_log, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jsonl_stream"))
    _write_jsonl_epochs(src_log, d, spark)
    root = str(tmp_path_factory.mktemp("sink_jsonl"))
    cfg = EngineConfig(max_files_per_trigger=1, shuffle_partitions=8,
                       write_changelog=False, binlog_format="json")
    sink = ManifestParquetSink(spark, root)
    ApplyJob(spark, d, sink, cfg).run_available()

    cols = [c[0] for c in src_log.registry[-1]["columns"]]
    exp = replay_expected(src_log.events, cols)
    got = (
        sink.read().withColumn("content_sha256", F.sha2("content", 256))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert got["content_sha256"].tolist() == exp["content_sha256"].tolist()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        binlog_stream(spark, "/tmp/nowhere", fmt="csv")
