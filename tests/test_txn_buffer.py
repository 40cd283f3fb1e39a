"""Cross-batch transaction reassembly (v2 uuidBuffer, SURVEY §2.5 A1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fixtures.gen_binlog import generate_rich, write_epoch_files_splitting
from fixtures.oracle import replay_expected
from mysql_time_machine_spark.config import EngineConfig
from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
from mysql_time_machine_spark.streaming.job import ApplyJob


@pytest.fixture(scope="module")
def split_log():
    return generate_rich(seed=21, n_keys=30, n_txns=100, n_epochs=6)


def test_split_transactions_reassembled(spark, split_log, tmp_path_factory):
    """Epoch files deliberately cut MID-transaction: only the stateful
    buffer makes the final state correct; it must equal the oracle."""
    binlog = str(tmp_path_factory.mktemp("binlog_split"))
    write_epoch_files_splitting(split_log, binlog, spark, n_files=6)
    root = str(tmp_path_factory.mktemp("sink_split"))
    cfg = EngineConfig(
        max_files_per_trigger=1, shuffle_partitions=8, buffer_transactions=True,
        write_changelog=False,
    )
    sink = ManifestParquetSink(spark, root)
    ApplyJob(spark, binlog, sink, cfg).run_available()

    cols = [c[0] for c in split_log.registry[-1]["columns"]]
    exp = replay_expected(split_log.events, cols)
    got = (
        sink.read()
        .withColumn("content_sha256", F.sha2("content", 256))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["content_sha256"].tolist() == exp["content_sha256"].tolist()


def test_uncommitted_tail_not_applied(spark, split_log, tmp_path_factory):
    """A transaction whose COMMIT never arrives must not reach the table
    (buffered, then evicted by timeout — CHANGES.txt:112 semantics)."""
    ev = split_log.events.drop(columns=["epoch"]).reset_index(drop=True)
    # truncate the log INSIDE the last transaction (after its BEGIN/rows,
    # before its COMMIT)
    last_txn = ev[ev["op"] == "COMMIT"]["txn_id"].iloc[-1]
    cut = ev[(ev["txn_id"] == last_txn) & (ev["op"] == "COMMIT")].index[0]
    truncated = ev.iloc[:cut]

    import fixtures.gen_binlog as gb

    log2 = gb.RichLog(
        events=truncated.assign(epoch=0), registry=split_log.registry, n_epochs=1
    )
    binlog = str(tmp_path_factory.mktemp("binlog_trunc"))
    write_epoch_files_splitting(log2, binlog, spark, n_files=2)
    root = str(tmp_path_factory.mktemp("sink_trunc"))
    cfg = EngineConfig(
        max_files_per_trigger=1, shuffle_partitions=8, buffer_transactions=True,
        write_changelog=False,
    )
    sink = ManifestParquetSink(spark, root)
    ApplyJob(spark, binlog, sink, cfg).run_available()

    # expected state: full log MINUS the dangling transaction's events
    committed_only = ev.iloc[:cut][lambda d: d["txn_id"] != last_txn]
    cols = [c[0] for c in split_log.registry[-1]["columns"]]
    exp = replay_expected(committed_only, cols)
    got = (
        sink.read().withColumn("content_sha256", F.sha2("content", 256))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert got["content_sha256"].tolist() == exp["content_sha256"].tolist()
