"""Hot-key two-stage collapse (SURVEY §7.2.4): a single Zipf-hot key whose
partial updates would otherwise land in ONE pandas group is sub-salted,
partially collapsed per slice, then finally collapsed per key — and the
result is bit-identical to the single-stage pandas path and the pure-SQL
kernel."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import Row

from mysql_time_machine_spark.operators.reassemble import (
    collapse_events_pandas,
    collapse_events_sql,
)
from mysql_time_machine_spark.schema import EVENT_SCHEMA

TS0 = dt.datetime(2024, 1, 1)
CELLS = ["commit", "lang", "content"]


def _hot_events(spark, n_hot=3000, n_cold=40):
    """One pathologically hot key (n_hot partial updates, with a mid-stream
    re-insert so full_image survival through the partial stage is
    exercised) + n_cold ordinary keys."""
    rows = []

    def ev(repo, path, op, after, g):
        rows.append(
            Row(
                log_file="binlog.000001", log_pos=g, gtid=f"u:{g}", gtid_seq=g,
                txn_id=g, seq_in_txn=0, server_id=1,
                ts=TS0 + dt.timedelta(seconds=g), op=op, schema_version=1,
                repo=repo, path=path, before=None, after=after, ddl=None,
            )
        )

    g = 0
    for i in range(n_cold):
        g += 1
        ev("org1", f"cold{i}", "I", {c: f"{c}-init-{i}" for c in CELLS}, g)
    ev("hot", "file", "I", {c: f"{c}-snap" for c in CELLS}, 1000)
    for i in range(n_hot):
        g = 2000 + i
        if i == n_hot // 2:
            # mid-stream reset: everything before is dead; full_image must
            # still come out true even though later updates overwrite all
            # of the reset's cells within some sub-salt slices
            ev("hot", "file", "I", {c: f"{c}-reset" for c in CELLS}, g)
        else:
            ev("hot", "file", "U", {CELLS[i % 3]: f"v{i}"}, g)
        if i % 97 == 0:
            ev("org1", f"cold{i % n_cold}", "U", {"lang": f"touch{i}"}, 100000 + i)
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _canon(df):
    pdf = df.toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pdf["image"] = pdf["image"].map(lambda m: None if m is None else tuple(sorted(m.items())))
    return pdf[["repo", "path", "row_status", "image", "full_image", "gtid_seq"]]


def test_hot_key_two_stage_matches_single_stage_and_sql(spark):
    events = _hot_events(spark)
    single = _canon(collapse_events_pandas(events, n_buckets=8))
    two_stage = _canon(
        collapse_events_pandas(
            events, n_buckets=8, hot_keys=[("hot", "file")], hot_key_split=4
        )
    )
    sql = _canon(collapse_events_sql(events))
    pd.testing.assert_frame_equal(two_stage, single)
    pd.testing.assert_frame_equal(two_stage, sql, check_dtype=False)
    hot = two_stage[two_stage["repo"] == "hot"].iloc[0]
    assert hot["full_image"] and hot["row_status"] == "U"


def test_hot_key_detection_threshold(spark):
    """Self-detection: with a low threshold the hot key is found and split;
    result still exact. (The detection aggregate is the streaming job's
    per-batch path, EngineConfig.hot_key_threshold.)"""
    events = _hot_events(spark, n_hot=800, n_cold=10)
    got = _canon(
        collapse_events_pandas(events, n_buckets=4, hot_key_threshold=100, hot_key_split=4)
    )
    ref = _canon(collapse_events_sql(events))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
