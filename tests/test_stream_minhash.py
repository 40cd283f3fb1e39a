"""Streaming MinHash-LSH near-dup dedup (operators/dedup.py
``minhash_dedup_stream``): the incremental index must converge to the
batch rule — dup_of = min earlier band-sharing doc with true shingle
Jaccard >= t — across micro-batch boundaries, resume incrementally from
its checkpoint, keep its stores duplicate-free under replay, and refuse
to resume under different LSH parameters.

Reference: CHANGES.txt:49-53 (incremental validation against accumulated
state, never recompute the world).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _doc(seed: int, mutate: int | None = None) -> str:
    """A 20-word document from a rotation of WORDS; ``mutate`` swaps one
    position for a unique token — a NEAR duplicate of the unmutated doc
    (3-gram shingle Jaccard ~0.75), never an exact one."""
    toks = [WORDS[(seed + i) % len(WORDS)] for i in range(20)]
    if mutate is not None:
        toks[10] = f"mut{seed}x{mutate}"
    return " ".join(toks)


def _corpus() -> list[Row]:
    rows = []
    did = 0
    for g in range(6):
        rows.append(Row(doc_id=did, text=_doc(g * 3)))
        rows.append(Row(doc_id=did + 1, text=_doc(g * 3, mutate=1)))  # near-dup of did
        rows.append(Row(doc_id=did + 2, text=_doc(g * 3)))  # exact dup of did
        did += 3
    return rows


def _expected(spark, docs):
    """The batch rule, via the oracle-gated batch operator."""
    from mysql_time_machine_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.2)
    dup_of = {
        r["b_id"]: r["m"]
        for r in pairs.groupBy("b_id").agg(F.min("a_id").alias("m")).collect()
    }
    return sorted(
        (r["doc_id"], dup_of.get(r["doc_id"]), r["doc_id"] not in dup_of)
        for r in docs.select("doc_id").collect()
    )


def _write_drops(spark, rows, src, n_drops):
    per = (len(rows) + n_drops - 1) // n_drops
    for part in range(n_drops):
        chunk = rows[part * per : (part + 1) * per]
        if chunk:
            spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)


def _snap(df):
    return sorted((r["doc_id"], r["dup_of"], r["kept"]) for r in df.collect())


def test_stream_minhash_multibatch_matches_batch_rule(spark, tmp_path):
    """doc_id-ordered drops, one file per trigger: near-dup groups split
    ACROSS batches must still resolve against the postings the earlier
    batches indexed."""
    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    rows = _corpus()
    src = str(tmp_path / "drops")
    _write_drops(spark, rows, src, 3)
    docs = spark.read.parquet(src)
    got = _snap(
        minhash_dedup_stream(
            spark,
            src,
            sink_dir=str(tmp_path / "sink"),
            n_hashes=16,
            bands=4,
            threshold=0.2,
            max_files_per_trigger=1,
            n_buckets=16,
        )
    )
    exp = _expected(spark, docs)
    assert got == exp
    # the fixture must actually exercise both verdicts
    assert any(k for (_, _, k) in got) and any(not k for (_, _, k) in got)


def test_stream_minhash_resume_incremental(spark, tmp_path):
    """A later drop resumes from the checkpoint: only the new file is
    processed (one new verdict epoch), and the final table equals the
    batch rule over the full corpus."""
    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    rows = _corpus()
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    _write_drops(spark, rows[:12], src, 2)
    first = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    assert first == _expected(spark, spark.read.parquet(src))
    epochs_before = {
        r["_epoch"]
        for r in spark.read.parquet(f"{sink}/verdicts").select("_epoch").distinct().collect()
    }

    spark.createDataFrame(rows[12:]).coalesce(1).write.mode("append").parquet(src)
    final = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    assert final == _expected(spark, spark.read.parquet(src))
    epochs_after = {
        r["_epoch"]
        for r in spark.read.parquet(f"{sink}/verdicts").select("_epoch").distinct().collect()
    }
    assert len(epochs_after) == len(epochs_before) + 1  # only the new drop ran

    # index stores stay duplicate-free across the resume (idempotent CoW)
    docs_store = spark.read.parquet(f"{sink}/docs")
    assert docs_store.count() == docs_store.select("doc_id").distinct().count() == len(rows)


def test_stream_minhash_param_mismatch_raises(spark, tmp_path):
    """Resuming a store with different LSH parameters would make old
    postings unmatchable — must fail fast, not silently under-detect."""
    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    src = str(tmp_path / "drops")
    _write_drops(spark, _corpus()[:6], src, 1)
    sink = str(tmp_path / "sink")
    minhash_dedup_stream(spark, src, sink_dir=sink, threshold=0.2, n_buckets=16)
    with pytest.raises(ValueError, match="n_hashes"):
        minhash_dedup_stream(spark, src, sink_dir=sink, n_hashes=32, threshold=0.2)
    # a different threshold would mix verdict regimes across epochs
    with pytest.raises(ValueError, match="threshold"):
        minhash_dedup_stream(spark, src, sink_dir=sink, threshold=0.5)


def test_stream_minhash_empty_source(spark, tmp_path):
    """Zero-data source: no batch runs; the result is the empty verdict
    shape with dup_of typed like doc_id."""
    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    src = str(tmp_path / "drops")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(src)
    out = minhash_dedup_stream(spark, src, sink_dir=str(tmp_path / "sink"))
    assert out.count() == 0
    assert dict(out.dtypes) == {"doc_id": "bigint", "dup_of": "bigint", "kept": "boolean"}


def test_stream_minhash_full_replay_over_populated_store_idempotent(spark, tmp_path):
    """Crash-replay torture: wipe the CHECKPOINT (not the stores) after a
    complete run, so every micro-batch replays against an index that
    already contains the whole corpus — including ids >= the replaying
    batch. Verdicts must come out identical (no self-pairs, no
    forward-id matches through the contaminated store) and the stores
    must stay duplicate-free."""
    import shutil

    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    rows = _corpus()
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    _write_drops(spark, rows, src, 3)
    first = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    shutil.rmtree(f"{sink}/_checkpoint")
    replayed = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    assert replayed == first == _expected(spark, spark.read.parquet(src))
    docs_store = spark.read.parquet(f"{sink}/docs")
    assert docs_store.count() == docs_store.select("doc_id").distinct().count() == len(rows)


def test_stream_minhash_append_only_writes(spark, tmp_path):
    """Merge-on-read write shape: an incremental drop APPENDS new epoch
    partitions — no pre-existing index file is rewritten or deleted
    (bytes/epoch proportional to the batch, never the store)."""
    import hashlib
    import os

    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    rows = _corpus()
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    _write_drops(spark, rows[:12], src, 2)
    minhash_dedup_stream(
        spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
    )

    def hashes():
        out = {}
        for store in ("bands", "docs"):
            for dirpath, _d, files in os.walk(os.path.join(sink, store)):
                for fn in files:
                    if fn.endswith(".parquet"):
                        p = os.path.join(dirpath, fn)
                        with open(p, "rb") as f:
                            out[p] = hashlib.md5(f.read()).hexdigest()
        return out

    before = hashes()
    spark.createDataFrame(rows[12:]).coalesce(1).write.mode("append").parquet(src)
    final = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    assert final == _expected(spark, spark.read.parquet(src))
    after = hashes()
    assert set(before) <= set(after)  # nothing deleted
    assert all(after[p] == h for p, h in before.items())  # nothing rewritten


def test_stream_minhash_out_of_order_drop_fails_fast(spark, tmp_path):
    """A later drop whose min doc_id is not above the indexed watermark
    must fail LOUDLY (the file source orders by mtime, so a back-dated
    file would otherwise silently break the pure-function-of-corpus
    property the oracle gates)."""
    from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

    rows = _corpus()
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    _write_drops(spark, rows[:9], src, 1)
    minhash_dedup_stream(
        spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
    )
    # back-dated drop: ids 4-6 arrive after id 8 was indexed
    spark.createDataFrame(rows[4:7]).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="out-of-order"):
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )


def test_stream_minhash_compaction_folds_epochs(spark, tmp_path):
    """compact_minhash_stream_index folds the per-epoch partitions to one
    fold partition per bucket; reads and a post-compaction incremental
    drop still match the batch rule."""
    import os

    from mysql_time_machine_spark.operators.dedup import (
        compact_minhash_stream_index,
        minhash_dedup_stream,
    )

    rows = _corpus()
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    _write_drops(spark, rows[:12], src, 3)
    minhash_dedup_stream(
        spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
    )
    res = compact_minhash_stream_index(spark, sink)
    assert res["bands"]["folded_buckets"] >= 1
    for store in ("bands", "docs"):
        root = os.path.join(sink, store)
        for entry in os.listdir(root):
            if entry.startswith("_bucket="):
                eps = [
                    e
                    for e in os.listdir(os.path.join(root, entry))
                    if e.startswith("_epoch=")
                ]
                assert eps == ["_epoch=-1"], (store, entry, eps)
    docs_store = spark.read.parquet(f"{sink}/docs")
    assert docs_store.count() == docs_store.select("doc_id").distinct().count() == 12

    # post-compaction drop: candidate lookup reads folded postings
    spark.createDataFrame(rows[12:]).coalesce(1).write.mode("append").parquet(src)
    final = _snap(
        minhash_dedup_stream(
            spark, src, sink_dir=sink, threshold=0.2, max_files_per_trigger=1, n_buckets=16
        )
    )
    assert final == _expected(spark, spark.read.parquet(src))
