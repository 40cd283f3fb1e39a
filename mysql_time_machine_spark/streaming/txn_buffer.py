"""Cross-batch transaction reassembly — the uuidBuffer as streaming state.

The reference buffers events per transaction uuid and releases them at
COMMIT (/root/reference/CHANGES.txt:168-170). v1 of this engine sidesteps
cross-batch fragments with the txn-atomic epoch-file invariant (MySQL
rotation gives the same guarantee); THIS operator removes the invariant:
a stateful operator buffers row events of transactions whose COMMIT has
not arrived yet and releases the whole transaction — possibly several
micro-batches later — when it does.

HYBRID KEYING (the 100-TB-throughput design, round 5): the operator is
keyed by ``pmod(txn_id, n_buckets)``, NOT by ``txn_id``. Per-txn keying
costs one Python group-state invocation per transaction per touching
micro-batch (~56 txn/s/core measured, BENCH/STREAM_SCALING_r4.md — a
4.6x wall overhead at 50-row transactions). Bucket keying caps the
per-micro-batch Python call count at ``n_buckets`` regardless of
transaction count, and inside each bucket call the split is vectorized:

* transactions whose COMMIT is in THIS micro-batch and that have no
  buffered prior state (BEGIN and COMMIT landed in the same batch — the
  overwhelmingly common case at realistic binlog file sizes) are emitted
  directly from the batch frame with two pandas mask operations. They
  NEVER touch state — no encode, no state round trip.
* committing transactions WITH buffered fragments decode exactly their
  own chunks, concat, and emit.
* only boundary-straddling, still-open fragments are encoded into state
  (one Arrow IPC chunk per txn per touching batch, appended — never a
  re-encode of what's already buffered).

State representation: three PARALLEL arrays — ``txn_ids[i]`` owns IPC
chunk ``chunks[i]`` whose max buffered event time is ``ts_ns[i]``. A txn
spanning k micro-batches owns k entries; release filters its entries out
without touching other transactions' bytes. Fragments move through state
as columnar Arrow streams (zero per-row Python — see
tools/bench_txn_state.py for the measured gap vs row-at-a-time JSON).

Late-released transactions carry their original gtid, so downstream
last-writer-wins (collapse + the sink's per-key gtid monotonicity guard)
applies them correctly even when a *later* transaction was already
committed to the table — with one approximation: the sink's guard is
row-level, so a late fragment whose key was already advanced past it is
dropped whole rather than cell-merged (row-granularity LWW, not
cell-granularity, for the late-release corner).

Abandoned transactions (BEGIN but never COMMIT — a killed producer) are
evicted on an EVENT-TIME bound when ``abandon_timeout`` is set: the
analogue of the reference's clear-buffers-on-rotate (CHANGES.txt:112).
With bucket keying the per-txn bound is enforced two ways, both against
the same condition (last buffered activity fell behind the watermark,
which lags max event time by abandon_timeout):

* a LAZY SWEEP in every bucket call drops expired txns' chunks — but
  only AFTER this batch's COMMIT set is known: a transaction committing
  in the same micro-batch its fragments expire in is PROTECTED from the
  sweep and releases whole (an in-batch COMMIT always wins over
  same-batch expiry — without the protection the sweep would drop the
  buffered prior fragments and release a partial transaction); and
* the bucket arms ``setTimeoutTimestamp`` at the OLDEST open txn's last
  activity, so a bucket that stops receiving events still gets a timeout
  callback — it sweeps and re-arms at the new oldest, until empty. A
  state timeout is the only mechanism that reaches a group with no new
  events; ROTATE lands in the control path (txn_id = -1), never in the
  abandoned transaction's bucket.

EVICTED-THEN-COMMITTED (the pinned semantics, shared with the jvm
pending store): eviction drops a transaction WHOLE — if its COMMIT (and
any trailing fragments) arrive in a LATER micro-batch, they are dropped
too, never applied as a partial transaction. The state carries a small
grace set of evicted txn ids (parallel arrays ``ev_ids`` / ``ev_ms``,
the watermark at eviction time); rows and COMMITs of those ids are
discarded on arrival. A grace entry is retired when its COMMIT is seen
(binlog delivery is in-order per ST2, so nothing of that txn can follow
its COMMIT) or when the watermark advances ``abandon_timeout`` past the
eviction point — a commit arriving later than BOTH bounds would apply
its trailing fragments partially; size ``abandon_timeout`` above the
producer's worst-case stall to keep that corner unreachable.

Control events (DDL/ROTATE/snapshot rows at txn_id = -1, including
ROTATE's ts=0 which must never be treated as late data) bypass the
stateful operator entirely and are unioned back downstream — in BOTH the
evicting and non-evicting paths. Event-time timeouts fire only when new
data advances the watermark, so an ``availableNow`` query terminates
normally (a processing-time timeout would schedule empty wake-up batches
forever).

CHECKPOINT COMPATIBILITY: ``STATE_SCHEMA`` changed again in round 5
(v2 per-txn ``chunks array<binary>, last_ts_ns bigint`` -> v3 per-bucket
parallel arrays) and the grouping key changed from txn_id to the bucket.
``STATE_FORMAT_VERSION`` is ENFORCED by ``ApplyJob``: buffered jobs
checkpoint under ``<checkpoint>/txn_state_v{N}``, so a binary with a
bumped version starts a fresh checkpoint automatically instead of
resuming incompatible state — offsets replay from the start of the
binlog dir and the sink's epoch fence absorbs the replay. Bump the
constant whenever ``STATE_SCHEMA`` or the keying changes again.
"""

from __future__ import annotations

import io
from typing import Callable, Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mysql_time_machine_spark.schema import EVENT_SCHEMA

#: state: PARALLEL arrays — txn_ids[i] owns Arrow IPC chunk chunks[i]
#: (one chunk per micro-batch that buffered rows for that txn) with max
#: buffered event time ts_ns[i]; ev_ids[j]/ev_ms[j] is the evicted-id
#: grace set (watermark ms at eviction). Bump STATE_FORMAT_VERSION on any
#: change — existing checkpoints are incompatible (see module docstring).
STATE_FORMAT_VERSION = 4
STATE_SCHEMA = (
    "txn_ids array<long>, chunks array<binary>, ts_ns array<long>, "
    "ev_ids array<long>, ev_ms array<long>"
)

_MAP_COLS = ("before", "after")

#: Arrow schema of a buffered fragment, mirroring EVENT_SCHEMA
_PA_SCHEMA = pa.schema(
    [
        ("log_file", pa.string()),
        ("log_pos", pa.int64()),
        ("gtid", pa.string()),
        ("gtid_seq", pa.int64()),
        ("txn_id", pa.int64()),
        ("seq_in_txn", pa.int32()),
        ("server_id", pa.int32()),
        ("ts", pa.timestamp("ns")),
        ("op", pa.string()),
        ("schema_version", pa.int32()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("before", pa.map_(pa.string(), pa.string())),
        ("after", pa.map_(pa.string(), pa.string())),
        ("ddl", pa.string()),
    ]
)


def pdf_to_ipc(pdf: pd.DataFrame) -> bytes:
    """Fragment -> one Arrow IPC stream (columnar, zero per-row Python).
    Spark's serializer delivers map columns as python dicts; pyarrow's map
    arrays want key-value pair lists."""
    out = pdf.copy()
    for c in _MAP_COLS:
        out[c] = out[c].map(lambda d: list(d.items()) if isinstance(d, dict) else None)
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[ns]")
    table = pa.Table.from_pandas(out, schema=_PA_SCHEMA, preserve_index=False)
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, _PA_SCHEMA) as w:
        w.write_table(table)
    return sink.getvalue()


def ipc_to_pdf(chunks: list[bytes]) -> pd.DataFrame:
    """Buffered chunk list -> one pandas frame (shape Spark's output
    serializer expects: maps back to dicts)."""
    tables = [pa.ipc.open_stream(c).read_all() for c in chunks]
    pdf = pa.concat_tables(tables).to_pandas()
    for c in _MAP_COLS:
        pdf[c] = pdf[c].map(lambda v: dict(v) if v is not None else None)
    return pdf


def _txn_last_ms(txn_ids: list[int], ts_ns: list[int]) -> dict[int, int]:
    """Per-txn last buffered activity in epoch-ms (max over its chunks)."""
    last: dict[int, int] = {}
    for t, ns in zip(txn_ids, ts_ns):
        ms = ns // 1_000_000
        if t not in last or ms > last[t]:
            last[t] = ms
    return last


def _make_bucket_fn(evict: bool, timeout_ms: int = 0) -> Callable:
    def _bucket_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EVENT_SCHEMA.fields]

        def load() -> tuple[list, list, list, dict]:
            if state.exists:
                t, c, n, ei, em = state.get
                return list(t), list(c), list(n), dict(zip(ei or [], em or []))
            return [], [], [], {}

        def sweep(t, c, n, ev, wm, protect=frozenset()):
            # retire grace entries the watermark has advanced timeout past
            # (see module docstring: beyond this bound a straggler commit
            # would partial-apply; size abandon_timeout accordingly)
            for x in [x for x, ms in ev.items() if ms + timeout_ms < wm]:
                del ev[x]
            # drop EVERY chunk of txns whose last activity fell behind the
            # watermark — the stream advanced abandon_timeout past them.
            # ``protect`` = txns committing in THIS batch: an in-batch
            # COMMIT wins over same-batch expiry (released whole instead)
            last = _txn_last_ms(t, n)
            expired = {x for x, ms in last.items() if ms < wm and x not in protect}
            if not expired:
                return t, c, n
            ev.update({x: wm for x in expired})  # drop-whole grace entries
            keep = [i for i, x in enumerate(t) if x not in expired]
            return [t[i] for i in keep], [c[i] for i in keep], [n[i] for i in keep]

        def save(t, c, n, ev):
            if t or ev:
                state.update((t, c, n, list(ev), [ev[x] for x in ev]))
                if evict:
                    wm = state.getCurrentWatermarkMs()
                    # arm at the OLDEST open txn's last activity (or, with
                    # only grace entries left, their earliest retirement):
                    # the callback sweeps and re-arms at the new oldest.
                    # Must stay strictly above the watermark.
                    cand = (
                        min(_txn_last_ms(t, n).values())
                        if t
                        else min(ev.values()) + timeout_ms
                    )
                    state.setTimeoutTimestamp(max(cand, wm + 1))
            elif state.exists:
                state.remove()

        if evict and state.hasTimedOut:
            # no new events for this bucket; expire what the watermark passed
            t, c, n, ev = load()
            t, c, n = sweep(t, c, n, ev, state.getCurrentWatermarkMs())
            save(t, c, n, ev)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        t, c, n, ev = load()
        if ev:
            # evicted-then-committed: everything of an evicted txn that
            # arrives within the grace window is dropped whole; its COMMIT
            # retires the grace entry (in-order delivery — nothing of the
            # txn can follow its own COMMIT)
            gone = set(batch.loc[batch["op"] == "COMMIT", "txn_id"]).intersection(ev)
            batch = batch[~batch["txn_id"].isin(set(ev))]
            for x in gone:  # retire AFTER filtering this batch's rows
                del ev[x]

        rows = batch[batch["op"].isin(("I", "U", "D"))]
        commits = set(batch.loc[batch["op"] == "COMMIT", "txn_id"])
        if evict:
            t, c, n = sweep(t, c, n, ev, state.getCurrentWatermarkMs(), protect=commits)

        if commits:
            # the hybrid fast path: committed txns emit straight from the
            # batch frame — only those with buffered PRIOR fragments (a
            # micro-batch-boundary straddle) touch state at all
            out = rows.loc[rows["txn_id"].isin(commits), cols]
            straddled = commits.intersection(t)
            if straddled:
                prior = ipc_to_pdf([c[i] for i, x in enumerate(t) if x in straddled])
                keep = [i for i, x in enumerate(t) if x not in straddled]
                t, c, n = [t[i] for i in keep], [c[i] for i in keep], [n[i] for i in keep]
                out = pd.concat([prior[cols], out], ignore_index=True)
            if len(out):
                yield out
        pend = rows[~rows["txn_id"].isin(commits)] if commits else rows
        if len(pend):
            # still-open fragments: one columnar IPC chunk per txn, APPENDED
            # — buffered bytes of other txns are never re-encoded
            ns = pd.to_datetime(pend["ts"]).astype("datetime64[ns]").astype("int64")
            for x, g in pend.groupby("txn_id", sort=False):
                t.append(int(x))
                c.append(pdf_to_ipc(g[cols]))
                n.append(int(ns.loc[g.index].max()))
        save(t, c, n, ev)

    return _bucket_fn


def buffer_transactions(
    events: DataFrame,
    abandon_timeout: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """events (streaming) -> row events of COMMITTED transactions only,
    released whole, plus control events. BEGIN/COMMIT markers themselves
    are consumed here. ``abandon_timeout`` (e.g. "2 hours", event-time)
    evicts BEGIN-without-COMMIT state; None keeps state forever (v1
    behavior, safe when the producer cannot die mid-transaction).
    ``n_buckets`` caps the per-micro-batch Python group-call count (see
    module docstring); size it near the job's shuffle parallelism."""
    cols = [f.name for f in EVENT_SCHEMA.fields]
    data = events.where(F.col("txn_id") != -1)
    control = events.where(F.col("txn_id") == -1)
    timeout_ms = 0
    if abandon_timeout is not None:
        data = data.withWatermark("ts", abandon_timeout)
        timeout_ms = int(pd.Timedelta(abandon_timeout).total_seconds() * 1000)
    buffered = (
        data.withColumn("_txn_bucket", F.pmod(F.col("txn_id"), F.lit(n_buckets)))
        .groupBy("_txn_bucket")
        .applyInPandasWithState(
            _make_bucket_fn(evict=abandon_timeout is not None, timeout_ms=timeout_ms),
            outputStructType=EVENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            # with no eviction: NoTimeout — a processing-time timeout keeps
            # an availableNow query scheduling wake-up batches forever
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if abandon_timeout is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    return buffered.select(*cols).unionByName(control.select(*cols))
