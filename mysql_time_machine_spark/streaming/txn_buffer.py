"""Cross-batch transaction reassembly — the uuidBuffer as streaming state.

The reference buffers events per transaction uuid and releases them at
COMMIT (/root/reference/CHANGES.txt:168-170). v1 of this engine sidesteps
cross-batch fragments with the txn-atomic epoch-file invariant (MySQL
rotation gives the same quarantee); THIS operator removes the invariant:
``applyInPandasWithState`` keyed by ``txn_id`` buffers row events of
transactions whose COMMIT has not arrived yet and releases the whole
transaction — possibly several micro-batches later — when it does.

State representation (the 100-TB-transaction path): buffered fragments are
stored as an ``array<binary>`` of Arrow IPC chunks — each micro-batch's
fragment is encoded ONCE as a columnar Arrow stream (zero per-row Python,
no JSON string building) and APPENDED to the chunk list, so a transaction
spanning k micro-batches pays k fragment encodes, never a re-encode of
what's already buffered. On COMMIT the chunks are concatenated back into
one pandas frame. A multi-MB-row transaction therefore moves through state
at Arrow columnar speed instead of row-at-a-time JSON (the round-1/2
representation this replaces — see tools/bench_txn_state.py for the
measured gap). ``last_ts_ns`` rides along so timeout arming never re-reads
the chunks.

Late-released transactions carry their original gtid, so downstream
last-writer-wins (collapse + the sink's per-key gtid monotonicity guard)
applies them correctly even when a *later* transaction was already
committed to the table — with one approximation: the sink's guard is
row-level, so a late fragment whose key was already advanced past it is
dropped whole rather than cell-merged (row-granularity LWW, not
cell-granularity, for the late-release corner).

Abandoned transactions (BEGIN but never COMMIT — a killed producer) are
evicted by an EVENT-TIME timeout when ``abandon_timeout`` is set: the
analogue of the reference's clear-buffers-on-rotate (CHANGES.txt:112),
expressed in Spark's state API. A state timeout is the only mechanism
that can reach a group that never receives another event — a ROTATE lands
in its own group (txn_id = -1), never in the abandoned transaction's.
Mechanics:

* row/BEGIN/COMMIT events (txn_id != -1) pass through
  ``withWatermark(ts, abandon_timeout)``; control events (DDL/ROTATE and
  snapshot rows at txn_id = -1, including ROTATE's ts=0 which must never
  be treated as late data) bypass the stateful operator entirely and are
  unioned back downstream.
* each update arms ``setTimeoutTimestamp(last buffered event ts)``: the
  watermark already lags max-event-time by abandon_timeout, so the group
  times out exactly when the stream has advanced abandon_timeout past the
  transaction's last activity. On timeout the state is dropped and
  nothing is emitted — dangling fragments never reach the sink.
* event-time timeouts fire only when new data advances the watermark, so
  an ``availableNow`` query terminates normally (a processing-time
  timeout would schedule empty wake-up batches forever).

CHECKPOINT COMPATIBILITY: ``STATE_SCHEMA`` changed in round 3 from
``events_json STRING`` (row-at-a-time JSON) to the Arrow-chunk form
``chunks array<binary>, last_ts_ns bigint``. Spark's state-store schema
check rejects a checkpoint written by the old format — a job restarted
from a pre-round-3 checkpoint fails fast at query start (it cannot
silently misread old state). ``STATE_FORMAT_VERSION`` is ENFORCED by
``ApplyJob``: buffered jobs checkpoint under
``<checkpoint>/txn_state_v{N}``, so a binary with a bumped version starts
a fresh checkpoint automatically instead of reusing incompatible state —
offsets replay from the start of the binlog dir and the sink's epoch
fence absorbs the replay. Bump the constant whenever ``STATE_SCHEMA``
changes again.
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

#: state: buffered row-event fragments as Arrow IPC chunks (one per
#: micro-batch that touched the transaction) + max buffered event time.
#: Bump STATE_FORMAT_VERSION on any change — existing checkpoints are
#: incompatible (see module docstring).
STATE_FORMAT_VERSION = 2
STATE_SCHEMA = "chunks array<binary>, last_ts_ns bigint"

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


def _make_buffer_fn(evict: bool) -> Callable:
    def _buffer_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (txn_id,) = key
        cols = [f.name for f in EVENT_SCHEMA.fields]

        if evict and state.hasTimedOut:
            # abandoned: the stream advanced abandon_timeout past this
            # transaction's last event with no COMMIT — drop the fragments
            state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        # control-plane events (DDL/ROTATE at txn_id=-1) pass through
        # untouched (only reachable when eviction is off; with eviction on,
        # control events bypass the operator entirely)
        if txn_id == -1:
            yield batch[cols]
            return

        rows = batch[batch["op"].isin(["I", "U", "D"])]
        committed = bool((batch["op"] == "COMMIT").any())

        chunks: list[bytes] = []
        last_ts_ns: int | None = None
        if state.exists:
            chunks, last_ts_ns = state.get
            chunks = list(chunks)

        if committed:
            if state.exists:
                state.remove()
            prior = ipc_to_pdf(chunks) if chunks else pd.DataFrame(columns=cols)
            full = pd.concat([prior, rows], ignore_index=True) if len(rows) else prior
            if len(full):
                yield full[cols]
        else:
            if len(rows):
                chunks.append(pdf_to_ipc(rows[cols]))
                frag_max = int(
                    pd.to_datetime(rows["ts"]).astype("datetime64[ns]").astype("int64").max()
                )
                last_ts_ns = frag_max if last_ts_ns is None else max(last_ts_ns, frag_max)
            state.update((chunks, last_ts_ns))
            if evict:
                wm = state.getCurrentWatermarkMs()
                # arm at last activity; must stay above the current watermark
                arm = wm + 1 if last_ts_ns is None else max(last_ts_ns // 1_000_000, wm + 1)
                state.setTimeoutTimestamp(arm)

    return _buffer_fn


def buffer_transactions(events: DataFrame, abandon_timeout: str | None = None) -> DataFrame:
    """events (streaming) -> row events of COMMITTED transactions only,
    released whole, plus control events. BEGIN/COMMIT markers themselves
    are consumed here. ``abandon_timeout`` (e.g. "2 hours", event-time)
    evicts BEGIN-without-COMMIT state; None keeps state forever (v1
    behavior, safe when the producer cannot die mid-transaction)."""
    if abandon_timeout is None:
        return events.groupBy("txn_id").applyInPandasWithState(
            _make_buffer_fn(evict=False),
            outputStructType=EVENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: a processing-time timeout keeps an availableNow
            # query scheduling wake-up batches forever
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    cols = [f.name for f in EVENT_SCHEMA.fields]
    data = events.where(F.col("txn_id") != -1)
    control = events.where(F.col("txn_id") == -1)
    buffered = (
        data.withWatermark("ts", abandon_timeout)
        .groupBy("txn_id")
        .applyInPandasWithState(
            _make_buffer_fn(evict=True),
            outputStructType=EVENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return buffered.select(*cols).unionByName(control.select(*cols))
