"""Cross-batch transaction reassembly — the uuidBuffer as streaming state.

The reference buffers events per transaction uuid and releases them at
COMMIT (/root/reference/CHANGES.txt:168-170). v1 of this engine sidesteps
cross-batch fragments with the txn-atomic epoch-file invariant (MySQL
rotation gives the same quarantee); THIS operator removes the invariant:
``applyInPandasWithState`` keyed by ``txn_id`` buffers row events of
transactions whose COMMIT has not arrived yet and releases the whole
transaction — possibly several micro-batches later — when it does.

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
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mysql_time_machine_spark.schema import EVENT_SCHEMA

#: state: buffered row events, JSON-encoded (ts as epoch micros)
STATE_SCHEMA = "events_json STRING"

_TS_COLS = ("ts",)


def _pdf_to_records(pdf: pd.DataFrame) -> list[dict[str, Any]]:
    out = pdf.copy()
    for c in _TS_COLS:
        # normalize to epoch-nanos regardless of the Arrow unit (ns vs us)
        out[c] = pd.to_datetime(out[c]).astype("datetime64[ns]").astype("int64")
    return json.loads(out.to_json(orient="records"))


def _records_to_pdf(records: list[dict[str, Any]]) -> pd.DataFrame:
    pdf = pd.DataFrame.from_records(records)
    for c in _TS_COLS:
        if c in pdf.columns:
            pdf[c] = pd.to_datetime(pdf[c], unit="ns")
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

        buffered: list[dict[str, Any]] = []
        if state.exists:
            (events_json,) = state.get
            buffered = json.loads(events_json)

        if committed:
            if state.exists:
                state.remove()
            prior = _records_to_pdf(buffered) if buffered else pd.DataFrame(columns=cols)
            full = pd.concat([prior, rows], ignore_index=True) if len(rows) else prior
            if len(full):
                yield full[cols]
        else:
            buffered.extend(_pdf_to_records(rows[cols]))
            state.update((json.dumps(buffered),))
            if evict:
                last_ns = max((r["ts"] for r in buffered), default=None)
                wm = state.getCurrentWatermarkMs()
                # arm at last activity; must stay above the current watermark
                arm = wm + 1 if last_ns is None else max(last_ns // 1_000_000, wm + 1)
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
