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
committed to the table: LWW order is binlog position, not arrival time.

Abandoned transactions (BEGIN but never COMMIT — a killed producer) are
simply never released; their state rows are bounded by the abandoned-txn
count and are GC-able by a ROTATE-driven eviction (CHANGES.txt:112).
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
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


def _buffer_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (txn_id,) = key
    cols = [f.name for f in EVENT_SCHEMA.fields]

    batch = pd.concat(list(pdfs), ignore_index=True)
    # control-plane events (DDL/ROTATE at txn_id=-1) pass through untouched
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


def buffer_transactions(events: DataFrame) -> DataFrame:
    """events (streaming) -> row events of COMMITTED transactions only,
    released whole, plus control events. BEGIN/COMMIT markers themselves
    are consumed here."""
    return events.groupBy("txn_id").applyInPandasWithState(
        _buffer_fn,
        outputStructType=EVENT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        # NoTimeout: a processing-time timeout keeps an availableNow query
        # scheduling wake-up batches forever. Abandoned-transaction state GC
        # belongs to a ROTATE-driven eviction pass (CHANGES.txt:112) — the
        # dangling fragments are never emitted either way.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
