"""Micro-bench: txn-buffer state serialization — row-at-a-time JSON (the
round-1/2 representation) vs Arrow IPC chunks (round 3) on a single
100 K-event transaction fragment.

No Spark needed: both codecs operate on the pandas fragment exactly as the
applyInPandasWithState worker sees it.

Usage: python tools/bench_txn_state.py [n_events]
"""

from __future__ import annotations

import json
import sys
import time

import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mysql_time_machine_spark.streaming.txn_buffer import ipc_to_pdf, pdf_to_ipc


def make_fragment(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "log_file": ["binlog.000007"] * n,
            "log_pos": pd.array(range(n), dtype="int64"),
            "gtid": [f"uuid:{i}" for i in range(n)],
            "gtid_seq": pd.array(range(n), dtype="int64"),
            "txn_id": pd.array([42] * n, dtype="int64"),
            "seq_in_txn": pd.array(range(n), dtype="int32"),
            "server_id": pd.array([1] * n, dtype="int32"),
            "ts": pd.to_datetime([1_700_000_000_000_000_000 + i * 1_000_000 for i in range(n)]),
            "op": ["U"] * n,
            "schema_version": pd.array([3] * n, dtype="int32"),
            "repo": [f"org{i % 50}/repo{i % 997}" for i in range(n)],
            "path": [f"src/pkg{i % 13}/mod_{i}.py" for i in range(n)],
            "before": [{"content": f"old body of file {i} " * 4, "lang": "py"} for i in range(n)],
            "after": [{"content": f"new body of file {i} " * 4, "lang": "py"} for i in range(n)],
            "ddl": [None] * n,
        }
    )


# -- the replaced round-1/2 codec (kept here only for the comparison) --------


def json_encode(pdf: pd.DataFrame) -> str:
    out = pdf.copy()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[ns]").astype("int64")
    return json.dumps(json.loads(out.to_json(orient="records")))


def json_decode(payload: str) -> pd.DataFrame:
    pdf = pd.DataFrame.from_records(json.loads(payload))
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ns")
    return pdf


def best_of(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    pdf = make_fragment(n)

    t_json_enc = best_of(lambda: json_encode(pdf))
    payload = json_encode(pdf)
    t_json_dec = best_of(lambda: json_decode(payload))

    t_ipc_enc = best_of(lambda: pdf_to_ipc(pdf))
    chunk = pdf_to_ipc(pdf)
    t_ipc_dec = best_of(lambda: ipc_to_pdf([chunk]))

    round_trip_json = t_json_enc + t_json_dec
    round_trip_ipc = t_ipc_enc + t_ipc_dec
    print(
        json.dumps(
            {
                "metric": "txn-buffer state codec round-trip (100K-event txn)",
                "n_events": n,
                "json_encode_sec": round(t_json_enc, 4),
                "json_decode_sec": round(t_json_dec, 4),
                "json_bytes": len(payload),
                "ipc_encode_sec": round(t_ipc_enc, 4),
                "ipc_decode_sec": round(t_ipc_dec, 4),
                "ipc_bytes": len(chunk),
                "speedup_round_trip": round(round_trip_json / round_trip_ipc, 2),
                "size_ratio": round(len(payload) / len(chunk), 2),
            }
        )
    )
    # correctness of the comparison: both codecs reproduce the fragment
    back = ipc_to_pdf([chunk])
    assert len(back) == n and list(back.columns) == list(pdf.columns)
    assert back["after"].iloc[0] == pdf["after"].iloc[0]


if __name__ == "__main__":
    main()
