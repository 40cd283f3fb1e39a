"""Independent oracle: a ~40-line pandas replay reducer.

Deliberately shares NO code with the engine — it is the reference's
replay-compare methodology (run a known binlog, compare final store state)
reimplemented in the dumbest possible way: a sequential dict fold.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def replay_expected(events: pd.DataFrame, final_columns: list[str]) -> pd.DataFrame:
    """Sequential LWW fold in (gtid_seq, log_file, log_pos, seq_in_txn)
    order; I=replace, U=merge cells, D=drop. Returns the expected final
    table with per-row sha256(content)."""
    rows = events[events["op"].isin(["I", "U", "D"])].sort_values(
        ["gtid_seq", "log_file", "log_pos", "seq_in_txn"], kind="mergesort"
    )
    state: dict[tuple, dict] = {}
    meta: dict[tuple, dict] = {}
    for r in rows.itertuples(index=False):
        k = (r.repo, r.path)
        if r.op == "D":
            state.pop(k, None)
            meta.pop(k, None)
        elif r.op == "I" or k not in state:
            state[k] = dict(r.after or {})
            meta[k] = {"row_status": r.op, "gtid_seq": r.gtid_seq, "schema_version": r.schema_version}
        else:
            state[k].update(r.after or {})
            meta[k] = {"row_status": "U", "gtid_seq": r.gtid_seq, "schema_version": r.schema_version}

    out = []
    for (repo, path), img in state.items():
        row = {"repo": repo, "path": path}
        for c in final_columns:
            row[c] = img.get(c)
        row.update(meta[(repo, path)])
        content = row.get("content")
        row["content_sha256"] = (
            hashlib.sha256(content.encode("utf-8")).hexdigest() if content is not None else None
        )
        out.append(row)
    return (
        pd.DataFrame(out)
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
