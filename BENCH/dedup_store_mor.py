"""Round-7 evidence: per-epoch bytes written by the streaming dedup
stores as a function of STORE size (the VERDICT r6 top item — the round-6
bucket-CoW layout rewrote every touched bucket per batch, so bytes/epoch
grew with the store; the epoch-partitioned merge-on-read layout must
write ~flat bytes/epoch).

Method: for each seed multiple, pre-seed a fresh store by streaming
``seed_mult x batch`` synthetic docs, then stream ONE more fixed-size
drop and record the bytes of every parquet file whose mtime is at/after
the second run's start (rewrites count — a CoW store re-writes old data
with fresh mtimes; an append store only adds its own rows). Run against
two checkouts to compare layouts:

    python BENCH/dedup_store_mor.py <repo_path> <store: exact|minhash>

Prints one JSON line per seed multiple.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE_KIND = sys.argv[2] if len(sys.argv) > 2 else "exact"
sys.path.insert(0, REPO)

BATCH_DOCS = 500
SEED_MULTS = (1, 10, 50)
WORDS = [f"w{i}" for i in range(400)]


def _doc(i: int) -> str:
    return " ".join(WORDS[(i * 7 + j * 3) % len(WORDS)] for j in range(30)) + f" uniq{i}"


def _bytes_since(root: str, t0: float) -> int:
    total = 0
    for dirpath, _d, files in os.walk(root):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                if st.st_mtime >= t0:
                    total += st.st_size
    return total


def main() -> None:
    from pyspark.sql import Row

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark("dedup-store-mor", master="local[8]", shuffle_partitions=8)
    from mysql_time_machine_spark.operators.dedup import (
        exact_dedup_stream,
        minhash_dedup_stream,
    )

    def run_stream(src: str, sink: str) -> None:
        if STORE_KIND == "exact":
            exact_dedup_stream(
                spark, src, sink_dir=sink, max_files_per_trigger=64, n_buckets=64
            )
        else:
            minhash_dedup_stream(
                spark, src, sink_dir=sink, threshold=0.2,
                max_files_per_trigger=64, n_buckets=64,
            )

    for mult in SEED_MULTS:
        base = tempfile.mkdtemp(prefix=f"mtm_dsm_{STORE_KIND}_{mult}x_")
        src = os.path.join(base, "drops")
        sink = os.path.join(base, "sink")
        n_seed = BATCH_DOCS * mult
        rows = [Row(doc_id=i, text=_doc(i)) for i in range(n_seed)]
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)
        run_stream(src, sink)  # seed the store (untimed)
        store_bytes = _bytes_since(sink, 0)

        drop = [
            Row(doc_id=n_seed + i, text=_doc(n_seed + i)) for i in range(BATCH_DOCS)
        ]
        spark.createDataFrame(drop).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # mtime resolution guard
        t0 = time.time()
        w0 = time.time()
        run_stream(src, sink)  # the measured epoch
        wall = round(time.time() - w0, 3)
        written = _bytes_since(sink, t0)
        print(
            json.dumps(
                {
                    "store": STORE_KIND,
                    "seed_mult": mult,
                    "seed_docs": n_seed,
                    "batch_docs": BATCH_DOCS,
                    "store_bytes_before": store_bytes,
                    "bytes_written_epoch": written,
                    "epoch_wall_s": wall,
                }
            )
        )
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
