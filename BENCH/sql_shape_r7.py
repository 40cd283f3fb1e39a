"""Round-7 isolation bench: the two collapse_events_sql physical shapes on
the batch replay leg (VERDICT r6 "What's wrong #3" — close the
cdc_replay_sql number).

Replicates bench.py's run_cdc("sql") exactly (same amplified event log,
same checksum action) but times the two shapes side by side, interleaved
best-of-N with the load guard, on one JVM.

Usage: python BENCH/sql_shape_r7.py [trials]
Writes nothing; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def _wait_quiet(max_wait=120.0, thresh=4.0) -> None:
    deadline = time.time() + max_wait
    while _load1() >= thresh and time.time() < deadline:
        time.sleep(5)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(
        "mtm-sql-shape-r7", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import amplified_events

    from mysql_time_machine_spark.operators.reassemble import collapse_events_sql, materialize
    from mysql_time_machine_spark.schema import BASE_COLUMNS

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    n = ev.where(F.col("op").isin("I", "U", "D")).count()

    def run(join_prefilter: bool) -> float:
        out = materialize(
            collapse_events_sql(ev, join_prefilter=join_prefilter), list(BASE_COLUMNS)
        ).where(F.col("row_status") != "D")
        t0 = time.time()
        out.agg(F.sum(F.crc32("content")), F.sum(F.crc32("commit")), F.count("*")).collect()
        return round(time.time() - t0, 3)

    res: dict[str, list[float]] = {"aggfirst": [], "prefilter": []}
    loads = []
    for _ in range(trials):
        _wait_quiet()
        loads.append(_load1())
        spark.sparkContext.setJobDescription("sql-shape: aggfirst")
        res["aggfirst"].append(run(False))
        spark.sparkContext.setJobDescription("sql-shape: prefilter")
        res["prefilter"].append(run(True))
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "n_row_events": n,
                "trials": res,
                "best": {k: min(v) for k, v in res.items()},
                "loadavg": loads,
                "amplify": AMPLIFY,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
