"""Round-7 (session 3) isolation bench: does materializing the generated
event log ONCE pay off in the batch replay legs?

Motivation (guide §1.1 first-principles + §5 caching rule): the bench's
amplified event log is a GENERATED chain (events x docs join, x10
amplification, md5/map projection) that arrives in 2 scan splits. Both
batch collapse kernels scan it twice — once for the key-sized reset/last
aggregate, once for the join/explode branch — so the generator's CPU is
paid twice, serially, at 2-way parallelism. An earlier session measured
that repartitioning BEFORE the generator projection makes things worse
(per-task init of the giant codegen'd projection, 16x CPU inflation);
this harness instead materializes AFTER the projection:

  base   — today's plan (double generation, 2 tasks)
  ckpt   — prune to kernel columns + eager localCheckpoint (single
           generation at input parallelism; consumers read cached blocks)
  widen  — prune + repartition(defaultParallelism) + eager localCheckpoint
           (single generation; the exchange decouples the heavy projection
           from the fan-out, so no per-task init multiplication; consumers
           get full parallelism)

Times the bench's exact checksum action for both the sql(prefilter) and
pandas kernels, interleaved best-of-N with the load guard.

Usage: python BENCH/replay_mat_r7.py [trials]
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
        "mtm-replay-mat-r7", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    from bench import amplified_events

    from mysql_time_machine_spark.operators.reassemble import (
        ORDER_COLS,
        collapse_events_pandas,
        collapse_events_sql,
        materialize,
    )
    from mysql_time_machine_spark.schema import BASE_COLUMNS

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    n = ev.where(F.col("op").isin("I", "U", "D")).count()
    needed = ["repo", "path", "op", "after", "ts", "schema_version"] + ORDER_COLS

    def run(impl: str, mode: str) -> float:
        t0 = time.time()
        src = ev
        if mode != "base":
            src = ev.select(*needed)
            if mode == "widen":
                src = src.repartition(spark.sparkContext.defaultParallelism)
            src = src.localCheckpoint(eager=True)
        if impl == "sql":
            collapsed = collapse_events_sql(src, join_prefilter=True)
        else:
            collapsed = collapse_events_pandas(src, n_buckets=int(CPUS) * 2)
        out = materialize(collapsed, list(BASE_COLUMNS)).where(
            F.col("row_status") != "D"
        )
        out.agg(
            F.sum(F.crc32("content")), F.sum(F.crc32("commit")), F.count("*")
        ).collect()
        dt = round(time.time() - t0, 3)
        if mode != "base":
            src.unpersist()
        return dt

    cells = [
        (impl, mode) for impl in ("sql", "pandas") for mode in ("base", "ckpt", "widen")
    ]
    res: dict[str, list[float]] = {f"{i}_{m}": [] for i, m in cells}
    loads = []
    for _ in range(trials):
        _wait_quiet()
        loads.append(_load1())
        for impl, mode in cells:
            spark.sparkContext.setJobDescription(f"replay-mat: {impl}/{mode}")
            res[f"{impl}_{mode}"].append(run(impl, mode))
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
                "default_parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
