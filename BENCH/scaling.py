"""Two-parallelism scaling evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north rule's "N vs 4N
executors, efficiency >= 0.8" is evidenced by running the SAME job on the
SAME input at local[8] (=N) and local[32] (=4N), each in a fresh JVM
subprocess, and reporting throughput at both plus the scaling efficiency:

    efficiency = (events_per_sec@32 / events_per_sec@8) / 4

Usage:
    python BENCH/scaling.py                # orchestrates both runs,
                                           # writes BENCH/BASELINE.md
    python BENCH/scaling.py --child N DIR  # one measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "30"))
LEVELS = (8, 32)  # N and 4N


def child(cpus: int, events_dir: str) -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.plans.replay import replay_batch
    from mysql_time_machine_spark.schema import BASE_COLUMNS
    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(f"mtm-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    ev = spark.read.parquet(events_dir)
    n = ev.where(F.col("op").isin("I", "U", "D")).count()  # warms input listing too

    t0 = time.time()
    out = replay_batch(ev, list(BASE_COLUMNS), EngineConfig(shuffle_partitions=cpus * 2), impl="pandas")
    out.agg(F.sum(F.crc32("content")), F.sum(F.crc32("commit")), F.count("*")).collect()
    wall = time.time() - t0

    print(json.dumps({"cpus": cpus, "row_events": n, "wall_sec": round(wall, 2),
                      "events_per_sec": round(n / wall, 1)}))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return 0

    from bench import amplified_events
    from mysql_time_machine_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="mtm_scaling_")
    events_dir = os.path.join(tmp, "events")
    spark = get_spark("mtm-scaling-gen", master="local[32]")
    amplified_events(spark, SF_DIR, AMPLIFY).repartition(64).write.parquet(events_dir)
    spark.stop()

    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), events_dir],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    n, n4 = results[LEVELS[0]], results[LEVELS[1]]
    eff = (n4["events_per_sec"] / n["events_per_sec"]) / (LEVELS[1] / LEVELS[0])
    md = f"""# BENCH/BASELINE.md — measured results

Protocol (per /root/repo/BASELINE.md): identical deterministic input
(sql-mode event log over {SF_DIR}, amplification x{AMPLIFY} =
{n["row_events"]:,} row events), same job (batch CDC replay: salted
repartition -> applyInPandas reassembly -> LWW collapse -> full-column
checksum), fresh JVM per run.

| parallelism | wall (s) | change-events/sec |
|---|---|---|
| local[{LEVELS[0]}]  (N)  | {n["wall_sec"]} | {n["events_per_sec"]:,} |
| local[{LEVELS[1]}] (4N) | {n4["wall_sec"]} | {n4["events_per_sec"]:,} |

**Scaling efficiency N -> 4N: {eff:.2f}** (target >= 0.8; single-host
caveat: local[8] vs local[32] share one memory bus / page cache, so this
under-states multi-node scaling where each executor brings its own
memory bandwidth).

Spark conf: shuffle.partitions = 2x cores, Arrow batch 10k,
AQE on, mapKeyDedupPolicy LAST_WIN, UTC session tz.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
