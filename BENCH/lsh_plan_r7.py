"""Round-7 (session 3): does shrinking the minhash expression TREE (16
separate array-HOF columns -> one transform(sequence(0,K-1), ...) tree)
cut the dedup_minhash_lsh leg's driver/AQE planning share?

Times the bench's exact action (count over the operator output) warm,
best-of-N in one JVM. Run before and after the expression change.

Usage: python BENCH/lsh_plan_r7.py [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(
        "mtm-lsh-plan", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    walls = []
    loads = []
    for t in range(trials):
        loads.append(_load1())
        t0 = time.time()
        n = qs["dedup_minhash_lsh"](spark, SF_DIR).agg(F.count("*")).collect()[0][0]
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"rows": n, "walls": walls, "best": min(walls[1:]), "loadavg": loads}))
    spark.stop()


if __name__ == "__main__":
    main()
