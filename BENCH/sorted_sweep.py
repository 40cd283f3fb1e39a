"""Pair-B attribution sweep: why does the SORTED kernel scale worse than
the SQL kernel from local[8] -> local[32] on this box?

Round-3 record (BENCH/BASELINE.md pair B): N->4N efficiency 0.71 (sql,
pure Catalyst) vs 0.33 (sorted, Tungsten sort + streaming mapInPandas).
Both kernels share the same scan, live-event pre-reduction, and shuffle;
the sorted kernel adds ONE thing the sql kernel doesn't have — the
JVM -> Python-worker Arrow hop. This sweep varies the two knobs that
govern that hop at both parallelism levels:

* ``spark.sql.execution.arrow.maxRecordsPerBatch`` (per-batch fixed cost
  amortization; more rows per batch = fewer socket round trips)
* shuffle partition / bucket count (Python worker task granularity)

and re-runs the sql kernel under the same configs as the DRAM-bound
control. Interpretation rule: if NO (batch, buckets) point lifts sorted
near the sql control, the gap is the Arrow hop's bandwidth itself
(2x the data crosses the memory bus: once JVM-side, once Python-side) —
a single-socket artifact that separate-bus multi-node executors don't
share; if a point DOES lift it, that config becomes the default.

Writes BENCH/SORTED_PAIRB_r4.md. Reuses scaling.py's --child runner
(fresh JVM per measurement, interleaved rounds, best-of per config).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "60"))
LEVELS = (8, 32)
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "2"))
#: (arrow_batch, partitions) grid; 10000/256 is the round-3 configuration
GRID = [(10_000, 256), (100_000, 256), (400_000, 256), (100_000, 64)]


def run_child(cpus: int, events_dir: str, arrow_batch: int, partitions: int) -> dict:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "32g"),
        SPARK_GRAFT_ARROW_BATCH=str(arrow_batch),
        SPARK_GRAFT_PARTITIONS=str(partitions),
        SPARK_GRAFT_KERNELS="sorted,sql",
        SPARK_GRAFT_TRIALS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "scaling.py"), "--child", str(cpus), events_dir],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    from bench import amplified_events
    from mysql_time_machine_spark.session import get_spark

    events_dir = os.environ.get("SPARK_GRAFT_EVENTS_DIR")
    if not events_dir or not os.path.isdir(events_dir):
        tmp = tempfile.mkdtemp(prefix="mtm_sweep_")
        events_dir = os.path.join(tmp, "events")
        spark = get_spark("mtm-sweep-gen", master="local[32]")
        amplified_events(spark, SF_DIR, AMPLIFY).repartition(64).write.parquet(events_dir)
        spark.stop()
    print(f"events_dir={events_dir}")

    # interleave: rounds outermost, then grid, then level — box-load spikes
    # hit one trial of many configs instead of every trial of one config
    best: dict[tuple, dict[str, float]] = {}
    n_events = None
    for _ in range(ROUNDS):
        for ab, parts in GRID:
            for cpus in LEVELS:
                r = run_child(cpus, events_dir, ab, parts)
                n_events = r["row_events"]
                key = (ab, parts, cpus)
                cur = best.setdefault(key, {})
                for k in ("wall_sec_sorted", "wall_sec_sql"):
                    cur[k] = min(cur.get(k, 1e9), r[k])
                print(json.dumps({"arrow_batch": ab, "partitions": parts, "cpus": cpus,
                                  "sorted": r["wall_sec_sorted"], "sql": r["wall_sec_sql"]}))

    lines = [
        "# BENCH/SORTED_PAIRB_r4.md — pair-B sorted-kernel attribution sweep",
        "",
        f"Input: sql-mode log over {SF_DIR}, amplify x{AMPLIFY} = {n_events:,} row",
        f"events; fresh JVM per run, {ROUNDS} interleaved rounds, best-of per cell.",
        "Efficiency = (ev/s@32 / ev/s@8) / 4.",
        "",
        "| arrow batch | partitions | sorted@8 | sorted@32 | eff(sorted) | sql@8 | sql@32 | eff(sql) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for ab, parts in GRID:
        s8 = best[(ab, parts, 8)]["wall_sec_sorted"]
        s32 = best[(ab, parts, 32)]["wall_sec_sorted"]
        q8 = best[(ab, parts, 8)]["wall_sec_sql"]
        q32 = best[(ab, parts, 32)]["wall_sec_sql"]
        lines.append(
            f"| {ab:,} | {parts} | {s8:.1f}s | {s32:.1f}s | {s8 / s32 / 4:.2f} "
            f"| {q8:.1f}s | {q32:.1f}s | {q8 / q32 / 4:.2f} |"
        )
    md = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "SORTED_PAIRB_r4.md"), "w") as f:
        f.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
