"""Executor-CPU saturation curve for the streaming apply kernel.

The amplify-600 phase decomposition (BENCH/STREAM_SCALING_r6.md) found
the N->4N efficiency of the end-to-end apply is set by executor CPU
TIME inflating ~2x from local[2] to local[8] on identical input — with
zero spill, ~1% GC, identical shuffle/input bytes, and ~88% slot
utilisation at both levels. The raw-stream probe (membw_probe.py) shows
sequential DRAM bandwidth scales to 16 workers on this box, so the
inflation is NOT simple stream-bandwidth exhaustion. This probe
isolates the kernel: one static micro-batch input (an epoch of the
marked binlog), a fresh JVM per thread count, the exact per-epoch jobs
the streaming hot path runs (metrics aggregate, SQL collapse, manifest
merge), each labelled via setJobDescription, and the event log parsed
into per-phase wall / executor-run / executor-CPU seconds. The output
is cpu-seconds vs thread count for the same work — the direct
measurement of how much of the box's "4x cores" a single shared-memory
JVM can actually convert into throughput, with the inflating phase
named.

Usage:
    python BENCH/cpu_saturation_probe.py BINLOG_GLOB [levels...]
    python BENCH/cpu_saturation_probe.py --child C BINLOG_GLOB LOGDIR
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS_DEFAULT = (2, 4, 8, 16, 32)


def child(cpus: int, pattern: str, log_dir: str) -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.functions.core import classify_event
    from mysql_time_machine_spark.operators.reassemble import collapse_events_sql
    from mysql_time_machine_spark.plans.replay import filter_events
    from mysql_time_machine_spark.session import get_spark
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink

    files = sorted(glob.glob(pattern))
    assert files, pattern
    spark = get_spark(
        f"mtm-satur-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            # enough scan splits that even local[32] fills its slots
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    sc = spark.sparkContext
    cfg = EngineConfig(shuffle_partitions=64)
    walls = {}
    stat = {}

    def _snap():
        f = open("/proc/stat").readline().split()
        return [int(x) / 100.0 for x in f[1:9]]

    def phase(name, fn):
        sc.setJobDescription(f"mtm:{name}")
        s0, t0 = _snap(), time.time()
        fn()
        walls[name] = round(time.time() - t0, 2)
        s1 = _snap()
        # box-wide cpu-second deltas — attributable to this phase when
        # the box is otherwise quiet (steal/other fields expose pollution)
        stat[name] = {
            "user": round(s1[0] - s0[0], 1),
            "sys": round(s1[2] - s0[2], 1),
            "iowait": round(s1[4] - s0[4], 1),
            "steal": round(s1[7] - s0[7], 1),
        }
        sc.setJobDescription(None)

    batch = spark.read.parquet(*files)
    phase("warm-listing", lambda: batch.select(F.lit(1)).limit(1).collect())
    batch = filter_events(batch, cfg).withColumn("_class", classify_event())
    phase(
        "stats-agg",
        lambda: batch.groupBy("_class")
        .agg(
            F.count("*").alias("n"),
            F.max(F.when(F.col("_class") != "ROTATE", F.col("ts"))).alias("mt"),
            F.max("gtid_seq").alias("mg"),
        )
        .collect(),
    )
    rows = batch.where(F.col("_class") == "ROW").drop("_class")
    phase("collapse", lambda: collapse_events_sql(rows).count())
    sink = ManifestParquetSink(
        spark, tempfile.mkdtemp(prefix=f"mtm_satur_sink_{cpus}_"), n_buckets=64
    )
    collapsed = collapse_events_sql(rows)
    phase("merge", lambda: sink.merge(collapsed, epoch_id=1))
    print(json.dumps({"cpus": cpus, "walls": walls, "proc_stat": stat}))
    spark.stop()


def parse_metrics(log_dir: str) -> dict:
    entries = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".")
    ]
    assert len(entries) == 1, entries
    if os.path.isdir(entries[0]):
        parts = sorted(
            os.path.join(entries[0], f)
            for f in os.listdir(entries[0])
            if f.startswith("events")
        )
    else:
        parts = entries
    stage_site: dict[int, str] = {}
    per = defaultdict(lambda: defaultdict(float))
    for part in parts:
        with open(part) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    props = e.get("Properties") or {}
                    site = props.get("spark.job.description") or props.get(
                        "callSite.short", f"job{e['Job ID']}"
                    )
                    for sid in e.get("Stage IDs", []):
                        stage_site[sid] = site
                elif ev == "SparkListenerTaskEnd":
                    site = stage_site.get(e.get("Stage ID"), "?")
                    tm = e.get("Task Metrics") or {}
                    p = per[site]
                    p["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                    p["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                    p["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                    p["tasks"] += 1
    return {k: dict(v) for k, v in per.items()}


def main() -> int:
    if sys.argv[1:2] == ["--child"]:
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return 0

    pattern = sys.argv[1]
    levels = [int(x) for x in sys.argv[2:]] or list(LEVELS_DEFAULT)
    results = {}
    for cpus in levels:
        # load guard: wait for a quiet box so inflation can't be ambient
        for _ in range(60):
            if float(open("/proc/loadavg").read().split()[0]) < 2.0:
                break
            time.sleep(10)
        load0 = open("/proc/loadavg").read().split()[0]
        log_dir = tempfile.mkdtemp(prefix=f"mtm_satur_log_{cpus}_")
        out = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__), "--child",
                str(cpus), pattern, log_dir,
            ],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
            env=dict(os.environ, SPARK_DRIVER_MEMORY="32g"),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"child {cpus} failed")
        r = json.loads(lines[-1])
        r["metrics"] = parse_metrics(log_dir)
        r["loadavg_at_launch"] = load0
        results[cpus] = r
        tot_cpu = sum(m.get("cpu_s", 0) for m in r["metrics"].values())
        tot_gc = sum(m.get("gc_s", 0) for m in r["metrics"].values())
        print(
            f"== local[{cpus}] @load {load0}: walls {r['walls']} "
            f"cpu {tot_cpu:.0f}s gc {tot_gc:.0f}s",
            flush=True,
        )
    base = levels[0]
    print(f"\n{'phase':12s}" + "".join(f" | local[{c}] wall/cpu" for c in levels))
    for ph in ("stats-agg", "collapse", "merge"):
        row = f"{ph:12s}"
        for c in levels:
            w = results[c]["walls"].get(ph, float("nan"))
            cpu = results[c]["metrics"].get(f"mtm:{ph}", {}).get("cpu_s", 0)
            row += f" | {w:7.1f}s {cpu:7.1f}s"
        print(row)
    print("\ncpu inflation vs local[%d] (same work, same input):" % base)
    for ph in ("stats-agg", "collapse", "merge"):
        b = results[base]["metrics"].get(f"mtm:{ph}", {}).get("cpu_s", 1e-9)
        infl = [
            results[c]["metrics"].get(f"mtm:{ph}", {}).get("cpu_s", 0) / b
            for c in levels
        ]
        print(f"  {ph:12s} " + " ".join(f"{x:5.2f}" for x in infl))
    with open(os.path.join(tempfile.gettempdir(), "mtm_satur_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
