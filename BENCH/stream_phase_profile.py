"""Phase decomposition of the streaming apply wall — WHERE does the
time go, and which phases scale 2->8 cores?

The N->4N scaling cells (BENCH/stream_scaling.py) give one number per
run; when a cell comes out low this tool answers WHY: it reruns the
same child with the Spark event log on, then decomposes the wall into

* per-JOB durations, keyed by the job's Python call site (collect for
  the metrics aggregate, the pending-store resolve aggregates, the
  parquet merge write, ...), summed across micro-batches;
* the DRIVER GAP — wall time with no job running (py4j round trips,
  streaming offset/commit log IO, manifest commits, planning). This is
  the hard serial floor: it cannot shrink with executor cores.

For each phase the report prints wall at local[N] and local[4N] and the
phase's own scaling ratio — an Amdahl table with names attached, which
is exactly the "quantified fixed-cost decomposition" the round-6 gate
asks for if the box cannot show a >=0.8 cell.

Usage:
    python BENCH/stream_phase_profile.py                 # orchestrate
    python BENCH/stream_phase_profile.py --child N DIR 0|1 LOGDIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "150"))
LEVELS = tuple(int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(","))
TXN_WIDTH = int(os.environ.get("SPARK_GRAFT_TXN_WIDTH", "50"))
PARTITIONS = 64
BUFFERED = os.environ.get("SPARK_GRAFT_BUFFERED", "1") == "1"


def child(cpus: int, binlog_dir: str, buffered: bool, log_dir: str) -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.session import get_spark
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    spark = get_spark(
        f"mtm-phase-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=PARTITIONS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    n = (
        spark.read.parquet(binlog_dir)
        .where(F.col("op").isin("I", "U", "D"))
        .count()
    )
    tmp = tempfile.mkdtemp(prefix=f"mtm_phase_{cpus}_")
    cfg = EngineConfig(
        shuffle_partitions=PARTITIONS,
        max_files_per_trigger=8,
        write_changelog=False,
        buffer_transactions=buffered,
    )
    sink = ManifestParquetSink(spark, os.path.join(tmp, "sink"), n_buckets=PARTITIONS)
    t0 = time.time()
    ApplyJob(
        spark, binlog_dir, sink, cfg, checkpoint_dir=os.path.join(tmp, "ckpt")
    ).run_available(timeout_sec=5400)
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "row_events": n, "wall_sec": round(wall, 2)}))
    spark.stop()


def parse_eventlog(log_dir: str) -> dict:
    """Per-callsite job walls + total task time + driver gaps."""
    files = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".")
    ]
    assert len(files) == 1, files
    # Spark 4 rolling event logs are a DIRECTORY (eventlog_v2_<app>/
    # events_1_<app>, ...); single-file logs are a plain file
    if os.path.isdir(files[0]):
        parts = sorted(
            os.path.join(files[0], f)
            for f in os.listdir(files[0])
            if f.startswith("events")
        )
    else:
        parts = files
    job_start: dict[int, tuple[float, str]] = {}
    jobs: list[tuple[float, float, str]] = []  # (start, end, site)
    task_ms = 0.0
    app_start = app_end = None
    for part in parts:
        if part.endswith(".zstd"):  # default codec when compress is on
            import shutil

            zstd = shutil.which("zstd") or "/root/miniconda/bin/zstd"
            text = subprocess.run(
                [zstd, "-dc", part], capture_output=True, text=True, check=True
            ).stdout
        else:
            with open(part) as f:
                text = f.read()
        for line in text.splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e["Timestamp"] / 1000.0
            elif ev == "SparkListenerApplicationEnd":
                app_end = e["Timestamp"] / 1000.0
            elif ev == "SparkListenerJobStart":
                props = e.get("Properties") or {}
                # ApplyJob labels its phases mtm:<name> via setJobDescription
                # (streaming/job.py _phase) — far better attribution than the
                # anonymous py4j callsite every Python-launched action gets
                site = props.get("spark.job.description") or ""
                if not site.startswith("mtm:"):
                    site = props.get("callSite.short", f"job{e['Job ID']}")
                job_start[e["Job ID"]] = (e["Submission Time"] / 1000.0, site)
            elif ev == "SparkListenerJobEnd" and e["Job ID"] in job_start:
                s, site = job_start.pop(e["Job ID"])
                jobs.append((s, e["Completion Time"] / 1000.0, site))
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                task_ms += m.get("Executor Run Time", 0)
    jobs.sort()
    by_site: dict[str, float] = defaultdict(float)
    njobs: dict[str, int] = defaultdict(int)
    # merge overlapping job intervals to compute true busy wall, then
    # attribute each job's own duration to its callsite
    busy = 0.0
    cur_s = cur_e = None
    for s, en, site in jobs:
        by_site[site] += en - s
        njobs[site] += 1
        if cur_s is None:
            cur_s, cur_e = s, en
        elif s <= cur_e:
            cur_e = max(cur_e, en)
        else:
            busy += cur_e - cur_s
            cur_s, cur_e = s, en
    if cur_s is not None:
        busy += cur_e - cur_s
    total = (app_end - app_start) if app_start and app_end else None
    return {
        "by_site": dict(by_site),
        "n_jobs": dict(njobs),
        "busy_wall": busy,
        "app_wall": total,
        "task_sec": task_ms / 1000.0,
        "n_jobs_total": len(jobs),
    }


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4] == "1", sys.argv[5])
        return 0

    from pyspark.sql import functions as F

    from bench import _write_binlog_files, amplified_events, with_txn_markers
    from mysql_time_machine_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="mtm_phase_")
    spark = get_spark("mtm-phase-gen", master="local[32]")
    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    n_ep = 4
    bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
    file_of = F.lit(0)
    for b in bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    ev_m = with_txn_markers(ev, txn_width=TXN_WIDTH)
    _write_binlog_files(spark, ev_m, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)
    spark.stop()
    try:  # kill the lingering generator JVM (see stream_scaling.py)
        from pyspark import SparkContext

        gw = SparkContext._gateway
        if gw is not None:
            gw.shutdown()
            if getattr(gw, "proc", None) is not None:
                gw.proc.terminate()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception:
        pass

    results = {}
    for cpus in LEVELS:
        log_dir = os.path.join(tmp, f"eventlog_{cpus}")
        os.makedirs(log_dir)
        out = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__), "--child",
                str(cpus), os.path.join(tmp, "binlog"),
                "1" if BUFFERED else "0", log_dir,
            ],
            capture_output=True, text=True, cwd=REPO, timeout=7200,
            env=dict(os.environ, SPARK_DRIVER_MEMORY="32g"),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r.update(parse_eventlog(log_dir))
        results[cpus] = r
        print(f"== local[{cpus}]: wall {r['wall_sec']}s, busy {r['busy_wall']:.1f}s, "
              f"task-sec {r['task_sec']:.1f}, jobs {r['n_jobs_total']}", flush=True)

    a, b = (results[c] for c in LEVELS)
    print(f"\nevents: {a['row_events']:,}  buffered={BUFFERED}  amplify={AMPLIFY}")
    print(f"wall: local[{LEVELS[0]}] {a['wall_sec']}s  local[{LEVELS[1]}] {b['wall_sec']}s  "
          f"eff {(a['wall_sec'] / b['wall_sec']) / (LEVELS[1] / LEVELS[0]):.2f}")
    ga = a["app_wall"] - a["busy_wall"] if a["app_wall"] else float("nan")
    gb = b["app_wall"] - b["busy_wall"] if b["app_wall"] else float("nan")
    print(f"driver gap (app wall - job-busy wall): {ga:.1f}s vs {gb:.1f}s")
    print(f"task-seconds (executor run time): {a['task_sec']:.1f} vs {b['task_sec']:.1f}"
          f"  (ratio {b['task_sec'] / max(a['task_sec'], 1e-9):.2f} — >1 means contention)")
    print(f"\n{'callsite':44s} {'N wall':>9s} {'4N wall':>9s} {'ratio':>6s} {'jobs':>5s}")
    sites = sorted(
        set(a["by_site"]) | set(b["by_site"]),
        key=lambda s: -(a["by_site"].get(s, 0.0)),
    )
    for s in sites:
        wa, wb = a["by_site"].get(s, 0.0), b["by_site"].get(s, 0.0)
        print(f"{s[:44]:44s} {wa:8.1f}s {wb:8.1f}s {wa / max(wb, 1e-9):6.2f} "
              f"{a['n_jobs'].get(s, 0):5d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
