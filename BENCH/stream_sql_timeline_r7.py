"""Round-7 (session 3): per-SQL-execution timeline of the plain streaming
leg at BENCH conditions (sf0.1, amplify 10, local[32], 2 micro-batches).

Runs one plain-leg apply with the event log on, then prints every SQL
execution (job description, wall, gap since the previous execution ended)
in order — the ground truth for where the 2.8-3.6 s per-epoch body goes.

Usage: python BENCH/stream_sql_timeline_r7.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="mtm_evlog_")
    spark = get_spark(
        "mtm-sqltl-r7",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from bench import _write_binlog_files, amplified_events

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    tmp = tempfile.mkdtemp(prefix="mtm_sqltl_")
    n_ep = 4
    qs_bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
    file_of = F.lit(0)
    for b in qs_bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    _write_binlog_files(spark, ev, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)

    try:
        for warm in (0, 1):  # run twice; report the warm run
            sink = ManifestParquetSink(
                spark, os.path.join(tmp, f"sink_{warm}"), n_buckets=int(CPUS)
            )
            cfg = EngineConfig(shuffle_partitions=int(CPUS), max_files_per_trigger=8, write_changelog=False)
            t0 = time.time()
            ApplyJob(
                spark,
                os.path.join(tmp, "binlog"),
                sink,
                cfg,
                checkpoint_dir=os.path.join(tmp, f"ckpt_{warm}"),
            ).run_available(timeout_sec=3500)
            wall = time.time() - t0
            print(json.dumps({"run": warm, "wall": round(wall, 3)}), flush=True)
        spark.stop()

        # parse the event log: SQL execution spans in the warm run's window
        import glob

        paths = sorted(glob.glob(os.path.join(log_dir, "*")))
        evfiles = []
        for p in paths:
            if os.path.isdir(p):
                evfiles += sorted(
                    q
                    for q in glob.glob(os.path.join(p, "*"))
                    if os.path.basename(q).startswith("events_")
                )
            else:
                evfiles.append(p)
        execs = []
        jobs_by_exec = {}
        stages = []
        import itertools

        lines = itertools.chain.from_iterable(open(q) for q in evfiles)
        if True:
            for line in lines:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = e.get("Event", "")
                if et.endswith("SQLExecutionStart"):
                    execs.append(
                        {
                            "id": e["executionId"],
                            "desc": (e.get("description") or "")[:90],
                            "plan": "\n".join(
                                ln
                                for ln in (
                                    e.get("physicalPlanDescription") or ""
                                ).splitlines()
                                if "InsertIntoHadoopFsRelationCommand" in ln
                                or "Arguments: " in ln
                            )[:1200],
                            "t0": e["time"],
                            "t1": None,
                        }
                    )
                elif et.endswith("SQLExecutionEnd"):
                    for x in execs:
                        if x["id"] == e["executionId"]:
                            x["t1"] = e["time"]
                elif et == "SparkListenerJobStart":
                    props = e.get("Properties", {})
                    eid = props.get("spark.sql.execution.id")
                    desc = props.get("spark.job.description", "")
                    if eid is not None:
                        jobs_by_exec.setdefault(int(eid), desc)
                elif et == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages.append(
                        {
                            "id": si["Stage ID"],
                            "name": si["Stage Name"].split("\n")[0][:70],
                            "tasks": si["Number of Tasks"],
                            "t0": si.get("Submission Time"),
                            "t1": si.get("Completion Time"),
                        }
                    )
        execs = [x for x in execs if x["t1"] is not None]
        execs.sort(key=lambda x: x["t0"])
        # keep only the warm (second) apply's window: find the gap
        print("\n== SQL executions (all; warm run = second half) ==")
        prev_end = None
        for x in execs:
            gap = (x["t0"] - prev_end) / 1000.0 if prev_end else 0.0
            dur = (x["t1"] - x["t0"]) / 1000.0
            jd = jobs_by_exec.get(x["id"], "")
            label = jd if jd.startswith("mtm:") else x["desc"]
            print(f"  gap={gap:6.3f}  dur={dur:6.3f}  [{x['id']:>3}] {label[:80]}")
            for s in stages:
                if s["t0"] and s["t1"] and s["t0"] >= x["t0"] and s["t1"] <= x["t1"] + 200:
                    print(
                        f"        stage {s['id']:>3} dur={(s['t1']-s['t0'])/1000.0:6.3f} "
                        f"tasks={s['tasks']:>3}  {s['name']}"
                    )
            prev_end = x["t1"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
