"""Round-7 (session 3): capture the physical plan of the CoW merge WRITE
execution (the epoch-2 job that reads the previous snapshot and rewrites
touched buckets) from the event log, for the plans/r07 snapshot.

Runs one plain-leg apply at bench conditions, finds the LAST
"mtm:collapse+merge" SQL execution (the epoch-2 merge write), and prints
its full physicalPlanDescription.

Usage: python BENCH/merge_write_plan_r7.py > plans/r07/...txt
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "10"))


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="mtm_evlog_")
    spark = get_spark(
        "mtm-mergeplan-r7",
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
    tmp = tempfile.mkdtemp(prefix="mtm_mp_")
    n_ep = 4
    qs_bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
    file_of = F.lit(0)
    for b in qs_bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    _write_binlog_files(spark, ev, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)

    try:
        sink = ManifestParquetSink(spark, os.path.join(tmp, "sink"), n_buckets=int(CPUS))
        cfg = EngineConfig(
            shuffle_partitions=int(CPUS), max_files_per_trigger=8, write_changelog=False
        )
        ApplyJob(
            spark,
            os.path.join(tmp, "binlog"),
            sink,
            cfg,
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        ).run_available(timeout_sec=3500)
        spark.stop()

        evfiles = []
        for p in sorted(glob.glob(os.path.join(log_dir, "*"))):
            if os.path.isdir(p):
                evfiles += sorted(
                    q
                    for q in glob.glob(os.path.join(p, "*"))
                    if os.path.basename(q).startswith("events_")
                )
            else:
                evfiles.append(p)
        execs = {}
        labels = {}
        for line in itertools.chain.from_iterable(open(q) for q in evfiles):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = e.get("Event", "")
            if et.endswith("SQLExecutionStart"):
                execs[e["executionId"]] = e.get("physicalPlanDescription") or ""
            elif et == "SparkListenerJobStart":
                props = e.get("Properties", {})
                eid = props.get("spark.sql.execution.id")
                if eid is not None:
                    labels.setdefault(int(eid), props.get("spark.job.description", ""))
        merge_execs = [
            (i, p)
            for i, p in sorted(execs.items())
            if labels.get(i, "").startswith("mtm:collapse+merge")
            and "InsertIntoHadoopFsRelationCommand" in p
        ]
        if not merge_execs:
            raise SystemExit("no merge write execution found")
        i, plan = merge_execs[-1]  # epoch-2 write (reads previous snapshot)
        print(f"-- epoch-2 CoW merge write (SQL execution {i}) --")
        print(plan)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
