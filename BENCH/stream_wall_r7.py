"""Round-7 (session 3) decomposition of the cdc_stream_apply wall clock.

bench.py times the whole of: sink init + ApplyJob init + stream start +
N micro-batches + availableNow drain + stop. The event-log profiles of
earlier sessions measured the JOB-BUSY time inside micro-batches; this
harness instead stamps driver-side wall segments so the NON-job time is
attributable:

  init      — ManifestParquetSink + ApplyJob construction
  start     — .start() return to first process_batch entry (source
              listing, offset WAL, micro-batch planning)
  batch<i>  — inside process_batch (stats agg + collapse + merge)
  gap<i>    — between process_batch exit and the next entry (offset/commit
              log writes, re-listing, next-batch planning)
  drain     — last process_batch exit to awaitTermination true
  stop      — q.stop()

Replicates bench.py run_stream for the plain leg exactly (same binlog
files, same config). Usage: python BENCH/stream_wall_r7.py [runs]
Prints one JSON line per run plus a summary.
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
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(
        "mtm-stream-wall-r7", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    from bench import _write_binlog_files, amplified_events

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    ev = amplified_events(spark, SF_DIR, AMPLIFY)
    tmp = tempfile.mkdtemp(prefix="mtm_swall_")
    n_ep = 4
    qs_bounds = ev.approxQuantile(
        "gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001
    )
    file_of = F.lit(0)
    for b in qs_bounds:
        file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
    _write_binlog_files(spark, ev, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)

    out = []
    try:
        for r in range(runs):
            _wait_quiet()
            load = _load1()
            tag = f"r{r}"
            sink = ManifestParquetSink(
                spark, os.path.join(tmp, f"sink_{tag}"), n_buckets=int(CPUS)
            )
            cfg = EngineConfig(shuffle_partitions=int(CPUS), max_files_per_trigger=8, write_changelog=False)
            t0 = time.time()
            job = ApplyJob(
                spark,
                os.path.join(tmp, "binlog"),
                sink,
                cfg,
                checkpoint_dir=os.path.join(tmp, f"ckpt_{tag}"),
            )
            t_init = time.time()

            stamps: list[tuple[str, float, float]] = []
            orig = job.process_batch

            def stamped(batch, epoch_id):
                enter = time.time()
                orig(batch, epoch_id)
                stamps.append((f"batch{epoch_id}", enter, time.time()))

            job.process_batch = stamped

            q = (
                job.stream()
                .writeStream.foreachBatch(job.process_batch)
                .option("checkpointLocation", job.checkpoint_dir)
                .trigger(availableNow=True)
                .start()
            )
            t_started = time.time()
            finished = q.awaitTermination(3500)
            t_done = time.time()
            q.stop()
            t_stop = time.time()
            if not finished:
                raise TimeoutError("not drained")

            seg = {
                "init": round(t_init - t0, 3),
                "start_call": round(t_started - t_init, 3),
            }
            prev_exit = t_started
            for name, enter, exit_ in sorted(stamps, key=lambda s: s[1]):
                seg[f"gap_before_{name}"] = round(enter - prev_exit, 3)
                seg[name] = round(exit_ - enter, 3)
                prev_exit = exit_
            seg["drain"] = round(t_done - prev_exit, 3)
            seg["stop"] = round(t_stop - t_done, 3)
            seg["total"] = round(t_stop - t0, 3)
            seg["loadavg"] = load
            out.append(seg)
            print(json.dumps(seg), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    best = min(out, key=lambda s: s["total"])
    print(json.dumps({"best_run": best, "runs": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
