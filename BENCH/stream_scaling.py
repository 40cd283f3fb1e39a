"""Two-parallelism scaling evidence for the STREAMING apply path —
including the transaction buffer (round-5 default: the JVM-side
foreachBatch pending store, streaming/txn_store.py), which
BENCH/scaling.py's batch-replay job never exercises.

Protocol mirrors scaling.py: the SAME binlog directory replayed through
ApplyJob at local[N] and local[4N] (default pair A: 2,8 — the better
multi-node proxy on one socket), fresh JVM per run, identical shuffle
partitioning and bucket count at both levels, interleaved rounds,
per-level best-of. Three legs per level, ALL over gtid-quantile-cut
epoch files (binlog order — SURVEY ST2):

* plain      — marker-free one-row-txn log, buffer OFF (the v1 path)
* marked_off — BEGIN/COMMIT-marked multi-row txns, buffer OFF (the
  same-INPUT control for the buffer's overhead)
* marked_on  — the same marked log, buffer ON: transactions straddle
  micro-batch boundaries and the pending store is on the measured path

Round-6 additions (VERDICT r5 #1): the box's 3-5x ambient-load swings
made short-wall N->4N cells a lottery, so every trial is now (a) LONG —
default amplify 600 so the parallel region dominates per-epoch fixed
costs — and (b) LOAD-GUARDED — each trial waits up to QUIET_WAIT seconds
for 1-min loadavg < QUIET_THRESH before launching, and records the
loadavg at launch and finish next to its wall. The report carries every
raw (wall, load) pair per cell, not just the best, so the efficiency
number can be audited against the load regime it was measured in.

Usage:
    python BENCH/stream_scaling.py                      # orchestrate
    python BENCH/stream_scaling.py --child N DIR 0|1    # one run (internal)
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
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "600"))
LEVELS = tuple(int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(","))
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))
#: rows per marked transaction in the buffered leg. The buffer's cost is
#: per-TRANSACTION (one narrow aggregate row per txn per touching
#: micro-batch), so buffered throughput in events/sec scales roughly with
#: txn size — report width alongside the numbers.
TXN_WIDTH = int(os.environ.get("SPARK_GRAFT_TXN_WIDTH", "50"))
#: identical physical plan at both levels
PARTITIONS = 64
#: comma-sep subset of plain,marked_off,marked_on (default: the two the
#: r6 gate needs — the same-input control and the flagship buffered path)
LEGS = tuple(os.environ.get("SPARK_GRAFT_LEGS", "marked_off,marked_on").split(","))
_KNOWN_LEGS = ("plain", "marked_off", "marked_on")
if any(leg not in _KNOWN_LEGS for leg in LEGS):
    # fail NOW: an unknown leg would never enter `trials`, the
    # all-cells-present report guard would stay false forever, and an
    # hours-long run would exit 0 having written no report at all
    raise SystemExit(
        f"SPARK_GRAFT_LEGS={','.join(LEGS)!r}: unknown leg "
        f"(choose from {', '.join(_KNOWN_LEGS)})"
    )
#: load guard: wait up to QUIET_WAIT sec for load1 < QUIET_THRESH before
#: each trial (0 disables). The trial runs regardless once the wait
#: expires — the report shows the load it actually got.
QUIET_THRESH = float(os.environ.get("SPARK_GRAFT_QUIET_THRESH", "4.0"))
QUIET_WAIT = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "600"))
OUT_MD = os.environ.get("SPARK_GRAFT_STREAM_MD", "STREAM_SCALING_r6.md")
#: sink write strategy for every leg: 'cow' (default) rewrites touched
#: buckets per epoch — write cost ~ table size; 'mor' appends per-bucket
#: delta files — write cost ~ batch size, the declared 100-TB shape
#: (BENCH/MOR_MERGE_r6.md). The flagship scaling cell should measure the
#: strategy the engine deploys at scale.
MERGE_STRATEGY = os.environ.get("SPARK_GRAFT_MERGE_STRATEGY", "cow")
#: reuse an already-generated log directory (the tmp root that holds
#: binlog/ and binlog_marked/) instead of regenerating ~8 GB per run
BINLOG_DIR = os.environ.get("SPARK_GRAFT_BINLOG_DIR", "")


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def stat_snap() -> list[float]:
    """Box-wide cpu-seconds by category from /proc/stat (user nice sys
    idle iowait irq softirq steal). Steal is the co-tenant pollution the
    loadavg guard CANNOT see: hypervisor-stolen cycles inflate a trial's
    wall without raising guest load."""
    with open("/proc/stat") as f:
        return [int(x) / 100.0 for x in f.readline().split()[1:9]]


def wait_quiet() -> float:
    """Block until the box is quiet (or the wait budget runs out); return
    the 1-min loadavg at release."""
    deadline = time.time() + QUIET_WAIT
    ld = load1()
    while ld >= QUIET_THRESH and time.time() < deadline:
        time.sleep(15)
        ld = load1()
    return ld


def child(cpus: int, binlog_dir: str, buffered: bool) -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.config import EngineConfig
    from mysql_time_machine_spark.session import get_spark
    from mysql_time_machine_spark.sinks.manifest import ManifestParquetSink
    from mysql_time_machine_spark.streaming.job import ApplyJob

    spark = get_spark(
        f"mtm-stream-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=PARTITIONS
    )
    n = (
        spark.read.parquet(binlog_dir)
        .where(F.col("op").isin("I", "U", "D"))
        .count()
    )  # warms the input listing too

    tmp = tempfile.mkdtemp(prefix=f"mtm_ss_{cpus}_")
    cfg = EngineConfig(
        shuffle_partitions=PARTITIONS,
        max_files_per_trigger=8,
        write_changelog=False,
        buffer_transactions=buffered,
    )
    sink = ManifestParquetSink(
        spark,
        os.path.join(tmp, "sink"),
        n_buckets=PARTITIONS,
        merge_strategy=MERGE_STRATEGY,
    )
    t0 = time.time()
    # generous bound: a hit timeout would silently truncate the stream and
    # poison the measurement with a fast-but-wrong wall
    ApplyJob(
        spark, binlog_dir, sink, cfg, checkpoint_dir=os.path.join(tmp, "ckpt")
    ).run_available(timeout_sec=5400)
    wall = time.time() - t0
    final_rows = sink.read().count()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "buffered": buffered,
                "row_events": n,
                "wall_sec": round(wall, 2),
                "events_per_sec": round(n / wall, 1),
                "final_rows": final_rows,
            }
        )
    )
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4] == "1")
        return 0

    from bench import _write_binlog_files, amplified_events, with_txn_markers
    from mysql_time_machine_spark.session import get_spark
    from pyspark.sql import functions as F

    if BINLOG_DIR:
        tmp = BINLOG_DIR
    else:
        tmp = tempfile.mkdtemp(prefix="mtm_stream_scaling_")
        spark = get_spark("mtm-stream-scaling-gen", master="local[32]")
        ev = amplified_events(spark, SF_DIR, AMPLIFY)
        n_ep = 4
        bounds = ev.approxQuantile("gtid_seq", [i / n_ep for i in range(1, n_ep)], 0.001)
        file_of = F.lit(0)
        for b in bounds:
            file_of = file_of + (F.col("gtid_seq") > F.lit(b)).cast("int")
        if "plain" in LEGS:
            _write_binlog_files(spark, ev, tmp, os.path.join(tmp, "binlog"), n_ep, file_of)
        if "marked_off" in LEGS or "marked_on" in LEGS:
            ev_marked = with_txn_markers(ev, txn_width=TXN_WIDTH)
            _write_binlog_files(
                spark, ev_marked, tmp, os.path.join(tmp, "binlog_marked"), n_ep, file_of
            )
        spark.stop()
        # the generator JVM otherwise lingers (py4j gateway child of this
        # process) and idles at fractional-core CPU through every measured
        # cell below — kill it so trials run on a genuinely quiet box
        try:
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
    print(f"binlog dirs under {tmp}")

    trials: dict[tuple, list[dict]] = {}
    for rnd in range(ROUNDS):
        for cpus in LEVELS:
            for leg, sub, buf in (
                ("plain", "binlog", "0"),
                ("marked_off", "binlog_marked", "0"),
                ("marked_on", "binlog_marked", "1"),
            ):
                if leg not in LEGS:
                    continue
                ld_start = wait_quiet()
                env = dict(
                    os.environ,
                    SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "32g"),
                )
                s0 = stat_snap()
                out = subprocess.run(
                    [
                        sys.executable, os.path.abspath(__file__), "--child",
                        str(cpus), os.path.join(tmp, sub), buf,
                    ],
                    capture_output=True, text=True, cwd=REPO, timeout=7200, env=env,
                )
                s1 = stat_snap()
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                r["load_start"], r["load_end"], r["round"] = ld_start, load1(), rnd
                # box-wide cpu-second deltas over the trial: steal = cycles
                # the hypervisor gave a co-tenant while this trial ran
                r["user_s"] = round(s1[0] - s0[0], 1)
                r["sys_s"] = round(s1[2] - s0[2], 1)
                r["steal_s"] = round(s1[7] - s0[7], 1)
                print(json.dumps(r), flush=True)
                trials.setdefault((leg, cpus), []).append(r)
        # write (and rewrite) the report after EVERY round: a cut-short
        # run still leaves a complete report over the rounds it finished
        if all((leg, cpus) in trials for leg in LEGS for cpus in LEVELS):
            write_report(trials, rnd + 1)
    return 0


def write_report(trials: dict[tuple, list[dict]], rounds_done: int) -> None:
    best = {k: min(v, key=lambda r: r["wall_sec"]) for k, v in trials.items()}
    rows_match = len(
        {best[(leg, LEVELS[0])]["final_rows"] for leg in LEGS}
    ) == 1
    lines = [
        f"# BENCH/{OUT_MD} — streaming apply scaling (incl. txn buffer)",
        "",
        f"Input: sql-mode log over {SF_DIR}, amplify x{AMPLIFY} =",
        f"{best[(LEGS[0], LEVELS[0])]['row_events']:,} row events, replayed through",
        f"ApplyJob (AvailableNow, {PARTITIONS} shuffle partitions/buckets at BOTH",
        f"levels, fresh JVM per run, {rounds_done} interleaved rounds, per-cell best).",
        "All legs stream gtid-quantile-cut epoch files (binlog order). The",
        f"marked legs carry BEGIN/COMMIT-wrapped {TXN_WIDTH}-row transactions that",
        "straddle micro-batch boundaries; marked_on resolves them with the",
        f"JVM pending store (txn_buffer_impl='jvm'). Sink merge strategy:",
        f"**{MERGE_STRATEGY}**. Load guard: each trial",
        f"waited up to {QUIET_WAIT}s for 1-min loadavg < {QUIET_THRESH} before",
        "launching; the raw-trials table shows the loadavg each trial got,",
        "plus the box-wide sys and hypervisor-steal cpu-seconds over the",
        "trial (steal = co-tenant pollution invisible to loadavg).",
        "",
        "| leg | local[{}] (N) | ev/s | local[{}] (4N) | ev/s | eff N->4N |".format(*LEVELS),
        "|---|---|---|---|---|---|",
    ]
    for leg in LEGS:
        a, b = best[(leg, LEVELS[0])], best[(leg, LEVELS[1])]
        eff = (b["events_per_sec"] / a["events_per_sec"]) / (LEVELS[1] / LEVELS[0])
        lines.append(
            f"| {leg} | {a['wall_sec']}s | {a['events_per_sec']:,} "
            f"| {b['wall_sec']}s | {b['events_per_sec']:,} | {eff:.2f} |"
        )
    lines += [
        "",
        "## Raw trials (wall s @ loadavg at launch -> at finish)",
        "",
        "| leg | level | trials |",
        "|---|---|---|",
    ]
    for (leg, cpus), cell in sorted(trials.items()):
        cells = ", ".join(
            f"{r['wall_sec']}s @ {r['load_start']:.1f}->{r['load_end']:.1f}"
            + (
                f" (sys {r['sys_s']:.0f}s, steal {r['steal_s']:.0f}s)"
                if "steal_s" in r
                else ""
            )
            for r in cell
        )
        lines.append(f"| {leg} | local[{cpus}] | {cells} |")
    lines += [""]
    if "marked_on" in LEGS and "marked_off" in LEGS:
        ovh = (
            best[("marked_on", LEVELS[1])]["wall_sec"]
            / best[("marked_off", LEVELS[1])]["wall_sec"]
        )
        lines += [
            f"Buffered/unbuffered wall overhead on the SAME input at local[{LEVELS[1]}]: {ovh:.2f}x.",
        ]
    lines += [
        f"Final-table parity across all legs: {'YES' if rows_match else 'NO'} "
        "(identical row counts — the buffer releases exactly the committed transactions).",
    ]
    md = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", OUT_MD), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", OUT_MD.replace(".md", "_trials.json")), "w") as f:
        json.dump({f"{k[0]}@{k[1]}": v for k, v in trials.items()}, f, indent=1)
    print(md)


if __name__ == "__main__":
    sys.exit(main())
