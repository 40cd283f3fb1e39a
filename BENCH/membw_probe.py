"""Raw memory-bandwidth ceiling of this box, measured per worker count.

Why this exists: the amplify-600 phase decomposition
(BENCH/STREAM_SCALING_r6.md) shows the streaming apply's executor CPU
TIME inflating ~2x going local[2] -> local[8] on identical input — with
zero spill, ~1% GC, identical shuffle/input bytes and ~88% slot
utilisation at both levels. The remaining hardware explanation is the
shared memory system: columnar scan + hash aggregation are
bandwidth-bound, and "Executor CPU Time" counts stall cycles. This
probe takes Spark out of the picture entirely: N independent Python
PROCESSES (no shared heap, no GIL interaction) each stream a STREAM-
triad over arrays far larger than LLC, and we record aggregate GB/s and
the mid-run CPU clock at each N. If aggregate bandwidth saturates well
below 32 workers, per-thread throughput at local[8] is capped by the
box, not by the engine — on a real cluster (the north rule's two
CLUSTER sizes) each executor host brings its own memory bus, so this
term does not transfer.

Mode ``gather`` (second positional arg set of levels after the mode
word): each worker does random-index gathers over a 128 MiB array —
the memory-access shape of hash aggregation and shuffle hashing, which
the sequential triad's prefetcher-friendly streams do not model. The
streaming kernels' USER-cycle inflation at higher thread counts tracks
this curve, not the sequential one.

Usage:
    python BENCH/membw_probe.py [levels...]          # sequential triad
    python BENCH/membw_probe.py gather [levels...]   # random gather
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_ELEM = 2**24  # 3 arrays x 128 MiB = 384 MiB per worker, >> any LLC
SECONDS = 3.0


def _worker(barrier, out, idx):
    a = np.zeros(N_ELEM)
    b = np.random.default_rng(idx).random(N_ELEM)
    c = np.random.default_rng(idx + 1).random(N_ELEM)
    np.add(b, c, out=a)  # touch all pages before the timed region
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECONDS:
        np.multiply(c, 2.0, out=a)
        np.add(a, b, out=a)  # triad-ish: read b,c write a twice
        iters += 1
    dt = time.perf_counter() - t0
    # 2 ops x (1 read + 1 write or 2 read 1 write) ~= 5 arrays of traffic
    gb = iters * 5 * N_ELEM * 8 / 2**30
    out[idx] = gb / dt


def _worker_gather(barrier, out, idx):
    rng = np.random.default_rng(idx)
    b = rng.random(N_ELEM)
    perm = rng.integers(0, N_ELEM, size=N_ELEM // 4)  # 32 MiB of indices
    a = np.take(b, perm)  # touch pages
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECONDS:
        np.take(b, perm, out=a)
        iters += 1
    dt = time.perf_counter() - t0
    # each gathered element touches one 64B line of b (uniform random over
    # 128 MiB) + sequential index read + sequential write
    gb = iters * (perm.size * 64 + perm.size * 8 + perm.size * 8) / 2**30
    out[idx] = gb / dt


def cpu_mhz() -> float:
    mhz = [
        float(line.split(":")[1])
        for line in open("/proc/cpuinfo")
        if line.startswith("cpu MHz")
    ]
    return sum(mhz) / len(mhz) if mhz else float("nan")


def main() -> int:
    argv = sys.argv[1:]
    worker = _worker
    if argv and argv[0] == "gather":
        worker = _worker_gather
        argv = argv[1:]
    levels = [int(x) for x in argv] or [1, 2, 4, 8, 16, 32]
    results = {}
    for n in levels:
        barrier = mp.Barrier(n + 1)
        out = mp.Array("d", n)
        procs = [
            mp.Process(target=worker, args=(barrier, out, i)) for i in range(n)
        ]
        for p in procs:
            p.start()
        barrier.wait()
        time.sleep(SECONDS / 2)
        mhz = cpu_mhz()
        for p in procs:
            p.join()
        agg = sum(out[:])
        results[n] = {
            "workers": n,
            "agg_gbps": round(agg, 1),
            "per_worker_gbps": round(agg / n, 1),
            "cpu_mhz_mid_run": round(mhz, 0),
            "loadavg": open("/proc/loadavg").read().split()[0],
        }
        print(json.dumps(results[n]), flush=True)
    base = results[levels[0]]["per_worker_gbps"]
    print("\nworkers  agg GB/s  per-worker GB/s  vs 1-worker  cpu MHz")
    for n in levels:
        r = results[n]
        print(
            f"{n:7d} {r['agg_gbps']:9.1f} {r['per_worker_gbps']:16.1f} "
            f"{r['per_worker_gbps'] / base:11.2f} {r['cpu_mhz_mid_run']:8.0f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
