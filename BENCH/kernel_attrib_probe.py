"""Name the kernel mechanism behind the sys-time explosion at higher
thread counts (see BENCH/STREAM_SCALING_r6.md).

Runs the cpu_saturation_probe child at a given thread count while
sampling, over the child's lifetime:

* /proc/stat      — user/sys/steal cpu-seconds (the sizes of the terms)
* /proc/interrupts — TLB-shootdown and function-call IPIs (mmap/munmap
  invalidations broadcast to EVERY core: the canonical super-linear
  single-address-space kernel cost)
* /proc/vmstat    — page faults, page allocs, THP fault/collapse,
  compaction stalls, unevictable churn

Sampling is read-only and free; the deltas attribute the sys term to a
named kernel path without needing perf(1) (absent from this sandbox).

Usage: python BENCH/kernel_attrib_probe.py CPUS BINLOG_GLOB
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VMSTAT_KEYS = (
    "pgfault",
    "pgmajfault",
    "pgalloc_normal",
    "pgfree",
    "thp_fault_alloc",
    "thp_collapse_alloc",
    "compact_stall",
    "pgmigrate_success",
    "nr_tlb_remote_flush",
    "nr_tlb_remote_flush_received",
)


def read_interrupts() -> dict[str, int]:
    out = {}
    with open("/proc/interrupts") as f:
        for line in f:
            parts = line.split()
            if parts and parts[0].rstrip(":") in ("TLB", "CAL", "RES"):
                out[parts[0].rstrip(":")] = sum(
                    int(x) for x in parts[1:] if x.isdigit()
                )
    return out


def read_vmstat() -> dict[str, int]:
    out = {}
    with open("/proc/vmstat") as f:
        for line in f:
            k, v = line.split()
            if k in VMSTAT_KEYS:
                out[k] = int(v)
    return out


def read_stat() -> dict[str, float]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) / 100.0 for x in f[1:9]]
    return {"user": vals[0], "sys": vals[2], "steal": vals[7]}


def main() -> int:
    cpus, pattern = int(sys.argv[1]), sys.argv[2]
    log_dir = tempfile.mkdtemp(prefix=f"mtm_kattr_log_{cpus}_")
    s0, i0, v0 = read_stat(), read_interrupts(), read_vmstat()
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "BENCH", "cpu_saturation_probe.py"),
            "--child", str(cpus), pattern, log_dir,
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
        env=dict(os.environ, SPARK_DRIVER_MEMORY="32g"),
    )
    s1, i1, v1 = read_stat(), read_interrupts(), read_vmstat()
    child = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rep = {
        "cpus": cpus,
        "child": json.loads(child[-1]) if child else None,
        "cpu_delta_s": {k: round(s1[k] - s0[k], 1) for k in s0},
        "irq_delta": {k: i1[k] - i0[k] for k in i1},
        "vmstat_delta": {k: v1.get(k, 0) - v0.get(k, 0) for k in v0},
    }
    print(json.dumps(rep, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
