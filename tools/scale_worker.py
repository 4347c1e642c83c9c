"""Pinned Spark worker for the interleaved scaling bench.

One worker process = one parallelism level (launched under `taskset -c <mask>`
so the whole tree — driver python, JVM, pyspark daemon + workers — inherits the
CPU mask). The orchestrator (bench.py `_scaling_bench`) keeps TWO workers alive
simultaneously (local[N] and local[4N]) and alternates timed runs between them,
so each scaling pass compares low/high throughput measured seconds apart under
the SAME external host load — the round-2 block structure (all low runs, then
all high runs, minutes apart) let a co-tenant burst during one block corrupt
the ratio.

Protocol (line-oriented, stdin → stdout):
    parent → worker:  "run\n"   one timed e2e run        "quit\n"  shutdown
    worker → parent:  "READY\n" after session-up + one warm run, then one JSON
                      line per run:
        {"wall": s, "cpu": s, "ext_cpu": s}
    `cpu`     = this worker tree's CPU-seconds over the run window
    `ext_cpu` = host-wide busy CPU-seconds (from /proc/stat) minus `cpu`:
                everything else on the box during the window — the per-pass
                external-load evidence the headline pass is selected against.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_cpu_s() -> float:
    """CPU seconds (user+sys) of this process tree (see bench._tree_cpu_s)."""
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        # utime+stime of the process itself PLUS cutime+cstime (CPU of its
        # already-REAPED children — pyspark workers recycle mid-run; counting
        # only live procs undercounted a 16-core run by ~2x when the daemon
        # reaped its workers between the before/after snapshots)
        procs[int(p)] = (
            int(parts[1]),
            int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14]),
        )
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    seen: set[int] = set()
    stack = [me]
    while stack:
        x = stack.pop()
        if x in seen:
            continue
        seen.add(x)
        stack.extend(children.get(x, []))
    clk = os.sysconf("SC_CLK_TCK")
    return sum(procs[p][1] for p in seen if p in procs) / clk


def _host_cpu_s() -> tuple[float, float]:
    """(busy, steal) host-wide CPU-seconds since boot. `busy` = all non-idle
    jiffies (user+nice+sys+irq+softirq+steal); `steal` = hypervisor steal —
    cycles the physical host's co-tenants took from this guest, the
    otherwise-invisible external load on this sandbox (measured: ~2.3 cores
    stolen at 32-wide load even with zero guest-visible co-tenant activity)."""
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    clk = os.sysconf("SC_CLK_TCK")
    idle = v[3] + v[4]
    steal = v[7] if len(v) > 7 else 0
    return (sum(v) - idle) / clk, steal / clk


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--cache", required=True)
    ap.add_argument("--conf", default="{}", help="extra spark conf as JSON")
    args = ap.parse_args()

    from loongcollector_spark import flagship
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        f"scale-worker-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf=json.loads(args.conf),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm TWICE with a full-heap drain in between, untimed. One warm run is
    # not enough: the first timed run otherwise pays (a) the warm run's
    # full-heap collection inside its window (measured: 373 vs 130
    # CPU-seconds for the identical 4-core run) and (b) re-faulting the
    # post-GC heap pages (measured: 305 vs 141 CPU-seconds on the first
    # 16-core run even after a single warm+gc). warm → gc → warm re-faults
    # the steady-state working set so the first timed run starts hot — the
    # same effect the post-run System.gc() below maintains between runs.
    # wider levels stabilize slower (GC ergonomics + JIT re-profiling across
    # more threads: measured 368 → 215 → 185 CPU-seconds over the first
    # three 16-core executions, and at 32-wide the first TIMED run after a
    # triple warm still burned 345-610 CPU-s vs the ~180-205 steady state,
    # improving monotonically run over run) — give wider levels more untimed
    # executions; each costs only ~10-20 s at those widths.
    for _ in range(5 if args.cpus >= 32 else 3 if args.cpus >= 16 else 2):
        flagship.pipeline_aggregates_from(spark, spark.read.parquet(args.cache)).collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    print("READY", flush=True)

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd != "run":
            continue
        # rebuild the DataFrame each run: AQE reuses materialized stages when
        # re-collecting the same DataFrame object
        df = spark.read.parquet(args.cache)
        h0, st0 = _host_cpu_s()
        c0 = _tree_cpu_s()
        t0 = time.perf_counter()
        flagship.pipeline_aggregates_from(spark, df).collect()
        wall = time.perf_counter() - t0
        cpu = _tree_cpu_s() - c0
        h1, st1 = _host_cpu_s()
        ext = max(0.0, (h1 - h0) - cpu)
        # Untimed major GC between runs: heap garbage accumulated by run N
        # otherwise forces a concurrent GC INSIDE run N+1's timed window
        # (observed: one low run at 2.6x the CPU-seconds of its siblings
        # with zero external load) — drain it outside the measurement.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "wall": round(wall, 3),
                    "cpu": round(cpu, 2),
                    "ext_cpu": round(ext, 2),
                    "steal_cpu": round(st1 - st0, 2),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
