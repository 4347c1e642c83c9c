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
    # JVM-expression decode variant (oracle-parity path)
    queries["pipeline_e2e_jvm"] = _timeit(
        lambda: flagship.pipeline_aggregates_from(spark, seq, arrow=False).collect(),
        warm=0,
        runs=1,
    )
    # full routed fan-out materialization (write-side cost, incl. the
    # explicit pre-write repartition)
    queries["routed_materialize"] = _timeit(
        lambda: _noop(flagship.routed_from(spark, seq)), warm=0, runs=2
    )
    # parse-only stage (regex-dominated ≙ reference regex-parse benchmark)
    queries["parse_only"] = _timeit(
        lambda: _noop(flagship.parsed_events_from(seq)), warm=0, runs=2
    )

    # training-data ops
    from loongcollector_spark.dataops.queries import (
        q_dedup_minhash,
        q_embed_topk,
        q_token_stats,
    )

    queries["dedup_minhash"] = _timeit(
        lambda: _noop(q_dedup_minhash(spark, sf_dir)), warm=0, runs=1
    )
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

    # scaling: same job, same input, at cpus/4 vs cpus (the N→4N criterion,
    # in-sandbox). The input is replicated so the job is CPU-bound rather
    # than overhead-bound at test scale — throughput is per REPLICATED row.
    # The sandbox host is SHARED (external load): a pure-CPU multiprocessing
    # probe measures what 4× parallelism can actually deliver right now, and
    # its efficiency is reported as `machine_ceiling` context.
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1" and cpus >= 8:
        low_cpus = max(cpus // 4, 2)
        factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "24"))

        def _cpu_probe() -> float:
            import multiprocessing as mp

            out = {}
            for procs in (low_cpus, cpus):
                t0 = time.perf_counter()
                with mp.Pool(procs) as p:
                    p.map(_burn, [2_000_000] * (cpus * 2))
                out[procs] = time.perf_counter() - t0
            return (out[low_cpus] / out[cpus]) / (cpus / low_cpus)
        from loongcollector_spark import flagship
        from loongcollector_spark.session import get_spark as gs

        prep = gs("bench-scale-prep", master=f"local[{cpus}]", shuffle_partitions=cpus)
        prep.sparkContext.setLogLevel("ERROR")
        big_cache = ensure_sequences_cache(prep, sf_dir, factor)
        prep.stop()

        def e2e_at(n: int, runs: int = 2) -> float:
            s = gs(f"bench-scale-{n}", master=f"local[{n}]", shuffle_partitions=n)
            s.sparkContext.setLogLevel("ERROR")
            seq_big = s.read.parquet(big_cache)
            t = _timeit(
                lambda: flagship.pipeline_aggregates_from(s, seq_big).collect(),
                warm=1,
                runs=runs,
            )
            s.stop()
            return t

        # interleaved passes (low, high, low, high) cancel the shared host's
        # load drift; best-of across passes damps spikes
        l1 = e2e_at(low_cpus)
        h1 = e2e_at(cpus)
        l2 = e2e_at(low_cpus)
        h2 = e2e_at(cpus)
        t_low = min(l1, l2)
        t_high = min(h1, h2)
        big_rows = n_rows * factor
        thr_low = big_rows / t_low
        thr_high = big_rows / t_high
        result["scaling"] = {
            "cpus_low": low_cpus,
            "cpus_high": cpus,
            "replication": factor,
            "rows": big_rows,
            "sec_low": round(t_low, 3),
            "sec_high": round(t_high, 3),
            "seq_per_sec_low": round(thr_low, 1),
            "seq_per_sec_high": round(thr_high, 1),
            "efficiency": round((thr_high / thr_low) / (cpus / low_cpus), 3),
            "machine_ceiling": round(_cpu_probe(), 3),
        }

    return result


if __name__ == "__main__":
    print(json.dumps(run_bench()))
