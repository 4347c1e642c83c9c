"""Benchmark harness: runs the headline pipeline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Throughput fields (sequences/sec, tokens/sec) per the north rule are included
as extra keys. Execution is forced with a noop write (full materialization,
no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from loongcollector_spark import flagship
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.synth import sequences_df

    spark = get_spark("loongcollector-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    seq = sequences_df(spark, sf_dir)
    n_rows = seq.count()
    n_tokens = seq.agg({"n_tok": "sum"}).collect()[0][0]

    def t_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def t_collect(df) -> float:
        t0 = time.perf_counter()
        df.collect()
        return time.perf_counter() - t0

    queries: dict[str, float] = {}

    # warm the JVM/codegen paths once on a tiny slice
    flagship.pipeline_aggregates(spark, "/root/testdata/sf0.001").collect()

    # headline: full parse→enrich→route→aggregate (JVM decode path)
    queries["pipeline_e2e"] = t_collect(flagship.pipeline_aggregates(spark, sf_dir))
    # same with the Arrow decode stage (the pandas-UDF path)
    queries["pipeline_e2e_arrow"] = t_collect(
        flagship.pipeline_aggregates(spark, sf_dir, arrow=True)
    )
    # full routed fan-out materialization (the write-side cost)
    queries["routed_materialize"] = t_noop(flagship.routed(spark, sf_dir))
    # parse-only stage (regex-dominated, ≙ reference regex-parse benchmark)
    queries["parse_only"] = t_noop(flagship.parsed_events(spark, sf_dir))

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
    spark.stop()
    return result


if __name__ == "__main__":
    print(json.dumps(run_bench()))
