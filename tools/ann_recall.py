"""Measure recall@k of the approximate ANN paths (LSH buckets, IVF cells)
against the exact brute-force top-k, over the driver embeddings table.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from loongcollector_spark.dataops import similarity
    from loongcollector_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = embs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["vec_id"])
        return out

    brute = topk_sets(similarity.brute_force_topk(embs, queries, k=k))

    def recall(approx) -> float:
        got = topk_sets(approx)
        per_q = [
            len(got.get(q, set()) & brute[q]) / len(brute[q]) for q in brute
        ]
        return sum(per_q) / len(per_q)

    for n_planes in (2, 4):
        planes = similarity.hyperplanes(64, n_planes)
        for probe in (0, 1):
            r = recall(
                similarity.lsh_topk(embs, queries, planes, k=k, probe_hamming=probe)
            )
            print(
                f"lsh planes={n_planes} buckets={2 ** n_planes} "
                f"probe_hamming={probe}: recall@{k} = {r:.3f}"
            )

    # IVF nprobe dial: k-means codebook (the production coarse quantizer),
    # probe the nprobe nearest cells per query
    cents = similarity.kmeans_centroids(embs, k=8, iters=2, round_to=6)
    for nprobe in (1, 2, 4):
        r = recall(similarity.ivf_topk(embs, queries, cents, k=k, nprobe=nprobe))
        print(f"ivf cells=8 nprobe={nprobe}: recall@{k} = {r:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
