"""Embedding similarity search over an ``embeddings``-shaped table
``(vec_id, embedding array<float>, label)``.

- Brute-force cosine top-k: the correctness baseline — broadcast the (small)
  query set, JVM-side zip_with/aggregate dot products, per-query window top-k.
  At 100 TB this is a single narrow map + a k-row-per-query shuffle.
- LSH-bucketed ANN: random-hyperplane signatures (deterministic ±1 planes
  derived from md5 so the SQL oracle reproduces them); candidates restricted
  to the query's bucket → the scan prunes to ~1/2^planes of the data when the
  bucket column is a partition/bucketing key.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast-nested-loop against the query set,
    then per-query top-k via window. Cast to double before the fold so the
    arithmetic matches a double-precision SQL oracle."""
    from pyspark.sql import Window

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    joined = vectors.crossJoin(broadcast(queries)).filter(
        F.col(id_col) != F.col(qid_col)
    )
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(v, q), 4).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign(p, d) = parity of the first hex
    digit of md5(f"{p}-{d}"). Pure python at plan time; embedded as literals
    in both the Spark plan and the SQL oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}-{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[int]]) -> Column:
    """Bucket id = Σ_b (dot(v, plane_b) > 0) << b."""
    out = None
    for b, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            dot(F.transform(vec_col, lambda x: x.cast("double")), lit_plane) > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes: list[list[int]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN: exact top-k restricted to the query's LSH bucket(s). The bucket
    equi-join prunes the candidate set (and at scale the vectors table is
    written bucketed/partitioned by this column, so the scan itself prunes).

    ``probe_hamming=1`` enables multi-probe: the query also searches every
    bucket whose signature differs in one bit (planes+1 probes per query) —
    the standard recall/cost dial; recall@10 roughly triples at 4 planes on
    the driver embeddings (tools/ann_recall.py measures it)."""
    from pyspark.sql import Window

    vb = vectors.withColumn("__bucket__", lsh_bucket(F.col(vec_col), planes))
    qb = queries.withColumn("__qbucket__", lsh_bucket(F.col(qvec_col), planes))
    if probe_hamming >= 1:
        flips = F.array(
            F.col("__qbucket__"),
            *[
                F.col("__qbucket__").bitwiseXOR(F.lit(1 << b))
                for b in range(len(planes))
            ],
        )
        qb = qb.withColumn("__qbucket__", F.explode(flips))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    joined = vb.join(
        broadcast(qb), F.col("__bucket__") == F.col("__qbucket__")
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col), F.col(id_col), F.round(cosine(v, q), 4).alias("cos")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    planes: list[list[int]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 256,
    n_anchors: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join (candidates
    share a bucket) then exact cosine ≥ threshold — the embedding analog of
    MinHash near-dup.

    Buckets larger than ``max_bucket`` are capped to pairs touching the
    bucket's ``n_anchors`` lowest-id members (see text.capped_bucket_pairs) —
    an anchor-SAMPLE rather than a single representative, because an LSH
    bucket (unlike a MinHash band bucket) can mix several distinct dup
    groups. Per-bucket candidates drop from O(k²) to O(n_anchors·k). The
    production recall dial is the plane count (more planes → smaller
    buckets); the cap is the blowup guard."""
    vb = vectors.withColumn("__bucket__", lsh_bucket(F.col(vec_col), planes))
    if max_bucket is not None:
        from .text import capped_bucket_pairs

        cands = capped_bucket_pairs(
            vb.select(id_col, "__bucket__"), ["__bucket__"], id_col, max_bucket, n_anchors
        )
        va_df = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"))
        vb_df = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"))
        va = F.transform(F.col("__va__"), lambda x: x.cast("double"))
        vbv = F.transform(F.col("__vb__"), lambda x: x.cast("double"))
        return (
            cands.join(va_df, "id_a")
            .join(vb_df, "id_b")
            .select("id_a", "id_b", F.round(cosine(va, vbv), 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
        )
    a = vb.alias("a")
    b = vb.alias("b")
    va = F.transform(F.col(f"a.{vec_col}"), lambda x: x.cast("double"))
    vbv = F.transform(F.col(f"b.{vec_col}"), lambda x: x.cast("double"))
    return (
        a.join(
            b,
            (F.col("a.__bucket__") == F.col("b.__bucket__"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(va, vbv), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def argmax_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid (plan-time unrolled; k is small)."""
    cent_cols = [F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    best_id, best_cos = F.lit(0), cosine(vec, cent_cols[0])
    for i, c in enumerate(cent_cols[1:], start=1):
        cos_i = cosine(vec, c)
        better = cos_i > best_cos
        best_id = F.when(better, F.lit(i)).otherwise(best_id)
        best_cos = F.when(better, cos_i).otherwise(best_cos)
    return best_id


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> list[list[float]]:
    """Distributed spherical k-means codebook (Lloyd iterations, cosine
    assignment): deterministic init = the k lowest-id vectors; per iteration
    ONE narrow assignment pass + a (cell, dim)-keyed partial-agg shuffle of
    k·dim keys; only the k·dim centroid means ever reach the driver — the
    standard coarse-quantizer training shape at any scale. Empty cells keep
    their previous centroid. Results are deterministic given the input
    (floating-point sum order may vary across partitionings; assignments are
    robust to that for non-degenerate data).

    ``round_to``: round each per-dim mean to that many decimals after every
    iteration — pins the centroids bit-identically across engines so a SQL
    oracle can unroll the same Lloyd iterations (float-sum-order differences
    between Spark's partial agg and a sequential engine stay below the
    rounding grain)."""
    v = vectors.select(
        F.col(id_col), F.transform(vec_col, lambda x: x.cast("double")).alias("__v__")
    )
    cents = [
        list(r["__v__"])
        for r in v.orderBy(id_col).limit(k).collect()
    ]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = v.withColumn("__cell__", argmax_cell(F.col("__v__"), cents))
        means = (
            assigned.select("__cell__", F.posexplode("__v__").alias("pos", "val"))
            .groupBy("__cell__", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {c: list(cents[c]) for c in range(k)}
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["__cell__"], {})[r["pos"]] = r["m"]
        for c, dims in by_cell.items():
            new[c] = [dims.get(p, cents[c][p]) for p in range(dim)]
        cents = [new[c] for c in range(k)]
        if round_to is not None:
            cents = [[round(x, round_to) for x in c] for c in cents]
    return cents


def top_cells(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids by cosine (ties → lower
    id first, matching argmax_cell): build (cos, -id) structs, sort
    descending, slice, recover ids. Plan-time unrolled; k is small."""
    entries = [
        F.struct(
            cosine(vec, F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
            F.lit(-i).alias("nid"),
        )
        for i, c in enumerate(centroids)
    ]
    top = F.slice(F.sort_array(F.array(*entries), asc=False), 1, nprobe)
    return F.transform(top, lambda s: -s["nid"])


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    nprobe: int = 1,
) -> DataFrame:
    """IVF probe: assign every vector to its codebook cell, exact top-k
    within the query's ``nprobe`` nearest cells (the standard IVF recall/cost
    dial — recall@10 on the driver embeddings is measured per nprobe by
    tools/ann_recall.py). At scale the table is written partitioned by cell
    id, so the probe scans nprobe cells' partitions."""
    from pyspark.sql import Window

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    vb = vectors.withColumn("__cell__", argmax_cell(v, centroids))
    if nprobe > 1:
        qb = queries.withColumn(
            "__qcell__", F.explode(top_cells(q, centroids, nprobe))
        )
    else:
        qb = queries.withColumn("__qcell__", argmax_cell(q, centroids))
    joined = vb.join(broadcast(qb), F.col("__cell__") == F.col("__qcell__")).filter(
        F.col(id_col) != F.col(qid_col)
    )
    scored = joined.select(
        F.col(qid_col), F.col(id_col), F.round(cosine(v, q), 4).alias("cos")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def semdedup(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 256,
    n_anchors: int = 16,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    with a k-means codebook, then drop semantic duplicates WITHIN each
    cluster — a vector is a duplicate if some lower-id vector in the same
    cell has cosine similarity ≥ ``threshold`` (deterministic keep-min-id
    stand-in for the paper's keep-farthest-from-centroid tie-break).

    Scale shape: the pairwise pass is cell-scoped — a self-equi-join on the
    cell id, never a global cross join. The paper sizes k with the corpus
    (k ≈ √N), keeping per-cell populations bounded — but k-means gives no
    HARD bound: a boilerplate-heavy corpus can put a million near-identical
    vectors in one cell, and an uncapped self-join there is O(cell²). So the
    candidate generation goes through the same anchor-sample cap as MinHash
    (text.capped_bucket_pairs) and embedding_near_dup_pairs: cells larger
    than ``max_cell`` only pair against their ``n_anchors`` lowest-id
    members, bounding per-cell candidates at O(n_anchors·cell). For a true
    duplicate cluster every copy still pairs with an anchor, so the dup/keep
    verdict is unchanged; cells ≤ ``max_cell`` are exact all-pairs.
    Codebook training is `kmeans_centroids` (only k·dim means ever reach
    the driver).

    Returns (id_col, cell, keep) for every input vector."""
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v__"),
    ).withColumn("__cell__", argmax_cell(F.col("__v__"), centroids))
    if max_cell is not None:
        from .text import capped_bucket_pairs

        cands = capped_bucket_pairs(
            v.select(id_col, "__cell__"), ["__cell__"], id_col, max_cell, n_anchors
        )
        va_df = v.select(F.col(id_col).alias("__ida__"), F.col("__v__").alias("__va__"))
        vb_df = v.select(F.col(id_col).alias("__idb__"), F.col("__v__").alias("__vb__"))
        dups = (
            cands.join(va_df, F.col("id_a") == F.col("__ida__"))
            .join(vb_df, F.col("id_b") == F.col("__idb__"))
            .where(cosine(F.col("__va__"), F.col("__vb__")) >= F.lit(threshold))
            .select(F.col("__idb__").alias(id_col))
            .distinct()
            .withColumn("__dup__", F.lit(True))
        )
    else:
        left = v.select(
            F.col("__cell__"),
            F.col(id_col).alias("__ida__"),
            F.col("__v__").alias("__va__"),
        )
        right = v.select(
            F.col("__cell__"),
            F.col(id_col).alias("__idb__"),
            F.col("__v__").alias("__vb__"),
        )
        dups = (
            left.join(right, "__cell__")
            .where(F.col("__ida__") < F.col("__idb__"))
            .where(cosine(F.col("__va__"), F.col("__vb__")) >= F.lit(threshold))
            .select(F.col("__idb__").alias(id_col))
            .distinct()
            .withColumn("__dup__", F.lit(True))
        )
    return v.join(dups, id_col, "left").select(
        F.col(id_col),
        F.col("__cell__").alias("cell"),
        F.coalesce(~F.col("__dup__"), F.lit(True)).alias("keep"),
    )
