"""Hot-bucket (boilerplate-cluster) behavior of the LSH candidate generation:
oversized buckets must produce a BOUNDED candidate set (star/anchor pairing)
instead of the O(k²) self-join blowup — VERDICT r1 item 2."""

import pyspark.sql.functions as F

from loongcollector_spark.dataops import similarity, text

BOILER = "the same boilerplate paragraph repeated across many scraped pages " * 3


def _hot_docs(spark, n_copies=1000, n_unique=20):
    uniq = [
        (i, f"unique document number {i} with some distinct words alpha beta gamma delta {i}")
        for i in range(n_unique)
    ]
    copies = [(100000 + i, BOILER) for i in range(n_copies)]
    return spark.createDataFrame(uniq + copies, ["doc_id", "text"])


def test_minhash_hot_bucket_candidates_bounded(spark):
    docs = _hot_docs(spark, n_copies=1000)
    cands = text.minhash_candidate_pairs(docs, max_bucket=64)
    n = cands.count()
    # star pairing: every copy pairs with the cluster's min-id representative
    # → exactly 999 intra-cluster pairs (not C(1000,2) ≈ 500k)
    assert n < 2000, n
    rep_pairs = cands.filter(F.col("id_a") == 100000).count()
    assert rep_pairs == 999


def test_minhash_hot_cluster_connected_via_representative(spark):
    """Star capping keeps clustering exact for true dup clusters: every copy
    still reaches the representative, so connected components are unchanged."""
    docs = _hot_docs(spark, n_copies=300)
    pairs = text.minhash_near_dup_pairs(docs, threshold=0.5)
    clusters = text.near_dup_clusters(pairs)
    hot = clusters.filter(F.col("cluster") == 100000)
    assert hot.count() == 300


def test_minhash_small_buckets_unchanged_by_cap(spark):
    """Corpora with no oversized bucket produce identical pairs capped vs
    uncapped."""
    docs = _hot_docs(spark, n_copies=10)
    capped = set(map(tuple, text.minhash_candidate_pairs(docs, max_bucket=64).collect()))
    uncapped = set(
        map(tuple, text.minhash_candidate_pairs(docs, max_bucket=None).collect())
    )
    assert capped == uncapped


def test_embedding_hot_bucket_anchor_capped(spark):
    n = 300
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = similarity.hyperplanes(4, 4)
    pairs = similarity.embedding_near_dup_pairs(
        df, planes, threshold=0.99, max_bucket=256, n_anchors=16
    )
    # all pairs touching the 16 lowest-id anchors: C(16,2) + 16*(300-16)
    assert pairs.count() == 120 + 16 * 284


def test_semdedup_hot_cell_capped_and_correct(spark):
    """semdedup's per-cell pairwise pass goes through the anchor-sample cap
    (VERDICT r4 item 3): a 400-copy cell flags every copy keep=0, and the
    physical plan carries the anchor rank (bounded candidates), never a
    cartesian/unbounded cell self-join."""
    n = 400
    base = [(i, [float((i * 7 + d) % 13) for d in range(8)]) for i in range(20)]
    copies = [(1000 + i, base[0][1]) for i in range(n)]
    df = spark.createDataFrame(base + copies, "vec_id long, embedding array<double>")
    cents = [r[1] for r in base[:4]]
    out = similarity.semdedup(df, cents, threshold=0.999, max_cell=64, n_anchors=8)
    rows = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert rows[0] is True  # lowest id of the copy cluster survives
    assert all(rows[1000 + i] is False for i in range(n))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "__rk__" in plan  # anchor rank → candidates bounded at O(anchors·cell)


def test_semdedup_cap_matches_uncapped_on_small_cells(spark):
    """Cells under the cap: capped and uncapped semdedup agree exactly."""
    rows = [(i, [float((i * 3 + d) % 7) for d in range(8)]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # planted dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rows[i][1] for i in range(4)]
    capped = sorted(map(tuple, similarity.semdedup(df, cents, 0.999, max_cell=64).collect()))
    uncapped = sorted(map(tuple, similarity.semdedup(df, cents, 0.999, max_cell=None).collect()))
    assert capped == uncapped
    dropped = {vid for vid, _, k in capped if not k}
    # every planted copy (id 100+i duplicates id i, a lower id) must drop
    assert {100 + i for i in range(5)} <= dropped


def test_ivf_nprobe_widens_candidates(spark):
    """nprobe=2 searches the two nearest cells: results are a superset-or-
    equal quality of nprobe=1 (every nprobe=1 hit whose cos clears the
    wider top-k survives), and recall can only improve."""
    rows = [(i, [float((i * 5 + d * 3) % 11) for d in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rows[i][1] for i in range(6)]
    qs = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute = similarity.brute_force_topk(df, qs, k=5)
    got1 = similarity.ivf_topk(df, qs, cents, k=5, nprobe=1)
    got2 = similarity.ivf_topk(df, qs, cents, k=5, nprobe=2)

    def hits(res):
        b = {(r["qid"], r["vec_id"]) for r in brute.collect()}
        return len({(r["qid"], r["vec_id"]) for r in res.collect()} & b)

    assert hits(got2) >= hits(got1)


def test_near_dup_clusters_auto_switches_on_long_chain(spark, recwarn):
    """Default (auto) clustering on a 64-node chain (diameter 63 > max_iter
    10): label propagation alone can't converge — the auto star-contraction
    fallback must produce fully-merged labels WITHOUT the non-convergence
    warning (VERDICT r4 item 4)."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["id_a", "id_b"]
    )
    got = {r["doc_id"]: r["cluster"] for r in text.near_dup_clusters(pairs).collect()}
    assert all(got[i] == 0 for i in range(n))
    assert got[100] == 100 and got[101] == 100
    assert not [w for w in recwarn.list if "did not converge" in str(w.message)]
