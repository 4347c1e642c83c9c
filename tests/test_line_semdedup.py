"""line_dedup (RefinedWeb/CCNet line-level dedup) and semdedup
(SemDeDup cluster-scoped semantic dedup) unit tests."""

from __future__ import annotations

from loongcollector_spark.dataops import similarity, text


def test_line_dedup_basic(spark):
    docs = spark.createDataFrame(
        [
            (1, "HEADER\n\nunique one\nFOOT"),
            (2, "HEADER\nunique two\nFOOT"),
            (3, "only mine\n\nonly mine too"),
            (4, "HEADER\nHEADER\nsolo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.line_dedup(docs, min_docs=2).collect()}
    # HEADER (3 docs) and FOOT (2 docs) removed everywhere; empty lines and
    # single-doc lines survive; repeated-within-one-doc lines survive
    # (count is per DISTINCT doc)
    assert out[1]["text"] == "\nunique one"
    assert out[1]["removed_lines"] == 2 and out[1]["total_lines"] == 4
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "only mine\n\nonly mine too"
    assert out[3]["removed_lines"] == 0
    assert out[4]["text"] == "solo"
    assert out[4]["removed_lines"] == 2


def test_line_dedup_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in text.line_dedup(docs, min_docs=3).collect()}
    assert out == {1: "b", 2: "c", 3: "d"}
    out2 = {r["doc_id"]: r["text"] for r in text.line_dedup(docs, min_docs=4).collect()}
    assert out2 == {1: "a\nb", 2: "a\nc", 3: "a\nd"}


def test_semdedup_drops_higher_id_near_dups(spark):
    # two tight clusters on orthogonal axes + planted exact duplicates
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (10, [1.0, 0.0, 0.0, 0.0]),    # exact dup of 0
        (11, [0.0, 1.0, 0.0, 0.0]),    # exact dup of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(df, k=4, iters=2, round_to=6)
    out = {r["vec_id"]: r for r in similarity.semdedup(df, cents, threshold=0.98).collect()}
    assert len(out) == 6
    assert out[0]["keep"] and not out[10]["keep"]
    assert out[2]["keep"] and not out[11]["keep"]
    assert out[3]["keep"]
    # near-dup 1 dropped iff it landed in 0's cell (cos(0,1)≈0.9999 ≥ .98)
    if out[1]["cell"] == out[0]["cell"]:
        assert not out[1]["keep"]
    # dups share their original's cell
    assert out[10]["cell"] == out[0]["cell"]
    assert out[11]["cell"] == out[2]["cell"]
