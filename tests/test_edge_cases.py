"""Edge cases: nulls, empty inputs, degenerate documents — the engine must
degrade gracefully, never throw."""

import pyspark.sql.functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

from loongcollector_spark.dataops import text
from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.common import ParserOptions
from loongcollector_spark.operators.parse import JsonParser, RegexParser
from loongcollector_spark.operators.split import SplitLogString, SplitMultiline
from loongcollector_spark.routing import RouteCondition, Router


def _empty_events(spark):
    schema = StructType(
        [
            StructField("i", StringType()),
            StructField(FIELDS, MapType(StringType(), StringType())),
        ]
    )
    return spark.createDataFrame([], schema)


def test_parsers_on_empty_frame(spark):
    ev = _empty_events(spark)
    assert RegexParser(r"(\d+)", ["n"]).apply(ev).count() == 0
    assert JsonParser().apply(ev).count() == 0


def test_parser_null_content(spark):
    rows = [(0, {"content": None}), (1, {"other": "x"})]
    df = spark.createDataFrame(rows, ["i", FIELDS])
    # null/missing source: parse fails; rows with other contents survive
    out = RegexParser(r"(\d+)", ["n"], ParserOptions(keep_fail=True)).apply(df)
    assert out.count() == 2
    out2 = RegexParser(r"(\d+)", ["n"]).apply(df)
    got = {r["i"]: dict(r[FIELDS]) for r in out2.collect()}
    assert 1 in got  # row with other field kept


def test_split_empty_string(spark):
    ev = to_events(spark.createDataFrame([("d", "")], ["doc_id", "content"]))
    out = SplitLogString().apply(ev)
    assert [r[FIELDS]["content"] for r in out.collect()] == [""]


def test_multiline_no_matches_at_all(spark):
    rows = [("d", 0, "x"), ("d", 1, "y")]
    ev = spark.createDataFrame(rows, ["doc_id", "__line_no__", "content"])
    ev = ev.select(
        "doc_id", "__line_no__", F.create_map(F.lit("content"), F.col("content")).alias(FIELDS)
    )
    assert SplitMultiline(start_pattern=r"NEVER").apply(ev).count() == 0


def test_router_no_rules_match(spark):
    df = spark.createDataFrame([(1, "dev")], ["id", "env"])
    out = Router([RouteCondition("s1", "env", "prod")]).apply(df)
    assert out.count() == 0  # unrouted rows dropped (empty Route result)


def test_minhash_empty_and_tiny_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, "a b c d e f g h i j")], ["doc_id", "text"]
    )
    # docs with <3 words have no shingles → no candidates, no crash
    assert text.minhash_near_dup_pairs(df, threshold=0.1).count() == 0


def test_quality_metrics_empty_text(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    m = text.quality_metrics(df).collect()[0]
    assert m["punct_ratio"] == 0.0
    assert m["quality_score"] is not None


def test_near_dup_clusters_empty_pairs(spark):
    from pyspark.sql.types import LongType

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    pairs = spark.createDataFrame([], schema)
    assert text.near_dup_clusters(pairs).count() == 0


def test_pack_token_bins_empty(spark):
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("n_tok", LongType()),
        ]
    )
    df = spark.createDataFrame([], schema)
    assert text.pack_token_bins(df, 4096).count() == 0
