import pyspark.sql.functions as F

from loongcollector_spark.tokens import decode_tokens, decode_tokens_arrow, encode_line

LINES = [
    '::1 - - [18/Jul/2022:07:28:01 +0000] "GET /hello/ilogtail HTTP/1.1" 404 153 "-" "curl/7.74.0" "-"',
    "value1\tvalue2",
    '{"url":"POST /PutData HTTP/1.1","status":200}',
    "",
    "plain text",
]


def test_roundtrip_jvm(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["line"])
    out = df.select(
        "line", decode_tokens(encode_line(F.col("line"))).alias("back")
    ).collect()
    for r in out:
        assert r.back == r.line


def test_arrow_decode_matches_jvm(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["line"]).select(
        "line", encode_line(F.col("line")).cast("array<int>").alias("tokens")
    )
    arrow = decode_tokens_arrow(df, "tokens", "content").collect()
    for r in arrow:
        assert r.content == r.line


def test_token_array_equality_invariant(spark, sf_dir):
    """Per-row invariant vs reference (BASELINE.json input_hint): untouched rows
    decode→re-encode bit-exact."""
    from loongcollector_spark.synth import sequences_df

    seq = sequences_df(spark, sf_dir).limit(200)
    re_encoded = seq.select(
        "tokens",
        encode_line(decode_tokens("tokens")).cast("array<int>").alias("tokens2"),
    )
    bad = re_encoded.filter(F.col("tokens") != F.col("tokens2")).count()
    assert bad == 0
