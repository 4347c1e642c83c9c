"""fmtstr dynamic sink-name formatting (pkg/fmtstr) — goldens from
format_topic_test.go / formatstring_test.go and the flusher_kafka_v2 /
FormatIndex behaviors."""

import pytest

import pyspark.sql.functions as F

from loongcollector_spark.operators.fmtstr import (
    FormatError,
    compile_format,
    compile_keys,
    es_index,
    format_column,
    kafka_hash_key,
    kafka_topic,
    with_kafka_routing,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


# --- compile / lexer ---------------------------------------------------------


def test_compile_keys_golden():
    # formatstring_test.go:42-46
    assert compile_keys("kafka_%{app_name}") == ["app_name"]
    assert compile_keys("plain") == []
    assert compile_keys("%{a}-%{b}") == ["a", "b"]


def test_compile_format_literals_and_vars():
    assert compile_format("test_%{app}") == [("lit", "test_"), ("var", "app")]
    # '%' not followed by '{' stays literal (lexer case '%': continue)
    assert compile_format("100%x_%{a}") == [("lit", "100%x_"), ("var", "a")]
    # trailing '%' flushes as text (lexer end-of-string return + defer)
    assert compile_format("abc%") == [("lit", "abc%")]


def test_escape_removes_backslash():
    # '\' escapes the next character anywhere (makeLexer case '\\')
    assert compile_format(r"a\%{b}") == [("lit", "a%{b}")]
    assert compile_format(r"%{a\}b}") == [("var", "a}b")]


def test_variable_ops_parsed_and_ignored():
    # %{x:p1:?p2} → ops (':','p1'), (':?','p2'); field stays 'x'
    assert compile_format("%{x:p1:?p2}") == [("var", "x")]


def test_error_taxonomy():
    with pytest.raises(FormatError):
        compile_format("%{a%{b}}")  # errNestedVar
    with pytest.raises(FormatError):
        compile_format("%{a")  # errMissingClose
    with pytest.raises(FormatError):
        compile_format("%{}")  # errEmptyFormat
    with pytest.raises(FormatError):
        compile_format("%{:op}")  # errUnexpectedOperator


# --- topic formatting (format_topic_test.go) ---------------------------------


def test_format_topic_golden(spark):
    # format_topic_test.go:24-32: {"app":"ilogtail"}, "test_%{app}"
    values = {"app": F.lit("ilogtail")}
    out = _one(spark, format_column("test_%{app}", lambda k: values.get(k, F.lit(None))))
    assert out == "test_ilogtail"


def test_missing_key_expands_to_key_text(spark):
    # FormatTopic vc: absent key → StringElement{S: key}
    out = _one(spark, format_column("t_%{nope}", lambda k: F.lit(None).cast("string")))
    assert out == "t_nope"


def test_kafka_topic_content_tag_and_rename(spark):
    contents = F.create_map(F.lit("level"), F.lit("warn"))
    tags = F.create_map(F.lit("host"), F.lit("h1"), F.lit("renamed"), F.lit("h2"))
    t = kafka_topic("l_%{content.level}_%{tag.host}", contents, tags)
    assert _one(spark, t) == "l_warn_h1"
    # findTargetValues converter.go:296-301: tag miss retries via rename map
    t2 = kafka_topic(
        "x_%{tag.orig}", contents, tags, tag_key_rename={"orig": "renamed"}
    )
    assert _one(spark, t2) == "x_h2"
    # content miss → literal field text
    t3 = kafka_topic("y_%{content.gone}", contents, tags)
    assert _one(spark, t3) == "y_content.gone"


def test_kafka_topic_rejects_bad_prefix():
    with pytest.raises(FormatError):
        kafka_topic("%{whatever}", F.expr("map()"), F.expr("map()"))


# --- ES index (format_index.go) ----------------------------------------------


def test_es_index_timestamp(spark):
    contents = F.create_map(F.lit("app"), F.lit("svc"))
    tags = F.expr("map()")
    # 2015-06-11T20:46:02Z
    idx = es_index(
        "logs-%{content.app}-%{+yyyy.MM.dd}", contents, tags, F.lit(1434055562)
    )
    assert _one(spark, idx) == "logs-svc-2015.06.11"


# --- hash partition key (flusher_kafka_v2.go:344-356) -------------------------


def test_hash_key_join_and_fallback(spark):
    contents = F.create_map(
        F.lit("a"), F.lit("va"), F.lit("b"), F.lit("vb")
    )
    tags = F.expr("map()")
    pattern = "%{content.a}_%{content.b}"
    k = kafka_hash_key(pattern, ["content.a", "content.b"], contents, tags, "ls")
    assert _one(spark, k) == "va###vb"
    # HashKeys not among topic fields never resolve (selectFields==topicKeys)
    k2 = kafka_hash_key(pattern, ["content.c"], contents, tags, "ls")
    assert _one(spark, k2) == "ls"
    # listed but value missing → fallback
    k3 = kafka_hash_key("%{content.c}", ["content.c"], contents, tags, "ls")
    assert _one(spark, k3) == "ls"


def test_with_kafka_routing_columns(spark):
    df = spark.createDataFrame(
        [("d1", {"level": "warn"}, {"host": "h1"})],
        "doc_id string, contents map<string,string>, tags map<string,string>",
    )
    out = with_kafka_routing(
        df,
        "logs_%{content.level}",
        hash_keys=["content.level"],
        default_hash_key="ls",
    ).collect()[0]
    assert out["__topic__"] == "logs_warn"
    assert out["__partition_key__"] == "warn"
