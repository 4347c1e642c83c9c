"""Grok goldens ported from plugins/processor/grok/processor_grok_test.go
TestProcessorGrokParse."""

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.parse import GrokParser


def _events(spark, contents):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], ["i", "content"])
    return to_events(df)


def _fields(df):
    return {r["i"]: dict(r[FIELDS]) for r in df.collect()}


def test_grok_single_pattern_english(spark):
    out = GrokParser(["%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}"]).apply(
        _events(spark, ["begin 123.456 end"])
    )
    f = _fields(out)[0]
    assert f["word1"] == "begin"
    assert f["request_time"] == "123.456"
    assert f["word2"] == "end"


def test_grok_empty_record_fails_kept(spark):
    # matchFail; IgnoreParseFailure default keeps the event untouched
    out = GrokParser(["%{WORD:w} %{NUMBER:n} %{WORD:w2}"]).apply(_events(spark, [""]))
    assert _fields(out)[0] == {"content": ""}


def test_grok_unicode_greedydata(spark):
    out = GrokParser(["%{WORD:english_word} %{GREEDYDATA:message}"]).apply(
        _events(spark, ["hello こんにちは"])
    )
    f = _fields(out)[0]
    assert f["english_word"] == "hello"
    assert f["message"] == "こんにちは"


def test_grok_mixed_with_native_named_group(spark):
    out = GrokParser(
        ["%{WORD:english_word} %{GREEDYDATA:message} (?P<message2>.*)"]
    ).apply(_events(spark, ["hello こんにちは 你好"]))
    f = _fields(out)[0]
    # GREEDYDATA is greedy but must leave room for the trailing group
    assert f["english_word"] == "hello"
    assert f["message"] == "こんにちは"
    assert f["message2"] == "你好"


def test_grok_multiple_patterns_first_wins(spark):
    g = GrokParser(
        [
            "%{IP:ip} %{WORD:verb}",
            "%{WORD:word1} %{NUMBER:num}",
        ]
    )
    f = _fields(g.apply(_events(spark, ["10.1.2.3 GET", "hello 42"])))
    assert f[0] == {"ip": "10.1.2.3", "verb": "GET"}
    assert f[1] == {"word1": "hello", "num": "42"}


def test_grok_drop_on_failure_when_not_ignoring(spark):
    g = GrokParser(["%{NUMBER:n}"], ignore_parse_failure=False)
    out = g.apply(_events(spark, ["123", "notanumber"]))
    f = _fields(out)
    assert set(f.keys()) == {0}
    assert f[0]["n"] == "123"
