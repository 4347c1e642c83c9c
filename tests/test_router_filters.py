"""Router fan-out + filter semantics (Router.cpp / Condition.cpp /
processor_filter_* goldens)."""

import pyspark.sql.functions as F

from loongcollector_spark.operators.filters import (
    FilterKeyRegex,
    FilterNative,
    FilterRegex,
)
from loongcollector_spark.routing import RegexRouter, RouteCondition, Router


def _frame(spark, *field_dicts):
    rows = [(i, d) for i, d in enumerate(field_dicts)]
    return spark.createDataFrame(rows, "i int, fields map<string,string>")


def test_filter_regex_include_exclude(spark):
    df = _frame(spark, {"ip": "10.1.1.1", "m": "GET"}, {"ip": "192.168.0.1", "m": "GET"},
                {"m": "GET"})
    out = FilterRegex(include={"ip": r"10\..*", "m": "GET"}).apply(df)
    assert [r["i"] for r in out.collect()] == [0]
    out2 = FilterRegex(exclude={"ip": r"10\..*"}).apply(df)
    assert sorted(r["i"] for r in out2.collect()) == [1, 2]  # missing key passes exclude


def test_filter_key_regex(spark):
    df = _frame(spark, {"user_id": "1"}, {"other": "2"})
    out = FilterKeyRegex(include=[r"user_.*"]).apply(df)
    assert [r["i"] for r in out.collect()] == [0]
    out2 = FilterKeyRegex(exclude=[r"user_.*"]).apply(df)
    assert [r["i"] for r in out2.collect()] == [1]


def test_filter_native_expression_tree(spark):
    df = _frame(spark, {"a": "1", "b": "x"}, {"a": "2", "b": "x"}, {"a": "1", "b": "y"})
    tree = {
        "operator": "and",
        "operands": [
            {"key": "a", "exp": "1"},
            {"operator": "not", "operands": [{"key": "b", "exp": "y"}]},
        ],
    }
    out = FilterNative(condition_exp=tree).apply(df)
    assert [r["i"] for r in out.collect()] == [0]


def test_router_multi_match_copies(spark):
    df = spark.createDataFrame(
        [(1, "prod", "team-b"), (2, "staging", "team-b"), (3, "staging", "team-a")],
        ["id", "env", "team"],
    )
    rules = [
        RouteCondition("sink_a", "env", "prod"),
        RouteCondition("sink_b", "team", "team-b"),
        RouteCondition("sink_default"),  # unconditioned ⇒ always matches
    ]
    out = Router(rules).apply(df)
    got = sorted((r["id"], r["sink"]) for r in out.collect())
    assert got == [
        (1, "sink_a"),
        (1, "sink_b"),
        (1, "sink_default"),
        (2, "sink_b"),
        (2, "sink_default"),
        (3, "sink_default"),
    ]


def test_router_discard_tag(spark):
    # tag removal is per routed copy (Router.cpp:71-79) — NULLed on the
    # discarding rule's copy, not globally dropped
    df = spark.createDataFrame([(1, "prod")], ["id", "env"])
    rules = [RouteCondition("s1", "env", "prod", discard_tag=True)]
    out = Router(rules).apply(df)
    rows = out.collect()
    assert rows[0]["sink"] == "s1" and rows[0]["env"] is None


def test_regex_router_first_match_and_default(spark):
    df = _frame(spark, {"content": "ERROR boom"}, {"content": "WARN hm"}, {"content": "ok"})
    out = RegexRouter(
        "content", [("ERROR", "err_store"), ("WARN|ERROR", "warn_store")], "default"
    ).apply(df)
    got = {r["i"]: r["sink"] for r in out.collect()}
    assert got == {0: "err_store", 1: "warn_store", 2: "default"}


def test_filter_native_expression_reference_golden(spark):
    """Golden from ProcessorFilterNativeUnittest TestBaseFilter case 1:
    full-match semantics — exp '.*value1' does NOT match 'value1xxxxx'
    (trailing text), so only the second event passes the AND tree."""
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.filters import FilterNative

    rows = [
        (0, {"key1": "value1xxxxx", "key2": "value2xxxxx"}),
        (1, {"key1": "abcdeavalue1", "key2": "value2xxxxx"}),
    ]
    df = spark.createDataFrame(rows, ["i", "fields"])
    tree = {
        "operator": "and",
        "operands": [
            {"key": "key1", "exp": ".*value1", "type": "regex"},
            {"key": "key2", "exp": "value2.*", "type": "regex"},
        ],
    }
    out = FilterNative(condition_exp=tree).apply(df)
    assert [r["i"] for r in out.collect()] == [1]


def test_router_discarding_tag_per_copy(spark):
    """DiscardingTag applies only to the copy routed via the discarding rule
    (Router.cpp:71-79); the always-match copy keeps the tag."""
    from loongcollector_spark.routing import RouteCondition, Router

    df = spark.createDataFrame([("d1", "prod")], ["doc_id", "env"])
    router = Router(
        [
            RouteCondition("sink_p", "env", "prod", discard_tag=True),
            RouteCondition("sink_all"),
        ]
    )
    rows = {r["sink"]: r["env"] for r in router.apply(df).collect()}
    assert rows == {"sink_p": None, "sink_all": "prod"}


def test_erase_event_file_offset_only(spark):
    """ShouldEraseEvent: a failed parse whose only remaining content is
    __file_offset__ is dropped (CommonParserOptions.cpp:104-110)."""
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.base import FIELDS
    from loongcollector_spark.operators.parse import RegexParser

    rows = [
        (0, {"content": "nomatch", "__file_offset__": "123"}),
        (1, {"content": "nomatch", "real_field": "x"}),
    ]
    df = spark.createDataFrame(rows, ["i", FIELDS])
    out = RegexParser(r"(\d+)", ["num"]).apply(df)
    got = [r["i"] for r in out.collect()]
    assert got == [1]  # offset-only row erased, row with a real field kept
