"""Mini SPL front-end: pipe scripts compile to the same DataFrame programs
(reference processor_spl semantics, docs/cn/plugins/processor/spl)."""

import pytest

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.spl import compile_spl


def _events(spark, contents):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], ["i", "content"])
    return to_events(df)


def test_spl_parse_where_project(spark):
    script = (
        "* | parse-regexp content, '(\\S+) (\\d+)' as word, num"
        " | where num = '42' | project-away content"
    )
    out = compile_spl(script)(_events(spark, ["hello 42", "bye 7"]))
    rows = [dict(r[FIELDS]) for r in out.collect()]
    assert rows == [{"word": "hello", "num": "42"}]


def test_spl_extend_and_rename(spark):
    script = (
        "* | parse-csv content as a, b"
        " | extend total = cast(a as int) + cast(b as int)"
        " | project-rename left = a"
    )
    out = compile_spl(script)(_events(spark, ["3,4"]))
    f = dict(out.collect()[0][FIELDS])
    assert f["total"] == "7"
    assert f["left"] == "3" and "a" not in f


def test_spl_parse_json(spark):
    out = compile_spl("* | parse-json content | project k")(
        _events(spark, ['{"k":"v","drop":"me"}'])
    )
    assert dict(out.collect()[0][FIELDS]) == {"k": "v"}


def test_spl_stats(spark):
    script = (
        "* | parse-csv content as method, bytes"
        " | stats sum(bytes) as total by method"
    )
    out = compile_spl(script)(
        _events(spark, ["GET,10", "GET,5", "POST,7"])
    )
    got = {r["method"]: r["total"] for r in out.collect()}
    assert got == {"GET": 15.0, "POST": 7.0}


def test_spl_where_with_quoted_pipe_and_keywords(spark):
    out = compile_spl("* | where content like 'a|b%'")(
        _events(spark, ["a|bc", "zzz"])
    )
    assert [r[FIELDS]["content"] for r in out.collect()] == ["a|bc"]


def test_spl_rejects_unknown_verb(spark):
    with pytest.raises(ValueError, match="unknown SPL verb"):
        compile_spl("* | frobnicate x")


def test_spl_requires_star(spark):
    with pytest.raises(ValueError, match="must start with"):
        compile_spl("where x = 1")


def test_spl_matches_handwritten_pipeline(spark):
    """The SPL script and the explicit operator chain produce identical
    results — the SPL engine is just a front-end."""
    from loongcollector_spark.operators.common import ParserOptions
    from loongcollector_spark.operators.parse import RegexParser

    lines = [f"10.0.0.{i} GET {200 + i % 3}" for i in range(30)]
    script = (
        "* | parse-regexp content, '(\\S+) (\\S+) (\\d+)' as ip, method, status"
        " | where status = '200' | project ip, status"
    )
    spl_rows = sorted(
        tuple(sorted(dict(r[FIELDS]).items()))
        for r in compile_spl(script)(_events(spark, lines)).collect()
    )
    hand = RegexParser(
        r"(\S+) (\S+) (\d+)", ["ip", "method", "status"], ParserOptions(keep_fail=True)
    ).apply(_events(spark, lines))
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.base import fget

    hand = hand.filter(fget("status") == "200").select(
        F.map_from_arrays(
            F.array(F.lit("ip"), F.lit("status")),
            F.array(fget("ip"), fget("status")),
        ).alias(FIELDS)
    )
    hand_rows = sorted(
        tuple(sorted(dict(r[FIELDS]).items())) for r in hand.collect()
    )
    assert spl_rows == hand_rows


def test_spl_where_with_function_call(spark):
    """SQL functions in where/extend expressions are NOT rewritten into
    fields-map lookups (only bare value identifiers are)."""
    script = (
        "* | parse-csv content as word, num"
        " | extend t = trim(word) | where length(t) = 3"
    )
    out = compile_spl(script)(_events(spark, ["  abc ,1", "x,2"]))
    rows = [dict(r[FIELDS]) for r in out.collect()]
    assert len(rows) == 1 and rows[0]["t"] == "abc"


def test_spl_parse_kv_sort_limit_dedup(spark):
    script = (
        "* | parse-kv content, ' ', '='"
        " | where cast(ms as int) > 1"
        " | sort by ms desc | limit 2"
    )
    out = compile_spl(script)(
        _events(spark, ["a=1 ms=9", "a=2 ms=5", "a=3 ms=1", "a=4 ms=7"])
    )
    rows = [dict(r[FIELDS]) for r in out.collect()]
    assert [r["ms"] for r in rows] == ["9", "7"]

    dd = compile_spl("* | parse-kv content, ' ', '=' | dedup by a")(
        _events(spark, ["a=x b=1", "a=x b=2", "a=y b=3"])
    )
    vals = sorted(dict(r[FIELDS])["a"] for r in dd.collect())
    assert vals == ["x", "y"]


def test_spl_parse_apsara_verb(spark):
    from loongcollector_spark.operators.base import FIELDS, to_events
    from loongcollector_spark.spl import compile_spl

    line = "[2024-01-05 10:20:30.000123]\t[INFO]\t[42]\t[/a.cpp:7]\tk:v"
    ev = to_events(spark.createDataFrame([(0, line)], ["i", "content"]))
    out = compile_spl("* | parse-apsara content | project-away content")(ev)
    f = dict(out.collect()[0][FIELDS])
    assert f["__LEVEL__"] == "INFO" and f["__THREAD__"] == "42"
    assert f["__FILE__"] == "/a.cpp" and f["__LINE__"] == "7" and f["k"] == "v"
    assert "content" not in f


def test_spl_lookup_verb(spark):
    from loongcollector_spark.operators.base import FIELDS, to_events
    from loongcollector_spark.spl import compile_spl

    dim = spark.createDataFrame(
        [("a", "Alpha", 1), ("b", "Beta", 2)], ["code", "name", "rank"]
    )
    ev = to_events(
        spark.createDataFrame([(0, "a"), (1, "b"), (2, "z")], ["i", "content"])
    )
    ev = compile_spl("* | extend code = content | project code")(ev)
    out = compile_spl(
        "* | lookup dim on code output name", tables={"dim": dim}
    )(ev)
    rows = {dict(r[FIELDS])["code"]: dict(r[FIELDS]) for r in out.collect()}
    assert rows["a"]["name"] == "Alpha" and rows["b"]["name"] == "Beta"
    assert "name" not in rows["z"]  # miss leaves the event untouched

    # default output: all non-key dim columns, stringified
    out2 = compile_spl("* | lookup dim on code", tables={"dim": dim})(ev)
    r = {dict(x[FIELDS])["code"]: dict(x[FIELDS]) for x in out2.collect()}
    assert r["a"]["rank"] == "1"

    import pytest

    with pytest.raises(ValueError, match="unknown lookup table"):
        compile_spl("* | lookup nosuch on code")


def test_spl_lookup_is_broadcast_join(spark):
    from loongcollector_spark.operators.base import to_events
    from loongcollector_spark.spl import compile_spl

    dim = spark.createDataFrame([("a", "x")], ["code", "name"])
    ev = to_events(spark.createDataFrame([(0, "a")], ["i", "content"]))
    ev = compile_spl("* | extend code = content")(ev)
    out = compile_spl("* | lookup dim on code", tables={"dim": dim})(ev)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_spl_pack_fields_verb(spark):
    from loongcollector_spark.operators.base import FIELDS, to_events
    from loongcollector_spark.spl import compile_spl

    ev = to_events(spark.createDataFrame([(0, "x")], ["i", "content"]))
    script = (
        "* | extend a = content | extend b = 'y'"
        " | pack-fields a, b as packed | project-away content"
    )
    out = compile_spl(script)(ev)
    f = dict(out.collect()[0][FIELDS])
    assert f == {"packed": '{"a":"x","b":"y"}'}


def test_spl_expand_values_array(spark):
    script = "* | parse-json content | expand-values tags as tag | project-away content"
    out = compile_spl(script)(
        _events(spark, ['{"id":"1","tags":"[\\"a\\",\\"b\\"]"}', '{"id":"2","tags":"[]"}'])
    )
    rows = sorted(sorted(dict(r[FIELDS]).items()) for r in out.collect())
    # id=1 fans out per element; id=2's empty array drops the event
    assert rows == [
        sorted({"id": "1", "tags": '["a","b"]', "tag": "a"}.items()),
        sorted({"id": "1", "tags": '["a","b"]', "tag": "b"}.items()),
    ]


def test_spl_expand_values_object_and_passthrough(spark):
    script = "* | parse-json content | expand-values v"
    out = compile_spl(script)(
        _events(spark, ['{"v":"{\\"k1\\":\\"x\\",\\"k2\\":\\"y\\"}"}', '{"v":"plain"}', '{"w":"none"}'])
    )
    vals = sorted(r[FIELDS].get("v", "<missing>") for r in out.collect())
    assert vals == ['<missing>', "plain", '{"k1":"x"}', '{"k2":"y"}']


def test_stats_multi_agg_and_bin(spark):
    script = (
        "* | parse-csv content as k, ts, v"
        " | stats count() as n, sum(v) as total, max(v) as peak"
        "   by k, bin(ts, 5m) as w"
    )
    out = compile_spl(script)(
        _events(
            spark,
            [
                "a,1000,1", "a,1100,2",  # window 900
                "a,1300,4",              # window 1200
                "b,1000,8",
            ],
        )
    )
    rows = {(r["k"], r["w"]): (r["n"], r["total"], r["peak"]) for r in out.collect()}
    assert rows == {
        ("a", 900): (2, 3.0, 2.0),
        ("a", 1200): (1, 4.0, 4.0),
        ("b", 900): (1, 8.0, 8.0),
    }


def test_stats_bin_units_and_errors(spark):
    ev = _events(spark, ["a,7200,1"])
    out = compile_spl(
        "* | parse-csv content as k, ts, v | stats count() by bin(ts, 1h)"
    )(ev)
    assert out.collect()[0]["ts"] == 7200  # named after the field by default
    with pytest.raises(ValueError):
        compile_spl("* | stats count() by bin(ts, 0m)")
    with pytest.raises(ValueError):
        compile_spl("* | stats nope(v) by k")
    with pytest.raises(ValueError):
        compile_spl("* | stats count() by bin(ts)")
