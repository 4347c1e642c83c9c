"""Golden case ported verbatim from ProcessorParseJsonNativeUnittest (typed
scalar stringification, lines 940-990): double 3.14159 stringifies to
"3.141590" (C++ std::to_string), int/bool/null per RapidjsonValueToString."""

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.common import ParserOptions
from loongcollector_spark.operators.parse import JsonParser, JsonParserArrow

LINE = (
    '{"string_field":"hello world","int_field":42,"float_field":3.14159,'
    '"bool_true":true,"bool_false":false,"null_field":null,'
    '"negative_int":-100,"zero":0}'
)

EXPECT = {
    "bool_false": "false",
    "bool_true": "true",
    "float_field": "3.141590",
    "int_field": "42",
    "negative_int": "-100",
    "null_field": "",
    "rawLog": LINE,
    "string_field": "hello world",
    "zero": "0",
}


def _events(spark, contents):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], ["i", "content"])
    return to_events(df)


def test_json_arrow_reference_golden(spark):
    opts = ParserOptions(keep_succeed=True, keep_fail=True, renamed_source_key="rawLog")
    out = JsonParserArrow(opts).apply(_events(spark, [LINE]))
    assert dict(out.collect()[0][FIELDS]) == EXPECT


def test_json_jvm_matches_except_double_format(spark):
    opts = ParserOptions(keep_succeed=True, keep_fail=True, renamed_source_key="rawLog")
    got = dict(JsonParser(opts).apply(_events(spark, [LINE])).collect()[0][FIELDS])
    # Jackson emits canonical double text — the ONE documented divergence
    assert got.pop("float_field") == "3.14159"
    expect = dict(EXPECT)
    expect.pop("float_field")
    assert got == expect


def test_json_arrow_nested_compact(spark):
    out = JsonParserArrow().apply(_events(spark, ['{"a":{"b":[1,2]},"c":1}']))
    f = dict(out.collect()[0][FIELDS])
    assert f == {"a": '{"b":[1,2]}', "c": "1"}


def test_json_arrow_drop_on_fail(spark):
    out = JsonParserArrow().apply(_events(spark, ["not json", '{"k":1}']))
    rows = out.collect()
    assert len(rows) == 1 and dict(rows[0][FIELDS]) == {"k": "1"}


def test_json_edge_inputs_both_paths(spark):
    """ProcessorParseJsonNativeUnittest edge matrix: top-level array /
    primitive / empty string fail (source kept); {} succeeds empty; unicode
    escapes decode; 64-bit ints keep exact digits."""
    import json as _json

    from loongcollector_spark.operators.common import ParserOptions
    from loongcollector_spark.operators.parse import JsonParser, JsonParserArrow

    cases = [
        (0, "[1,2,3]", None),              # array → fail
        (1, "12345", None),                # primitive → fail
        (2, "", None),                     # empty string → fail
        (3, "{}", {}),                     # empty object → success, no fields
        (4, '{"u":"\\u4f60\\u597d"}', {"u": "你好"}),
        (5, '{"big":9223372036854775807}', {"big": "9223372036854775807"}),
        (6, '{"chinese":"你好世界","mixed":"Hello 世界"}',
         {"chinese": "你好世界", "mixed": "Hello 世界"}),
    ]
    opts = ParserOptions(keep_fail=True)
    for parser in (JsonParser(opts), JsonParserArrow(opts)):
        out = parser.apply(_events(spark, [c for _, c, _ in cases]))
        got = {r["i"]: dict(r[FIELDS]) for r in out.collect()}
        name = type(parser).__name__
        for i, raw, expect in cases:
            f = dict(got[i])
            if expect is None:
                assert f == {"content": raw}, (name, i, f)
            else:
                exp = dict(expect)
                assert f == exp, (name, i, f, exp)
