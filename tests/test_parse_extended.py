"""ApsaraParser / CsvParser / JsonExpand / ContainerLogParser golden cases
(modeled on core/unittest/processor/ProcessorParseApsaraNativeUnittest,
plugins/processor/csv/processor_csv_test.go, processor_json tests,
ProcessorParseContainerLogNativeUnittest)."""

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.parse import (
    ApsaraParser,
    ContainerLogParser,
    CsvParser,
    JsonExpand,
)


def _events(spark, contents):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], ["i", "content"])
    return to_events(df)


def _fields(df):
    return {r["i"]: dict(r[FIELDS]) for r in df.collect()}


# --- apsara -----------------------------------------------------------------


def test_apsara_basic(spark):
    line = "[2024-01-05 10:20:30.123456]\t[ERROR]\t[12345]\t[/build/core/app.cpp:120]\tmethod:GET\tstatus:200"
    out = ApsaraParser().apply(_events(spark, [line]))
    f = _fields(out)[0]
    assert f["__LEVEL__"] == "ERROR"
    assert f["__THREAD__"] == "12345"
    assert f["__FILE__"] == "/build/core/app.cpp"
    assert f["__LINE__"] == "120"
    assert f["method"] == "GET"
    assert f["status"] == "200"
    assert f["microtime"] == "1704450030123456"


def test_apsara_no_kv_tail(spark):
    line = "[2024-01-05 10:20:30.000001]\t[INFO]\t[1]\t[a.cpp:1]"
    f = _fields(ApsaraParser().apply(_events(spark, [line])))[0]
    assert f["__LEVEL__"] == "INFO"
    assert "method" not in f


def test_apsara_reference_golden_unbracketed_file(spark):
    """ProcessorParseApsaraNativeUnittest golden (lines 438-475): unbracketed
    file:line falls through to the k:v tail; fraction .1 → 100000 µs."""
    line = (
        "[2023-09-04 13:15:50.1]\t[ERROR]\t[1]\t/ilogtail/AppConfigBase.cpp:1"
        "\t\tAppConfigBase AppConfigBase:1"
    )
    f = _fields(ApsaraParser().apply(_events(spark, [line])))[0]
    assert f == {
        "/ilogtail/AppConfigBase.cpp": "1",
        "AppConfigBase AppConfigBase": "1",
        "__LEVEL__": "ERROR",
        "__THREAD__": "1",
        "microtime": "1693833350100000",
    }


def test_apsara_unmatched_discarded(spark):
    out = ApsaraParser().apply(_events(spark, ["not apsara at all"]))
    assert out.count() == 0


# --- csv --------------------------------------------------------------------


def test_csv_quoted_field(spark):
    f = _fields(
        CsvParser(["a", "b", "c"]).apply(_events(spark, ['1,"x, y",3']))
    )[0]
    assert f == {"a": "1", "b": "x, y", "c": "3"}


def test_csv_expand_others(spark):
    f = _fields(
        CsvParser(["a"], expand_others=True, expand_prefix="ex_").apply(
            _events(spark, ["1,2,3"])
        )
    )[0]
    assert f == {"a": "1", "ex_1": "2", "ex_2": "3"}


def test_csv_preserve_others_requotes(spark):
    f = _fields(
        CsvParser(["a"], preserve_others=True).apply(_events(spark, ['1,"x, y",3']))
    )[0]
    assert f == {"a": "1", "_decode_preserve_": '"x, y",3'}


def test_csv_short_row(spark):
    f = _fields(CsvParser(["a", "b", "c"]).apply(_events(spark, ["1,2"])))[0]
    assert f == {"a": "1", "b": "2"}


def test_delimiter_overflow_extend_reference_golden(spark):
    """Exact golden from ProcessorParseDelimiterNativeUnittest
    TestOverflowedFieldsTreatment: '123@@456@@1@@2@@3' with keys a,b,c →
    extras named __column3__/__column4__ (0-based column index)."""
    from loongcollector_spark.operators.parse import DelimiterParser

    f = _fields(
        DelimiterParser("@@", ["a", "b", "c"]).apply(
            _events(spark, ["123@@456@@1@@2@@3"])
        )
    )[0]
    assert f == {"a": "123", "b": "456", "c": "1", "__column3__": "2", "__column4__": "3"}


def test_delimiter_discard_partial_fields(spark):
    """DISCARD overflow + ExtractingPartialFields: keys named '_' skipped,
    extra columns dropped (ProcessorParseDelimiterNative.cpp:328-331)."""
    from loongcollector_spark.operators.parse import DelimiterParser, OverflowTreatment

    f = _fields(
        DelimiterParser(
            "@@", ["a", "_", "c"], overflow=OverflowTreatment.DISCARD
        ).apply(_events(spark, ["123@@456@@1@@2@@3"]))
    )[0]
    assert f == {"a": "123", "c": "1"}


# --- json expand ------------------------------------------------------------


def test_json_expand_depth_unlimited(spark):
    line = '{"a":{"b":1,"c":{"d":"x"}},"e":"y"}'
    f = _fields(JsonExpand().apply(_events(spark, [line])))[0]
    assert f == {"a_b": "1", "a_c_d": "x", "e": "y"}


def test_json_expand_depth_2(spark):
    line = '{"a":{"b":1,"c":{"d":"x"}},"e":"y"}'
    f = _fields(JsonExpand(expand_depth=2).apply(_events(spark, [line])))[0]
    assert f["a_b"] == "1"
    assert f["e"] == "y"
    # depth 2 stops: a_c keeps the nested JSON text
    assert f["a_c"] == '{"d":"x"}'


def test_json_expand_source_key_prefix(spark):
    f = _fields(
        JsonExpand(use_source_key_as_prefix=True, prefix="p.").apply(
            _events(spark, ['{"k":"v"}'])
        )
    )[0]
    assert f == {"p.content_k": "v"}


def test_json_expand_array_kept_as_text(spark):
    f = _fields(JsonExpand().apply(_events(spark, ['{"arr":[1,2],"s":"x"}'])))[0]
    assert f["arr"] == "[1,2]"
    assert f["s"] == "x"


# --- container log ----------------------------------------------------------


def test_containerd_text(spark):
    line = "2024-01-05T10:20:30.123Z stdout F hello world"
    f = _fields(ContainerLogParser().apply(_events(spark, [line])))[0]
    assert f == {
        "_time_": "2024-01-05T10:20:30.123Z",
        "_source_": "stdout",
        "_part_": "F",
        "content": "hello world",
    }


def test_containerd_partial_flag(spark):
    line = "2024-01-05T10:20:30.123Z stderr P partial chunk"
    f = _fields(ContainerLogParser().apply(_events(spark, [line])))[0]
    assert f["_part_"] == "P"
    assert f["_source_"] == "stderr"


def test_docker_json(spark):
    line = '{"log":"hello\\n","stream":"stdout","time":"2024-01-05T10:20:30.1Z"}'
    f = _fields(ContainerLogParser(mode="docker-json").apply(_events(spark, [line])))[0]
    assert f == {
        "_time_": "2024-01-05T10:20:30.1Z",
        "_source_": "stdout",
        "content": "hello",
    }


def test_container_ignoring_stdout(spark):
    lines = [
        "2024-01-05T10:20:30Z stdout F a",
        "2024-01-05T10:20:30Z stderr F b",
    ]
    out = ContainerLogParser(ignoring_stdout=True).apply(_events(spark, lines))
    f = [dict(r[FIELDS]) for r in out.collect()]
    assert len(f) == 1 and f[0]["content"] == "b"


def test_delimiter_quote_reference_golden(spark):
    """TestProcessQuote golden (ProcessorParseDelimiterNativeUnittest:1500-1538):
    single-quote-wrapped space-separated values, one value containing embedded
    newlines."""
    from loongcollector_spark.operators.parse import DelimiterParser

    line = (
        "'-' 'file0' '947113' '192.168.0.3' '2024-08-15T15:25:24.195264681' 'PUT\n"
        "/dir/resource.txt\nHTTP/2.0' '200' '154' 'go-sdk'"
    )
    keys = [str(i) for i in range(1, 10)]
    out = DelimiterParser(" ", keys, quote="'").apply(_events(spark, [line]))
    f = _fields(out)[0]
    assert f == {
        "1": "-",
        "2": "file0",
        "3": "947113",
        "4": "192.168.0.3",
        "5": "2024-08-15T15:25:24.195264681",
        "6": "PUT\n/dir/resource.txt\nHTTP/2.0",
        "7": "200",
        "8": "154",
        "9": "go-sdk",
    }


def test_containerd_flag_edge_cases(spark):
    """TestContainerdLog goldens: '... stdout P' (no trailing space) → the P
    is CONTENT, not a flag; '... stdout ' → empty content; '... stdout'
    (no space) and '...stdout' (fused) → parse fail."""
    ts = "2024-01-05T23:28:06.818486411+08:00"
    lines = [
        f"{ts} stdout P ",      # flag P, empty content
        f"{ts} stdout P",       # no flag delimiter → content 'P'
        f"{ts} stdout ",        # no flag, empty content
        f"{ts} stdout",         # FAIL: no space after stream
        f"{ts}stdout",          # FAIL: fused
    ]
    out = ContainerLogParser().apply(_events(spark, lines))
    f = _fields(out)
    assert f[0]["_part_"] == "P" and f[0]["content"] == ""
    assert f[1]["_part_"] == "F" and f[1]["content"] == "P"
    assert f[2]["_part_"] == "F" and f[2]["content"] == ""
    assert 3 not in f and 4 not in f


def test_csv_malformed_quote_keeps_source(spark):
    """Go csv errors (ErrQuote / ErrBareQuote / unterminated quote) fail the
    decode and the source key is KEPT (processor_csv.go:72-80,132)."""
    bad = ['a,"b,c', '"a"x,b,c', 'a"b,c,d']
    out = CsvParser(["a", "b", "c"]).apply(_events(spark, bad))
    fs = _fields(out)
    for i in range(len(bad)):
        assert fs[i] == {"content": bad[i]}, fs[i]


def test_csv_empty_fields_are_valid(spark):
    """',,' decodes to three EMPTY fields, not a short row
    (processor_csv.go:81-85 'Empty value should also be considered as a
    valid field')."""
    fs = _fields(CsvParser(["a", "b", "c"]).apply(_events(spark, [",,", ""])))
    assert fs[0] == {"a": "", "b": "", "c": ""}
    # empty input decodes to one empty field -> only the first key
    assert fs[1] == {"a": ""}


def test_csv_empty_mid_extra_field_position(spark):
    """An empty field among the extras must not shift later extras
    (null-filtering the from_csv padding used to collapse positions)."""
    fs = _fields(
        CsvParser(["a"], expand_others=True, expand_prefix="ex_").apply(
            _events(spark, ["1,,3"])
        )
    )
    assert fs[0] == {"a": "1", "ex_1": "", "ex_2": "3"}


def test_csv_reference_goldens_batch(spark):
    """processor_csv_test.go 'without preserving others' goldens: blank-only
    record is ONE valid field, quoted fields with doubled quotes, short rows,
    extra fields silently dropped."""
    cases = [
        ("", {"f1": ""}),
        ("  ", {"f1": "  "}),
        ("12", {"f1": "12"}),
        ("12,34,56", {"f1": "12", "f2": "34", "f3": "56"}),
        ('"normal","""quote""",","', {"f1": "normal", "f2": '"quote"', "f3": ","}),
        ("12,34", {"f1": "12", "f2": "34"}),
        ("12,34,56,78,90", {"f1": "12", "f2": "34", "f3": "56"}),
    ]
    out = CsvParser(["f1", "f2", "f3"]).apply(
        _events(spark, [c for c, _ in cases])
    )
    fs = _fields(out)
    for i, (_, expect) in enumerate(cases):
        assert fs[i] == expect, (i, fs[i], expect)


def test_csv_quoted_json_golden(spark):
    """processor_csv_test.go embedded-JSON golden: a fully-quoted field with
    doubled quotes and embedded commas/braces decodes verbatim."""
    rec = '"  words{""a"":123,""b"":""string"",""c"":[1,2,3],""d"":{""e"":""string""}}  ",x'
    fs = _fields(CsvParser(["j", "k"]).apply(_events(spark, [rec])))
    assert fs[0]["j"] == '  words{"a":123,"b":"string","c":[1,2,3],"d":{"e":"string"}}  '
    assert fs[0]["k"] == "x"
