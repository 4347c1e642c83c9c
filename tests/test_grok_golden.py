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


def test_default_library_covers_reference_full_set(spark):
    """Every pattern name in the reference's
    processor_grok_default_patterns.go exists here, expands, compiles in
    python re, AND compiles in Java (exercised via one rlike per pattern)."""
    import re as _re

    import pyspark.sql.functions as F

    from loongcollector_spark.operators.grok_patterns import DEFAULT_PATTERNS
    from loongcollector_spark.operators.parse import expand_grok

    ref_names = [
        "USERNAME", "USER", "EMAILLOCALPART", "EMAILADDRESS", "HTTPDUSER",
        "INT", "BASE10NUM", "NUMBER", "BASE16NUM", "BASE16FLOAT", "POSINT",
        "NONNEGINT", "WORD", "NOTSPACE", "SPACE", "DATA", "GREEDYDATA",
        "QUOTEDSTRING", "UUID", "URN", "MAC", "CISCOMAC", "WINDOWSMAC",
        "COMMONMAC", "IPV6", "IPV4", "IP", "HOSTNAME", "HOST", "IPORHOST",
        "HOSTPORT", "PATH", "UNIXPATH", "TTY", "WINPATH", "URIPROTO",
        "URIHOST", "URIPATH", "URIPARAM", "URIPATHPARAM", "URI", "MONTH",
        "MONTHNUM", "MONTHNUM2", "MONTHDAY", "DAY", "YEAR", "HOUR", "MINUTE",
        "SECOND", "TIME", "DATE_US", "DATE_EU", "ISO8601_TIMEZONE",
        "ISO8601_SECOND", "TIMESTAMP_ISO8601", "DATE", "DATESTAMP", "TZ",
        "DATESTAMP_RFC822", "DATESTAMP_RFC2822", "DATESTAMP_OTHER",
        "DATESTAMP_EVENTLOG", "HTTPDERROR_DATE", "SYSLOGTIMESTAMP", "PROG",
        "SYSLOGPROG", "SYSLOGHOST", "SYSLOGFACILITY", "HTTPDATE", "QS",
        "SYSLOGBASE", "COMMONAPACHELOG", "COMBINEDAPACHELOG",
        "HTTPD20_ERRORLOG", "HTTPD24_ERRORLOG", "HTTPD_ERRORLOG", "LOGLEVEL",
    ]
    missing = [n for n in ref_names if n not in DEFAULT_PATTERNS]
    assert not missing, missing
    cols = []
    for i, n in enumerate(ref_names):
        rx = expand_grok("%{" + n + "}")
        _re.compile(rx)  # python re accepts
        anon = _re.sub(r"\(\?P<\w+>", "(", rx)
        cols.append(F.lit("x").rlike(anon).alias(f"p{i}"))
    # Java accepts all 78 expanded anonymous regexes in one projection
    spark.range(1).select(*cols).collect()


def test_grok_multi_pattern_reference_golden(spark):
    """processor_grok_test.go TestProcessorGrokParse multi-pattern golden:
    custom HTTP pattern + two fallbacks over four records."""
    from loongcollector_spark.operators.parse import GrokParser

    logs = [
        "begin 123.456 end",
        '2019 June 24 "I am iron man"',
        "WRONG LOG",
        "10.0.0.0 GET /index.html 15824 0.043",
    ]
    g = GrokParser(
        match=[
            "%{HTTP}",
            "%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}",
            "%{YEAR:year} %{MONTH:month} %{MONTHDAY:day} %{QUOTEDSTRING:motto}",
        ],
        custom_patterns={
            "HTTP": "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes} %{NUMBER:duration}"
        },
    )
    out = _fields(g.apply(_events(spark, logs)))
    assert out[0] == {"word1": "begin", "request_time": "123.456", "word2": "end"}
    assert out[1] == {
        "year": "2019", "month": "June", "day": "24", "motto": '"I am iron man"'
    }
    assert out[2] == {"content": "WRONG LOG"}  # no match, kept untouched
    assert out[3] == {
        "client": "10.0.0.0", "method": "GET", "request": "/index.html",
        "bytes": "15824", "duration": "0.043",
    }


def test_grok_custom_pattern_dir(spark, tmp_path):
    """CustomPatternDir loading (processor_grok.go:196-227): NAME<space>rx
    lines, '\"'-comments skipped, dir < CustomPatterns precedence."""
    from loongcollector_spark.operators.parse import GrokParser

    pf = tmp_path / "patterns"
    pf.mkdir()
    (pf / "extra").write_text(
        '" a comment line\n'
        "APPID app-[0-9]{4}\n"
        "OVERRIDEME original-[a-z]+\n"
    )
    g = GrokParser(
        match=["%{APPID:app} %{OVERRIDEME:o}"],
        custom_pattern_dirs=[str(pf)],
        custom_patterns={"OVERRIDEME": "patched-[a-z]+"},
    )
    out = _fields(g.apply(_events(spark, ["app-1234 patched-x"])))
    assert out[0] == {"app": "app-1234", "o": "patched-x"}


def test_grok_semantic_name_containing_dup_not_merged(spark):
    """A semantic name merely CONTAINING '__dup' (e.g. a__dupe) is not a
    generated rename and must stay a distinct output field."""
    out = GrokParser(
        ["%{WORD:a} %{WORD:a__dupe}"],
    ).apply(_events(spark, ["hello world"]))
    f = _fields(out)[0]
    assert f["a"] == "hello" and f["a__dupe"] == "world"
