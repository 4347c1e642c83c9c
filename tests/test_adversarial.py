"""Adversarial-input sweep: every parser must treat ANY malformed line as a
per-line parse failure — never an ANSI job abort (the ADVICE-r2 bug class:
an unguarded cast/element_at turning one bad input line into a dead job).

Each operator runs over the same nasty batch and must .collect() without
raising; row-level expectations are deliberately loose (drop or keep-raw are
both valid per-operator semantics), the invariant is completion."""

from __future__ import annotations

import pytest

from loongcollector_spark.operators.base import FIELDS, to_events

NASTY = [
    "",
    " ",
    "\t\t\t",
    "a" * 100_000,                                  # 100 KB line
    "9" * 400,                                      # huge bare number
    "foo 1 1e300",                                  # prom ts overflow (ADVICE)
    "foo 1 " + "9" * 25,                            # > 2^63 ns timestamp
    "<999999999999999999999>Jan 99 99:99:99 h t: x",  # syslog pri overflow
    "<34>Feb 30 09:49:23 hostname program: message",  # invalid date
    "m f=1e999 1434055562000000000",                # influx float overflow
    "m f=0x1p4,g=1d,h=NaN,i=Infinity 1",            # Java-isms Go rejects
    "s:1e999|c",                                    # statsd overflow
    '{"a":' * 200 + "1" + "}" * 200,                # deep JSON nesting
    '{"a": "unterminated',                          # broken JSON
    "x\x01y\x01z",                                  # the group separator itself
    "key=\x01|other=2",
    "[2024-01-05 10:20:30.999999999999999999]\t[X]\t[1]",  # apsara frac blowup
    "2262-04-12 00:00:00",                          # > int64 ns epoch as date
    "((((((((((",                                   # regex metachars
    "\\\\\\\\\\",
    '"""""',
    None,                                           # null content
    # java-regex recursion killers (StackOverflowError → dead executor JVM
    # with the naive alternation-under-quantifier regex shapes):
    "m,t=v f=\"" + "x" * 100_000 + "\" 1",          # 100 KB quoted influx value
    "m,t=v f=\"" + "y" * 100_000,                   # …unterminated
    'metric{l="' + "z" * 100_000 + '"} 1 1',        # 100 KB prom label value
    "metric{" + ",".join(f'l{i}="v"' for i in range(2000)) + "} 1",  # label flood
    "<34>1 2003-10-11T22:14:15Z h a - - " + "[]" * 30_000 + " m",    # SD flood
    "C:" + "\\a" * 50_000,                          # WINPATH segment flood
]


@pytest.fixture(scope="module")
def nasty_events(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(NASTY)], "i long, content string"
    )
    return to_events(df).localCheckpoint()


def _survives(df, n_max=None):
    rows = df.collect()
    if n_max is not None:
        assert len(rows) <= n_max
    return rows


def test_regex_parser_survives(nasty_events):
    from loongcollector_spark import flagship
    from loongcollector_spark.operators.common import ParserOptions
    from loongcollector_spark.operators.parse import RegexParser

    _survives(RegexParser(flagship.NGINX_REGEX, flagship.NGINX_KEYS).apply(nasty_events))
    _survives(
        RegexParser(
            flagship.NGINX_REGEX, flagship.NGINX_KEYS, ParserOptions(keep_fail=True)
        ).apply(nasty_events),
        len(NASTY),
    )


def test_grok_parser_survives(nasty_events):
    from loongcollector_spark.operators.parse import GrokParser

    _survives(GrokParser(["%{IP:ip} %{WORD:w} %{NUMBER:n}"]).apply(nasty_events))


def test_json_parsers_survive(nasty_events):
    from loongcollector_spark.operators.parse import JsonExpand, JsonParser

    _survives(JsonParser().apply(nasty_events))
    _survives(JsonExpand().apply(nasty_events))


def test_delimiter_csv_survive(nasty_events):
    from loongcollector_spark.operators.parse import CsvParser, DelimiterParser

    _survives(DelimiterParser("\t", ["a", "b", "c"]).apply(nasty_events))
    _survives(CsvParser(["a", "b", "c"]).apply(nasty_events))


def test_apsara_timestamp_survive(nasty_events):
    from loongcollector_spark.operators.parse import (
        ApsaraParser,
        TimestampParser,
        strptime_to_spark,
    )

    _survives(ApsaraParser().apply(nasty_events))
    _survives(
        TimestampParser(
            source_format=strptime_to_spark("%Y-%m-%d %H:%M:%S")
        ).apply(nasty_events)
    )
    for fmt in ("epoch", "epoch_milli", "epoch_auto"):
        _survives(TimestampParser(source_format=fmt).apply(nasty_events))


def test_prom_text_survives(spark):
    from loongcollector_spark.operators.prom_text import PromTextParser

    # the prom parser reads a top-level content column (scrape-body lines)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(NASTY)], "i long, content string"
    )
    _survives(PromTextParser().apply(df))


def test_syslog_survives(nasty_events):
    from loongcollector_spark.operators.syslog import SyslogParser

    _survives(SyslogParser(mode="auto").apply(nasty_events), len(NASTY))
    _survives(
        SyslogParser(mode="auto", ignore_parse_failure=False).apply(nasty_events)
    )


def test_influx_survives_and_rejects_go_invalid_floats(nasty_events, spark):
    from loongcollector_spark.operators.influx import InfluxDecoder

    _survives(InfluxDecoder(fields_extend=True).apply(nasty_events))
    # 1e999 → strconv ErrRange in Go → point rejected; 0x1p4/1d/NaN/Infinity
    # are Java-isms the Go scanner never produces — all must be dropped
    df = to_events(spark.createDataFrame(
        [(0, "m f=1e999,g=0x1p4,h=1d,i=NaN,j=Infinity,ok=2.5 1")],
        "i long, content string",
    ))
    rows = InfluxDecoder(fields_extend=True).apply(df).collect()
    assert [(r["__field__"], r["__value__"]) for r in rows] == [("ok", "2.5")]


def test_statsd_survives_and_rejects_overflow(nasty_events, spark):
    from loongcollector_spark.operators.statsd import StatsdDecoder

    _survives(StatsdDecoder().apply(nasty_events))
    df = to_events(spark.createDataFrame(
        [(0, "a:1e999|c"), (1, "b:2|c")], "i long, content string"
    ))
    rows = StatsdDecoder().apply(df).collect()
    assert [r["__name__"] for r in rows] == ["b"]


def test_kv_splitter_survives(nasty_events):
    from loongcollector_spark.operators.transforms import KeyValueSplitter

    _survives(KeyValueSplitter(delimiter="|", separator="=").apply(nasty_events))


def test_container_log_survives(nasty_events):
    from loongcollector_spark.operators.parse import ContainerLogParser

    _survives(ContainerLogParser().apply(nasty_events))


def test_gotime_survives(nasty_events):
    from loongcollector_spark.operators.transforms import GoTime

    for fmt in ("2006-01-02 15:04:05", "seconds", "milliseconds",
                "microseconds", "nanoseconds"):
        _survives(
            GoTime(source_key="content", source_format=fmt,
                   dest_key="t", dest_format="2006-01-02 15:04:05").apply(
                nasty_events
            ),
            len(NASTY),
        )


def test_otel_log_parser_survives(nasty_events, spark):
    from loongcollector_spark.operators.otel import OtelLogParser

    _survives(OtelLogParser().apply(nasty_events))
    # overflowing / negative / enum-garbage record fields must not abort
    import json as _json

    hostile = [
        {"timeUnixNano": "9" * 30, "severityNumber": "NOT_AN_ENUM",
         "body": {"stringValue": "x"}},
        {"timeUnixNano": "-5", "severityNumber": "99999999999999999999",
         "body": {"intValue": "9" * 40}},
        {"severityNumber": 13},  # no body, no time
    ]
    payload = _json.dumps({"resourceLogs": [{"scopeLogs": [{"logRecords": hostile}]}]})
    df = to_events(spark.createDataFrame([(0, payload)], "i long, content string"))
    rows = OtelLogParser().apply(df).collect()
    assert len(rows) == 3  # every record survives as a row, none kill the job


def test_prom_rw_decoder_survives_garbage_bytes(spark):
    from loongcollector_spark.operators.prom_rw import PromRemoteWriteDecoder

    garbage = [
        b"", b"\x00", b"\xff" * 64, bytes(range(256)),
        b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01",  # 70-bit varint preamble
        b"\x05\xfc" + b"x" * 3,  # copy before any output
        None,  # NULL payload column (ADVICE r3: fail the line, never the job)
    ]
    df = spark.createDataFrame(
        [(i, bytearray(g) if g is not None else None) for i, g in enumerate(garbage)],
        "i long, payload binary",
    )
    out = PromRemoteWriteDecoder("payload", ["i"]).apply(df)
    assert out.count() == 0  # every payload rejected, no exception


def test_sls_group_decoder_survives_garbage_bytes(spark):
    from loongcollector_spark.operators.pb import ParseSlsLogGroup

    garbage = [b"", b"\x0a", b"\xff\xff\xff\xff", b"\x0a\x02\x08", None]
    df = spark.createDataFrame(
        [(i, bytearray(g) if g is not None else None) for i, g in enumerate(garbage)],
        "i long, payload binary",
    )
    assert ParseSlsLogGroup("payload", ["i"]).apply(df).count() == 0


def test_pprof_decoder_survives_garbage_bytes(spark):
    from loongcollector_spark.operators.pprof_profile import PprofProfileParser

    garbage = [
        b"", b"\x00", b"\xff" * 64, bytes(range(256)),
        b"\x1f\x8b" + b"\x00" * 10,                    # gzip magic, broken stream
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x04\xff",   # truncated gzip
        b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01",  # oversized varint
        b"\x0a\xff\xff\xff\x7f",                       # 256MB length claim
        None,
    ]
    df = spark.createDataFrame(
        [(i, bytearray(g) if g is not None else None) for i, g in enumerate(garbage)],
        "i long, payload binary",
    )
    out = PprofProfileParser(passthrough=["i"]).apply(df)
    assert out.count() == 0  # every payload rejected, no exception


def test_jfr_parser_survives_garbage_labels_pb(spark):
    from loongcollector_spark.operators.jfr import _EVENT_T, JfrChunkParser

    ev = [("execution_sample", 1, "STATE_RUNNABLE", None, None, None, None, None,
           [("A", "m")])]
    garbage_pb = [b"\xff\xff\xff\xff", b"\x0a\xff\x7f", b"\x80" * 12]
    rows = [(i, ev, bytearray(g)) for i, g in enumerate(garbage_pb)]
    rows.append((99, None, None))  # null events row
    df = spark.createDataFrame(rows, f"i long, events {_EVENT_T}, labels_pb binary")
    out = JfrChunkParser(passthrough=["i"]).apply(df)
    # bad labels snapshots drop their chunk; null events row dropped
    assert out.count() == 0
