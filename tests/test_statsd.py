"""StatsD decoder tests (pkg/protocol/decoder/statsd/decoder.go:44-64 over the
public dogstatsd grammar)."""

from __future__ import annotations

from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.statsd import StatsdDecoder


def _events(spark, lines):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(lines)], ["i", "content"])
    return to_events(df)


def test_statsd_basic(spark):
    lines = [
        "page.views:1|c",
        "fuel.level:0.5|g",
        "song.length:240|h|@0.5",
        "users.online:123|c|@0.5|#country:china,region:east",
        "not a statsd line",
        "",
    ]
    out = StatsdDecoder(default_ts_ns=1700000000000000000).apply(_events(spark, lines))
    rows = {r["__name__"]: r.asDict() for r in out.collect()}
    assert len(rows) == 4  # malformed + blank dropped
    assert rows["page.views"]["__value__"] == "1"
    assert rows["page.views"]["__labels__"] == ""
    assert rows["fuel.level"]["__value__"] == "0.5"
    assert rows["song.length"]["__value__"] == "240"  # integral → %g "240"
    assert rows["users.online"]["__value__"] == "123"
    assert rows["users.online"]["__labels__"] == "country#$#china|region#$#east"
    assert rows["users.online"]["__time_nano__"] == "1700000000000000000"


def test_statsd_tag_sort_and_negative_gauge(spark):
    out = StatsdDecoder().apply(
        _events(spark, ["t.metric:-3.5|g|#zz:1,aa:2", "s.set:abc|s"])
    )
    rows = {r["__name__"]: r.asDict() for r in out.collect()}
    # non-float set value dropped (the reference would panic on the
    # float64 assertion; we drop the line)
    assert list(rows) == ["t.metric"]
    assert rows["t.metric"]["__value__"] == "-3.5"
    assert rows["t.metric"]["__labels__"] == "aa#$#2|zz#$#1"
