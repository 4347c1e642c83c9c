"""service_wineventlog Record.ToEvent conversion
(plugins/input/input_wineventlog/eventlog/eventlog.go:67-163)."""

from __future__ import annotations

import pyspark.sql.functions as F

from loongcollector_spark.operators.wineventlog import (
    WinEventLogConverter,
    compile_event_id_filter,
    pairs_json,
)

SCHEMA = (
    "api string, channel string, provider_name string, provider_guid string, "
    "computer string, record_id long, eventid long, version long, level string, "
    "task string, opcode string, keywords array<string>, message string, "
    "render_err string, process_id long, thread_id long, "
    "user_identifier string, user_name string, user_domain string, user_type string, "
    "event_data array<struct<k:string,v:string>>, "
    "user_data array<struct<k:string,v:string>>, user_data_name string"
)


def _row(**over):
    base = dict(
        api="wineventlog",
        channel="Application",
        provider_name="MyApp",
        provider_guid="{guid-1}",
        computer="host-1",
        record_id=42,
        eventid=4624,
        version=2,
        level="Information",
        task="Logon",
        opcode="Info",
        keywords=["Audit Success"],
        message="line1\r\nline2",
        render_err="",
        process_id=100,
        thread_id=0,
        user_identifier="S-1-5-18",
        user_name="SYSTEM",
        user_domain="",
        user_type="User",
        event_data=[{"k": "TargetUser", "v": "bob"}, {"k": "", "v": "d1"},
                    {"k": "Data", "v": "d2"}],
        user_data=None,
        user_data_name="Op",
    )
    base.update(over)
    return base


def test_to_event_full(spark):
    df = spark.createDataFrame([_row()], SCHEMA)
    f = dict(WinEventLogConverter().apply(df).collect()[0]["fields"])
    assert f["type"] == "wineventlog"
    assert f["log_name"] == "Application"
    assert f["source_name"] == "MyApp"
    assert f["computer_name"] == "host-1"
    assert f["record_number"] == "42"
    assert f["event_id"] == "4624"
    assert f["version"] == "2"
    assert f["keywords"] == "[Audit Success]"
    assert f["message"] == "line1\nline2"
    assert f["process_id"] == "100"
    # zero values dropped: thread_id=0, render_err/user_domain empty
    assert "thread_id" not in f and "message_error" not in f and "user_domain" not in f
    assert f["user_identifier"] == "S-1-5-18" and f["user_name"] == "SYSTEM"
    # addPairs: Data renumbering + sorted-key marshal
    assert f["event_data"] == '{"Data1":"d1","Data2":"d2","TargetUser":"bob"}'
    assert f["user_data"] == '{"xml_name":"Op"}'


def test_to_event_keep_zero_and_no_user(spark):
    df = spark.createDataFrame(
        [_row(user_identifier="", thread_id=0, keywords=None)], SCHEMA
    )
    f = dict(WinEventLogConverter(ignore_zero=False).apply(df).collect()[0]["fields"])
    assert f["thread_id"] == "0" and f["message_error"] == ""
    # user block gated on identifier even with ignore_zero=False
    assert "user_identifier" not in f and "user_name" not in f
    # nil keywords slice renders as zero → kept only via ignore_zero=False...
    # fmt.Sprint(nil []string) is "[]"
    assert f["keywords"] == "[]"


def test_pairs_json_html_escape_and_overwrite(spark):
    df = spark.createDataFrame(
        [([("a", "<x&y>"), ("a", "z"), ("", "v1")],)],
        "p array<struct<k:string,v:string>>",
    )
    out = df.select(pairs_json(F.col("p")).alias("j")).collect()[0]["j"]
    assert out == '{"Data1":"v1","a":"z"}'.replace("<", "\\u003c")  # no-op: no <
    df2 = spark.createDataFrame([([("t", "<b&c>")],)], "p array<struct<k:string,v:string>>")
    out2 = df2.select(pairs_json(F.col("p")).alias("j")).collect()[0]["j"]
    assert out2 == '{"t":"\\u003cb\\u0026c\\u003e"}'


def test_event_id_filter(spark):
    df = spark.createDataFrame([(i,) for i in [10, 4624, 4700, 4735, 4800, 4801]], "e long")
    keep = compile_event_id_filter("4624,4700-4800,-4735", F.col("e"))
    got = sorted(r["e"] for r in df.filter(keep).collect())
    assert got == [4624, 4700, 4800]
    # exclusion-only spec: include everything else
    keep2 = compile_event_id_filter("-4624", F.col("e"))
    got2 = sorted(r["e"] for r in df.filter(keep2).collect())
    assert got2 == [10, 4700, 4735, 4800, 4801]
