"""Flusher protocol-converter tests.

Goldens from pkg/protocol/converter tests: custom_single_log_test.go:29-120
(file/host + docker logGroups), converter_single_log_flatten_test.go,
jsonline_test.go, influxdb_metric_test.go:37-65 and
converter_sls_metric_test.go:85-135 (readNames — NOTE the stream test's
"metric:field"→"metric" golden at influxdb_metric_test.go:64 contradicts
readNames and its own unit test; the code/unit-test behavior is
implemented), converter_raw_test.go.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.convert import (
    CustomSingleConverter,
    InfluxMetricSerializer,
    influx_group_stream,
    jsonline_stream,
    parse_sls_labels,
    raw_group_stream,
)

GROUP = dict(
    group_tags={"__hostname__": "alje834hgf", "__pack_id__": "AEDCFGHNJUIOPLMN-1E"},
    source="172.10.0.56",
    topic="file",
)


def _file_events(spark):
    """custom_single_log_test.go:36-61 — file + host environment logGroup."""
    rows = [
        (1662434209, "PUT", "200"),
        (1662434487, "GET", "404"),
    ]
    df = spark.createDataFrame(rows, ["log_time_sec", "method", "status"])
    return df.select(
        "log_time_sec",
        F.create_map(
            F.lit("method"), F.col("method"),
            F.lit("status"), F.col("status"),
            F.lit("__tag__:__path__"), F.lit("/root/test/origin/example.log"),
            F.lit("__log_topic__"), F.lit("file"),
        ).alias("fields"),
    )


def _docker_events(spark):
    """custom_single_log_test.go:87-113 — docker-environment contents."""
    df = spark.createDataFrame([(1662434209, "PUT", "200")], ["log_time_sec", "method", "status"])
    return df.select(
        "log_time_sec",
        F.create_map(
            F.lit("method"), F.col("method"),
            F.lit("status"), F.col("status"),
            F.lit("__tag__:__user_defined_id__"), F.lit("machine"),
            F.lit("__tag__:__path__"), F.lit("/root/test/origin/example.log"),
            F.lit("__tag__:_container_name_"), F.lit("container"),
            F.lit("__tag__:_container_ip_"), F.lit("172.10.0.45"),
            F.lit("__tag__:_image_name_"), F.lit("image"),
            F.lit("__log_topic__"), F.lit("file"),
        ).alias("fields"),
    )


def test_custom_single_file_env(spark):
    out = CustomSingleConverter(**GROUP).apply(_file_events(spark)).collect()
    got = json.loads(out[0]["serialized"])
    assert set(got) == {"time", "contents", "tags"}
    assert got["time"] == 1662434209
    assert got["contents"] == {"method": "PUT", "status": "200"}
    assert got["tags"] == {
        "log.file.path": "/root/test/origin/example.log",
        "host.name": "alje834hgf",
        "host.ip": "172.10.0.56",
        "log.topic": "file",
    }
    # Go json.Marshal renders map keys sorted — assert the exact byte form.
    assert out[0]["serialized"] == (
        '{"contents":{"method":"PUT","status":"200"},'
        '"tags":{"host.ip":"172.10.0.56","host.name":"alje834hgf",'
        '"log.file.path":"/root/test/origin/example.log","log.topic":"file"},'
        '"time":1662434209}'
    )
    assert json.loads(out[1]["serialized"])["time"] == 1662434487


def test_custom_single_docker_env_and_k8s(spark):
    got = json.loads(
        CustomSingleConverter(**GROUP).apply(_docker_events(spark)).collect()[0]["serialized"]
    )
    # __tag__:__user_defined_id__ dropped; container tags get docker names.
    assert got["tags"]["container.name"] == "container"
    assert got["tags"]["container.ip"] == "172.10.0.45"
    assert got["tags"]["container.image.name"] == "image"
    assert "machine" not in json.dumps(got)

    got = json.loads(
        CustomSingleConverter(k8s=True, **GROUP)
        .apply(_docker_events(spark))
        .collect()[0]["serialized"]
    )
    assert got["tags"]["k8s.container.name"] == "container"
    assert got["tags"]["k8s.container.ip"] == "172.10.0.45"
    assert got["tags"]["k8s.container.image.name"] == "image"


def test_tag_key_rename_and_drop(spark):
    conv = CustomSingleConverter(
        tag_key_rename={"host.name": "hostname", "log.file.path": ""}, **GROUP
    )
    got = json.loads(conv.apply(_file_events(spark)).collect()[0]["serialized"])
    assert got["tags"]["hostname"] == "alje834hgf"
    assert "host.name" not in got["tags"]
    # rename-to-empty drops the tag (converter.go:309-315 addTagIfRequired)
    assert "log.file.path" not in got["tags"]


def test_protocol_key_rename(spark):
    conv = CustomSingleConverter(protocol_key_rename={"time": "@timestamp"}, **GROUP)
    s = conv.apply(_file_events(spark)).collect()[0]["serialized"]
    got = json.loads(s)
    assert set(got) == {"@timestamp", "contents", "tags"}
    # "@" sorts before letters — envelope keys re-sorted after rename
    assert s.startswith('{"@timestamp":1662434209,')


def test_flatten_and_only_contents(spark):
    got = json.loads(
        CustomSingleConverter(flatten=True, **GROUP)
        .apply(_file_events(spark))
        .collect()[0]["serialized"]
    )
    assert got == {
        "method": "PUT",
        "status": "200",
        "log.file.path": "/root/test/origin/example.log",
        "host.name": "alje834hgf",
        "host.ip": "172.10.0.56",
        "log.topic": "file",
        "time": 1662434209,
    }
    got = json.loads(
        CustomSingleConverter(flatten=True, only_contents=True, **GROUP)
        .apply(_file_events(spark))
        .collect()[0]["serialized"]
    )
    assert got == {"method": "PUT", "status": "200", "time": 1662434209}


def test_flatten_time_key_overwrites_content(spark):
    df = spark.createDataFrame([(7, "x")], ["log_time_sec", "v"]).select(
        "log_time_sec", F.create_map(F.lit("time"), F.col("v")).alias("fields")
    )
    got = json.loads(
        CustomSingleConverter(flatten=True, source="s").apply(df).collect()[0]["serialized"]
    )
    assert got["time"] == 7  # the envelope time wins over a "time" content


def test_json_escaping_matches_go(spark):
    df = spark.createDataFrame([(1, 'a"b\\c\nd<&>')], ["log_time_sec", "v"]).select(
        "log_time_sec", F.create_map(F.lit("k"), F.col("v")).alias("fields")
    )
    s = CustomSingleConverter(source="s").apply(df).collect()[0]["serialized"]
    # Go marshals with SetEscapeHTML(false): <, &, > stay literal
    assert '"k":"a\\"b\\\\c\\nd<&>"' in s
    assert json.loads(s)["contents"]["k"] == 'a"b\\c\nd<&>'


def test_jsonline_stream(spark):
    df = to_events(
        spark.createDataFrame(
            [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")], ["g", "seq", "content"]
        )
    ).withColumn("log_time_sec", F.lit(1))
    lined = CustomSingleConverter(flatten=True, only_contents=True).apply(df)
    rows = {r["g"]: r["stream"] for r in jsonline_stream(lined, ["g"], "seq").collect()}
    assert rows[1] == '{"content":"a","time":1}\n{"content":"b","time":1}'
    assert rows[2] == '{"content":"c","time":1}'


# ---------------------------------------------------------------------------
# influxdb serializer
# ---------------------------------------------------------------------------

_MSCHEMA = (
    "i int, `__name__` string, `__labels__` string, `__value__` string, "
    "`__time_nano__` string, `__type__` string, `__field__` string"
)


def _metric_df(spark, rows):
    return spark.createDataFrame(rows, _MSCHEMA)


def test_influx_stream_golden(spark):
    """influxdb_metric_test.go:37-65 structure (the __field__-less names keep
    the ':' per readNames' own unit test)."""
    rows = [
        (0, "metric", "", "1", None, None, None),
        (1, "metric", "aa#$#bb", "1", None, None, None),
        (2, "metric", None, "1", "1667615389000000000", None, None),
    ]
    out = InfluxMetricSerializer().apply(_metric_df(spark, rows))
    lines = [r["line"] for r in out.orderBy("i").collect()]
    assert lines == [
        "metric value=1",
        "metric,aa=bb value=1",
        "metric value=1 1667615389000000000",
    ]
    stream = influx_group_stream(out.withColumn("g", F.lit(1)), ["g"], "i").collect()
    assert stream[0]["stream"] == (
        "metric value=1\nmetric,aa=bb value=1\nmetric value=1 1667615389000000000\n"
    )


def test_influx_read_names(spark):
    """converter_sls_metric_test.go:85-135 readNames matrix."""
    rows = [
        (0, "aa", "", "1", None, None, None),
        (1, "aa:bb", "", "1", None, None, None),
        (2, "aa:bb", "", "1", None, None, "bb"),
        (3, ":", "", "1", None, None, None),
        (4, "aa:value", "", "1", None, None, "value"),
    ]
    lines = [
        r["line"]
        for r in InfluxMetricSerializer().apply(_metric_df(spark, rows)).orderBy("i").collect()
    ]
    assert lines == [
        "aa value=1",
        "aa:bb value=1",
        "aa bb=1",
        ": value=1",
        "aa:value value=1",
    ]


def test_influx_value_types_and_escaping(spark):
    rows = [
        (0, "m", "k 1#$#v 1|k,2#$#v=2", "0.5", None, "float", None),
        (1, "m", "", "42", None, "int", None),
        (2, "m", "", "true", None, "bool", None),
        (3, "m", "", 'say "hi"\\', None, "string", None),
        (4, "me tric,x", "", "1", None, None, None),
        (5, "m", "", "nope", None, "int", None),      # bad int -> NULL
        (6, "m", "", "1e999", None, None, None),       # ParseFloat ErrRange
        (7, "", "", "1", None, None, None),            # missing name
        (8, "m", "dangling", "1", None, None, None),   # label key w/o value
        (9, "m", "", "", None, "string", None),        # empty string value OK
    ]
    lines = [
        r["line"]
        for r in InfluxMetricSerializer().apply(_metric_df(spark, rows)).orderBy("i").collect()
    ]
    assert lines[0] == "m,k\\ 1=v\\ 1,k\\,2=v\\=2 value=0.5"
    assert lines[1] == "m value=42i"
    assert lines[2] == "m value=true"
    assert lines[3] == 'm value="say \\"hi\\"\\\\"'
    assert lines[4] == "me\\ tric\\,x value=1"
    assert lines[5] is None
    assert lines[6] is None
    assert lines[7] is None
    assert lines[8] is None
    assert lines[9] == 'm value=""'


def test_parse_sls_labels_recovery(spark):
    """converter_sls_metric.go:101-162 — '|' inside a label VALUE merges into
    the previous label; sorted output."""
    df = spark.createDataFrame(
        [(0, "b#$#2|a#$#x|y|z"), (1, "k#$#v"), (2, "")], ["i", "lbl"]
    ).select("i", parse_sls_labels(F.col("lbl")).alias("p"))
    rows = {r["i"]: r["p"] for r in df.collect()}
    assert [(e["k"], e["v"]) for e in rows[0]] == [("a", "x|y|z"), ("b", "2")]
    assert [(e["k"], e["v"]) for e in rows[1]] == [("k", "v")]
    assert rows[2] == []


def test_raw_group_stream(spark):
    """converter_raw_test.go — ByteArray events joined with the separator."""
    df = spark.createDataFrame(
        [(1, 0, "ev1"), (1, 1, "ev2"), (2, 0, "solo")], ["g", "seq", "content"]
    )
    rows = {r["g"]: r["stream"] for r in raw_group_stream(df, ["g"], "seq", sep="\n").collect()}
    assert rows[1] == "ev1\nev2"
    assert rows[2] == "solo"


def test_loki_sink_frame(spark):
    from loongcollector_spark.operators.convert import CustomSingleConverter, loki_sink_frame

    df = spark.createDataFrame(
        [("warn", 1434055562)],
        "lvl string, log_time_sec long",
    ).select(
        F.create_map(
            F.lit("level"), F.col("lvl"),
            F.lit("msg"), F.lit("hello"),
            F.lit("__tag__:__path__"), F.lit("/var/a.log"),
        ).alias(FIELDS),
        "log_time_sec",
    )
    out = loki_sink_frame(
        df,
        dynamic_labels=["content.level", "tag.log.file.path", "content.gone"],
        static_labels={"job": "loong", "level": "static-loses"},
        conv=CustomSingleConverter(source="1.2.3.4"),
    ).collect()[0]
    # dynamic labels trim their prefix; misses are omitted (content.gone);
    # static fills only absent keys (level stays dynamic)
    assert dict(out.labels) == {
        "level": "warn",
        "log.file.path": "/var/a.log",
        "job": "loong",
    }
    assert out.ts == 1434055562
    assert out.line.startswith('{"contents":{"level":"warn","msg":"hello"}')


def test_otlp_logs_sink_frames(spark):
    """flusher_otlp v1: one LogsData payload per sink group; resource gating
    (empty topic dropped), content/level → body/severityText and excluded
    from attributes, convertLogToMap tag overlay wins on key collision."""
    from loongcollector_spark.operators.convert import otlp_logs_sink_frames
    from loongcollector_spark.operators.otlp_pb import decode_logs

    rows = [
        ("a", 10, {"content": "m1", "level": "WARN", "k": "c-val",
                   "__tag__:k": "t-val"}),
        ("a", 11, {"k2": "v2"}),  # no content → no body; no level → ""
        ("b", 12, {"content": "m3"}),
    ]
    df = spark.createDataFrame(
        [(s, t, m) for s, t, m in rows],
        f"sink string, ts_sec long, {FIELDS} map<string,string>",
    )
    out = otlp_logs_sink_frames(
        df, ["sink"],
        source=F.concat(F.lit("src-"), F.col("sink")),
        topic=F.when(F.col("sink") == "a", F.lit("top-a")).otherwise(F.lit("")),
        group_tags={"env": F.lit("prod")},
        order_col="ts_sec",
    ).collect()
    payloads = {r["sink"]: decode_logs(bytes(r["payload"])) for r in out}
    assert set(payloads) == {"a", "b"}

    ra = payloads["a"]["resourceLogs"][0]
    res = {a["key"]: a["value"]["stringValue"] for a in ra["resource"]["attributes"]}
    assert res == {"source": "src-a", "topic": "top-a", "env": "prod"}
    recs = ra["scopeLogs"][0]["logRecords"]
    assert [r["timeUnixNano"] for r in recs] == ["10000000000", "11000000000"]
    r1, r2 = recs
    assert r1["body"] == {"stringValue": "m1"} and r1["severityText"] == "WARN"
    a1 = {a["key"]: a["value"]["stringValue"] for a in r1["attributes"]}
    # tag k (from __tag__:k) overlays content k; host.ip/log.topic injected
    assert a1 == {"k": "t-val", "env": "prod", "host.ip": "src-a",
                  "log.topic": "top-a"}
    assert r2["body"] == {} and r2["severityText"] == ""

    rb = payloads["b"]["resourceLogs"][0]
    resb = {a["key"]: a["value"]["stringValue"] for a in rb["resource"]["attributes"]}
    assert "topic" not in resb and "machine_uuid" not in resb
    assert len(rb["scopeLogs"][0]["logRecords"]) == 1


def test_otlp_metrics_sink_frames(spark):
    """flusher_otlp metric direction: gauge→Gauge, counter→DELTA Sum,
    untyped skipped; one MetricsData payload per sink with resource tags."""
    from loongcollector_spark.operators.convert import otlp_metrics_sink_frames
    from loongcollector_spark.operators.otlp_pb import decode_metrics

    df = spark.createDataFrame(
        [
            ("a", 1, "cpu", "gauge", {"host": "h1"}, 1.5, 1_000_000_000),
            ("a", 2, "req", "counter", {"host": "h1"}, 7.0, 2_000_000_000),
            ("a", 3, "meh", "untyped", {}, 9.0, 3_000_000_000),
        ],
        "sink string, i long, metric_name string, metric_type string,"
        "tags map<string,string>, value double, ts_ns long",
    )
    out = otlp_metrics_sink_frames(
        df, ["sink"], resource_tags={"cluster": "c9"}, order_col="i"
    ).collect()
    assert len(out) == 1
    d = decode_metrics(bytes(out[0]["payload"]))
    rm = d["resourceMetrics"][0]
    res = {a["key"]: a["value"]["stringValue"] for a in rm["resource"]["attributes"]}
    assert res == {"cluster": "c9"}
    ms = rm["scopeMetrics"][0]["metrics"]
    assert [m["name"] for m in ms] == ["cpu", "req"]  # untyped skipped
    assert "gauge" in ms[0] and ms[0]["gauge"]["dataPoints"][0]["asDouble"] == 1.5
    assert "sum" in ms[1] and ms[1]["sum"]["isMonotonic"] is False


def test_otlp_traces_sink_frames(spark):
    """flusher_otlp trace direction: hex ids to bytes with the empty-on-bad
    rule (convertTraceID/convertSpanID error branch), parent ids, status
    code+message, resource/scope framing."""
    from loongcollector_spark.operators.convert import otlp_traces_sink_frames
    from loongcollector_spark.operators.otlp_pb import decode_traces

    tid, sid, pid = "ab" * 16, "cd" * 8, "ef" * 8
    df = spark.createDataFrame(
        [
            ("a", 1, tid, sid, pid, "op", 2, 1000, 2000, {"k": "v"}, 2, "boom"),
            ("a", 2, "zz-bad-hex", "cd", "", "op2", 1, 10, 20, {}, 0, ""),
        ],
        "sink string, i long, trace_id string, span_id string,"
        "parent_span_id string, span_name string, kind int, start_ns long,"
        "end_ns long, tags map<string,string>, status_code int,"
        "status_message string",
    )
    out = otlp_traces_sink_frames(
        df, ["sink"],
        status_message_col="status_message",
        resource_tags={"cluster": "c1"},
        scope_name="io.x", scope_version="2",
        order_col="i",
    ).collect()
    d = decode_traces(bytes(out[0]["payload"]))
    rs = d["resourceSpans"][0]
    assert {a["key"]: a["value"]["stringValue"] for a in rs["resource"]["attributes"]} == {
        "cluster": "c1"
    }
    ss = rs["scopeSpans"][0]
    assert ss["scope"] == {"name": "io.x", "version": "2"}
    s1, s2 = ss["spans"]
    assert (s1["traceId"], s1["spanId"], s1["parentSpanId"]) == (tid, sid, pid)
    assert s1["status"] == {"code": 2, "message": "boom"}
    # bad hex trace id and wrong-length span id → EMPTY ids
    assert s2["traceId"] == "" and s2["spanId"] == ""
    assert s2["status"].get("code", 0) == 0  # zero code omitted (proto3 canonical)


def test_http_sink_frames(spark):
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.convert import http_sink_frames

    df = spark.createDataFrame(
        [(1, 1700000001)], "doc_id long, log_time_sec long"
    ).select(
        "doc_id", "log_time_sec",
        F.create_map(
            F.lit("method"), F.lit("GET"),
            F.lit("status"), F.lit("200"),
            F.lit("__tag__:__path__"), F.lit("/var/log/a.log"),
        ).alias("fields"),
    )
    out = http_sink_frames(
        df,
        "http://sink.example/logs",
        query={"q": "a b*c~d", "project": "p-%{content.method}"},
        headers={"x-trace": "%{content.status}-%{content.nope}"},
        compression="gzip",
    ).collect()
    assert len(out) == 1
    r = out[0]
    # url.Values.Encode: sorted keys, Go QueryEscape (space→+, *→%2A, ~ kept)
    assert r["url"] == "http://sink.example/logs?project=p-GET&q=a+b%2Ac~d"
    assert json.loads(r["headers"]) == {
        "Content-Encoding": "gzip",
        "Content-Type": "application/json",
        "X-Trace": "200-content.nope",  # missing key → literal fallback
    }
    body = json.loads(r["body"])
    assert body["contents"] == {"method": "GET", "status": "200"}
    assert body["tags"] == {"host.ip": "", "log.file.path": "/var/log/a.log"}
    assert body["time"] == 1700000001
    # user-supplied content type wins; no compression → no encoding header
    r2 = http_sink_frames(
        df, "http://sink.example/logs",
        headers={"content-type": "text/plain"},
    ).collect()[0]
    assert r2["url"] == "http://sink.example/logs"
    assert json.loads(r2["headers"]) == {"Content-Type": "text/plain"}


# --- ES bulk bodies (flusher_elasticsearch.go:189-235) -----------------------


def test_es_bulk_sink_frames(spark):
    from loongcollector_spark.operators.convert import es_bulk_sink_frames

    rows = [
        (1, "a", 1434055562, "PUT"),
        (2, "a", 1434055563, "GET"),
        (3, "b", 1434055564, "DEL"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sink string, log_time_sec long, method string")
    df = df.select(
        "doc_id", "sink", "log_time_sec",
        F.create_map(F.lit("method"), F.col("method")).alias(FIELDS),
    )
    out = {
        r["sink"]: r["body"]
        for r in es_bulk_sink_frames(
            df, "idx-%{content.method}-%{+yyyy.MM.dd}", ["sink"], "doc_id"
        ).collect()
    }
    assert out["a"] == (
        '{"index": {"_index": "idx-PUT-2015.06.11"}}\n'
        '{"contents":{"method":"PUT"},"tags":{"host.ip":""},"time":1434055562}\n'
        '{"index": {"_index": "idx-GET-2015.06.11"}}\n'
        '{"contents":{"method":"GET"},"tags":{"host.ip":""},"time":1434055563}\n'
    )
    assert out["b"].startswith('{"index": {"_index": "idx-DEL-2015.06.11"}}\n')
    assert out["b"].endswith("\n")
