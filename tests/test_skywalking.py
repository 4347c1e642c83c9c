"""SkyWalking v3 conversion goldens, transcribed from the reference's own
test fixtures: plugins/input/skywalkingv3/testdata/{trace,jvm_metrics,
clr_metrics}.json with inputs mirroring buildMockTraceRequest
(tracing_handle_test.go:58-88), buildMockJvmMetricRequest
(jvm_metric_handle_test.go:60-119) and the CLR mock
(clr_metric_handle_test.go:40-60)."""

from __future__ import annotations

import json

from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.skywalking import (
    SkywalkingClrMetricParser,
    SkywalkingJvmMetricParser,
    SkywalkingLoggingParser,
    SkywalkingMeterParser,
    SkywalkingSegmentParser,
)


def _events(spark, payloads):
    return to_events(
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(payloads)], "doc_id long, content string"
        )
    )


def _fields(df):
    return [r["fields"] for r in df.orderBy("doc_id").collect()]


MOCK_SEGMENT = {
    "traceId": "trace-id-a",
    "traceSegmentId": "trace-seg-id-a",
    "service": "service-a",
    "serviceInstance": "service-instance-a",
    "spans": [
        {
            "spanId": 123,
            "parentSpanId": 456,
            "startTime": 1234567890123,
            "endTime": 1234567890125,
            "operationName": "name",
            "peer": "abc:1234",
            "tags": [
                {"key": "key-a", "value": "value-a"},
                {"key": "key-b", "value": "value-b"},
            ],
        }
    ],
}

# testdata/trace.json entry 1 (pre-InstanceProperties: resource {})
GOLDEN_TRACE = {
    "links": "[]",
    "host": "",
    "service": "service-a",
    "resource": "{}",
    "name": "name",
    "kind": "server",
    "traceID": "trace-id-a",
    "spanID": "trace-seg-id-a.123",
    "parentSpanID": "trace-seg-id-a.456",
    "logs": "[]",
    "traceState": "",
    "start": "1234567890123000",
    "end": "1234567890125000",
    "duration": "2000",
    "attribute": '{"key-a":"value-a","key-b":"value-b",'
    '"net.peer.ip":"abc","net.peer.port":"1234"}',
    "statusCode": "OK",
    "statusMessage": "",
}


def test_trace_golden(spark):
    out = _fields(SkywalkingSegmentParser().apply(_events(spark, [json.dumps(MOCK_SEGMENT)])))
    assert len(out) == 1
    got = dict(out[0])
    assert got.pop("__ts_sec__") == "1234567890"  # Time in testdata/trace.json
    assert got == GOLDEN_TRACE


def test_trace_golden_with_resource(spark):
    # testdata/trace.json entry 2: after the cache holds {"a":"b","c":"d"}
    res = spark.createDataFrame(
        [
            (
                "service-a",
                "service-instance-a",
                [("a", "b"), ("c", "d")],
            )
        ],
        "service string, serviceInstance string, "
        "properties array<struct<key:string,value:string>>",
    )
    out = _fields(
        SkywalkingSegmentParser().apply(
            _events(spark, [json.dumps(MOCK_SEGMENT)]), resources=res
        )
    )
    assert out[0]["resource"] == '{"a":"b","c":"d"}'
    assert out[0]["host"] == ""  # no hostname property → Host stays empty


def test_trace_resource_ot_mapping_and_host(spark):
    res = spark.createDataFrame(
        [
            (
                "service-a",
                "service-instance-a",
                [
                    ("hostname", "h-9"),
                    ("language", "java"),
                    ("Process No.", "41"),
                    ("custom", "x"),
                ],
            )
        ],
        "service string, serviceInstance string, "
        "properties array<struct<key:string,value:string>>",
    )
    out = _fields(
        SkywalkingSegmentParser().apply(
            _events(spark, [json.dumps(MOCK_SEGMENT)]), resources=res
        )
    )
    assert out[0]["resource"] == (
        '{"custom":"x","host.name":"h-9","process.pid":"41",'
        '"telemetry.sdk.language":"java"}'
    )
    assert out[0]["host"] == "h-9"


def test_span_kind_matrix(spark):
    def seg(span_type, span_layer):
        s = json.loads(json.dumps(MOCK_SEGMENT))
        s["spans"][0]["spanType"] = span_type
        s["spans"][0]["spanLayer"] = span_layer
        return json.dumps(s)

    payloads = [
        seg("Entry", "Http"), seg("Exit", "Http"), seg("Local", "Http"),
        seg("Entry", "MQ"), seg("Exit", "MQ"), seg("Local", "MQ"),
    ]
    kinds = [f["kind"] for f in _fields(SkywalkingSegmentParser().apply(_events(spark, payloads)))]
    assert kinds == ["server", "client", "internal", "consumer", "producer", ""]


def test_mq_database_and_ref_semantics(spark):
    mq = json.loads(json.dumps(MOCK_SEGMENT))
    mq["spans"][0].update(
        {
            "spanType": "Exit",
            "spanLayer": "MQ",
            "componentId": 73,
            "tags": [{"key": "mq.topic", "value": "orders"}],
        }
    )
    db = json.loads(json.dumps(MOCK_SEGMENT))
    db["spans"][0].update(
        {
            "spanType": "Exit",
            "spanLayer": "Database",
            "peer": "db-host:3306",
            "tags": [
                {"key": "db.type", "value": "MySQL"},
                {"key": "db.instance", "value": "orders_db"},
            ],
        }
    )
    ref = json.loads(json.dumps(MOCK_SEGMENT))
    ref["spans"][0]["refs"] = [
        {"traceId": "t-up", "parentTraceSegmentId": "seg-up", "parentSpanId": 7}
    ]
    ref["spans"][0]["logs"] = [
        {
            "time": 1234567890124,
            "data": [
                {"key": "event", "value": "error"},
                {"key": "error.kind", "value": "IOException"},
            ],
        }
    ]
    ref["spans"][0]["isError"] = True

    out = _fields(
        SkywalkingSegmentParser(component_mapping={73: "ActiveMQ"}).apply(
            _events(spark, [json.dumps(mq), json.dumps(db), json.dumps(ref)])
        )
    )
    assert out[0]["kind"] == "producer"
    assert json.loads(out[0]["attribute"]) == {
        "net.peer.ip": "abc", "net.peer.port": "1234",
        "messaging.destination_kind": "topic", "messaging.destination": "orders",
        "mq.topic": "orders", "messaging.system": "ActiveMQ",
    }
    assert json.loads(out[1]["attribute"]) == {
        "net.peer.ip": "db-host", "net.peer.port": "3306",
        "db.system": "MySQL", "db.name": "orders_db",
        "db.connection_string": "mysql://db-host:3306",
    }
    # refs: links marshal + parentSpanID override (segment_analyze.go:111-123)
    assert out[2]["parentSpanID"] == "seg-up.7"
    assert out[2]["links"] == (
        '[{"traceID":"t-up","spanID":"seg-up.7","traceState":"","attributes":null}]'
    )
    assert out[2]["logs"] == (
        '[{"error.kind":"IOException","event":"error","time":"1234567890124"}]'
    )
    assert out[2]["statusMessage"] == "IOException"
    assert out[2]["statusCode"] == "ERROR"


def test_peer_without_port_and_negative_parent(spark):
    s = json.loads(json.dumps(MOCK_SEGMENT))
    s["spans"][0].update({"peer": "lonesome", "parentSpanId": -1, "tags": []})
    out = _fields(SkywalkingSegmentParser().apply(_events(spark, [json.dumps(s)])))
    assert json.loads(out[0]["attribute"]) == {"net.peer.ip": "lonesome"}
    assert out[0]["parentSpanID"] == ""


def test_garbage_payload_dropped_not_job(spark):
    out = SkywalkingSegmentParser().apply(
        _events(spark, ["not json", "{}", json.dumps(MOCK_SEGMENT)])
    )
    assert out.count() == 1


MOCK_JVM = {
    "service": "service_1",
    "serviceInstance": "instance_1",
    "metrics": [
        {
            "time": 10000,
            "cpu": {"usagePercent": 50},
            "memory": [
                {"isHeap": False, "init": 1, "max": 9, "used": 7, "committed": 4},
                {"isHeap": True, "init": 1, "max": 9, "used": 7, "committed": 4},
            ],
            "memoryPool": [
                {"type": "NEWGEN_USAGE", "init": 1, "max": 9, "used": 4, "committed": 7},
                {"type": "OLDGEN_USAGE", "init": 1, "max": 9, "used": 4, "committed": 7},
            ],
            "gc": [
                {"phrase": "NEW", "count": 12, "time": 123},
                {"phrase": "OLD", "count": 12, "time": 123},
            ],
            "thread": {"liveCount": 1, "daemonCount": 2, "peakCount": 3},
        }
    ],
}

_B = "service#$#service_1|serviceInstance#$#instance_1"
GOLDEN_JVM = [  # testdata/jvm_metrics.json — (name, labels, value), in order
    ("skywalking_jvm_cpu_usage", _B, "50"),
    ("skywalking_jvm_memory_committed", _B + "|type#$#nonheap", "4"),
    ("skywalking_jvm_memory_init", _B + "|type#$#nonheap", "1"),
    ("skywalking_jvm_memory_max", _B + "|type#$#nonheap", "9"),
    ("skywalking_jvm_memory_used", _B + "|type#$#nonheap", "7"),
    ("skywalking_jvm_memory_committed", _B + "|type#$#heap", "4"),
    ("skywalking_jvm_memory_init", _B + "|type#$#heap", "1"),
    ("skywalking_jvm_memory_max", _B + "|type#$#heap", "9"),
    ("skywalking_jvm_memory_used", _B + "|type#$#heap", "7"),
    ("skywalking_jvm_memory_pool_committed", _B + "|type#$#NEWGEN_USAGE", "7"),
    ("skywalking_jvm_memory_pool_init", _B + "|type#$#NEWGEN_USAGE", "1"),
    ("skywalking_jvm_memory_pool_max", _B + "|type#$#NEWGEN_USAGE", "9"),
    ("skywalking_jvm_memory_pool_used", _B + "|type#$#NEWGEN_USAGE", "4"),
    ("skywalking_jvm_memory_pool_committed", _B + "|type#$#OLDGEN_USAGE", "7"),
    ("skywalking_jvm_memory_pool_init", _B + "|type#$#OLDGEN_USAGE", "1"),
    ("skywalking_jvm_memory_pool_max", _B + "|type#$#OLDGEN_USAGE", "9"),
    ("skywalking_jvm_memory_pool_used", _B + "|type#$#OLDGEN_USAGE", "4"),
    ("skywalking_jvm_gc_time", "phrase#$#NEW|" + _B, "123"),
    ("skywalking_jvm_gc_count", "phrase#$#NEW|" + _B, "12"),
    ("skywalking_jvm_gc_time", "phrase#$#OLD|" + _B, "123"),
    ("skywalking_jvm_gc_count", "phrase#$#OLD|" + _B, "12"),
    ("skywalking_jvm_threads_live", _B, "1"),
    ("skywalking_jvm_threads_daemon", _B, "2"),
    ("skywalking_jvm_threads_peak", _B, "3"),
]


def test_jvm_metrics_golden(spark):
    out = _fields(SkywalkingJvmMetricParser().apply(_events(spark, [json.dumps(MOCK_JVM)])))
    assert len(out) == 24
    got = [(f["__name__"], f["__labels__"], f["__value__"]) for f in out]
    # multiset parity: DataFrame row order is not semantic (base.py header)
    assert sorted(got) == sorted(GOLDEN_JVM)
    # Time 10000 (5 digits) → ×10^14 (NewMetricLogStringVal normalization)
    assert {f["__time_nano__"] for f in out} == {"1000000000000000000"}
    assert {f["__ts_sec__"] for f in out} == {"1000000000"}


MOCK_CLR = {
    "service": "service_1",
    "serviceInstance": "instance_1",
    "metrics": [
        {
            "time": 15000,
            "cpu": {"usagePercent": 0.5},
            "gc": {
                "gen0CollectCount": 1,
                "gen1CollectCount": 2,
                "gen2CollectCount": 3,
                "heapMemory": 123456,
            },
            "thread": {
                "availableCompletionPortThreads": 999,
                "availableWorkerThreads": 888,
                "maxCompletionPortThreads": 777,
                "maxWorkerThreads": 666,
            },
        }
    ],
}

GOLDEN_CLR = [  # testdata/clr_metrics.json
    ("skywalking_clr_cpu_usage", _B, "0.5"),
    ("skywalking_clr_gc_count", "gen#$#gen0|" + _B, "1"),
    ("skywalking_clr_gc_count", "gen#$#gen1|" + _B, "2"),
    ("skywalking_clr_gc_count", "gen#$#gen2|" + _B, "3"),
    ("skywalking_clr_heap_memory", _B, "123456"),
    ("skywalking_clr_threads", _B + "|type#$#availableCompletionPortThreads", "999"),
    ("skywalking_clr_threads", _B + "|type#$#availableWorkerThreads", "888"),
    ("skywalking_clr_threads", _B + "|type#$#maxCompletionPortThreads", "777"),
    ("skywalking_clr_threads", _B + "|type#$#maxWorkerThreads", "666"),
]


def test_clr_metrics_golden(spark):
    out = _fields(SkywalkingClrMetricParser().apply(_events(spark, [json.dumps(MOCK_CLR)])))
    got = [(f["__name__"], f["__labels__"], f["__value__"]) for f in out]
    assert sorted(got) == sorted(GOLDEN_CLR)
    assert {f["__time_nano__"] for f in out} == {"1500000000000000000"}


MOCK_METER_SINGLE = {
    "timestamp": 1234567890,
    "service": "service_111",
    "serviceInstance": "instance_222",
    "singleValue": {
        "name": "i_am_singleValue_metric",
        "labels": [
            {"name": "Hahaha", "value": "test"},
            {"name": "a", "value": "aaa"},
            {"name": "ip", "value": "1.2.3.4"},
        ],
        "value": 123,
    },
}

MOCK_METER_HIST = {
    "timestamp": 1234567890,
    "service": "service_111",
    "serviceInstance": "instance_222",
    "histogram": {
        "name": "i_am_histogram_metric",
        "labels": [
            {"name": "Hahaha", "value": "test"},
            {"name": "a", "value": "aaa"},
            {"name": "ip", "value": "1.2.3.4"},
        ],
        "values": [
            {"bucket": 0.1, "count": 5},
            {"bucket": 50, "count": 4},
            {"bucket": 88.8, "count": 3},
            {"bucket": 90, "count": 2},
            {"bucket": 100, "count": 1},
        ],
    },
}

_MB = "Hahaha#$#test|a#$#aaa|ip#$#1.2.3.4"
_MSVC = "service#$#service_111|serviceInstance#$#instance_222"
GOLDEN_METER = [  # testdata/meter_singlevalue.json + meter_histogram.json
    ("i_am_singleValue_metric", f"{_MB}|{_MSVC}", "123"),
    ("i_am_histogram_metric_count", f"{_MB}|{_MSVC}", "15"),
    ("i_am_histogram_metric_sum", f"{_MB}|{_MSVC}", "746.9"),
    ("i_am_histogram_metric_bucket", f"{_MB}|le#$#50|{_MSVC}", "5"),
    ("i_am_histogram_metric_bucket", f"{_MB}|le#$#88.8|{_MSVC}", "9"),
    ("i_am_histogram_metric_bucket", f"{_MB}|le#$#90|{_MSVC}", "12"),
    ("i_am_histogram_metric_bucket", f"{_MB}|le#$#100|{_MSVC}", "14"),
    ("i_am_histogram_metric_bucket", f"{_MB}|le#$#+Inf|{_MSVC}", "15"),
]


def test_meter_golden(spark):
    out = _fields(
        SkywalkingMeterParser().apply(
            _events(spark, [json.dumps(MOCK_METER_SINGLE), json.dumps(MOCK_METER_HIST)])
        )
    )
    got = [(f["__name__"], f["__labels__"], f["__value__"]) for f in out]
    assert sorted(got) == sorted(GOLDEN_METER)
    # ts 1234567890 (10 digits) scales by 10^9
    assert {f["__time_nano__"] for f in out} == {"1234567890000000000"}


def test_meter_partial_stream_dropped(spark):
    noservice = dict(MOCK_METER_SINGLE, service="")
    out = SkywalkingMeterParser().apply(_events(spark, [json.dumps(noservice)]))
    assert out.count() == 0  # meter_handle.go:74-76 partial-stream drop


MOCK_LOGGING = {
    "timestamp": 1651902032613,
    "service": "test",
    "serviceInstance": "123",
    "endpoint": "test",
    "body": {"type": "json", "json": {"json": "test"}},
    "traceContext": {"traceId": "test", "traceSegmentId": "test", "spanId": 0},
    "tags": {"data": [{"key": "test", "value": "test2"}]},
}


def test_logging_golden(spark):
    out = _fields(SkywalkingLoggingParser().apply(_events(spark, [json.dumps(MOCK_LOGGING)])))
    f = dict(out[0])
    assert f.pop("__ts_sec__") == "1651902032"  # Time in testdata/logging.json
    assert f == {
        "otlp.name": "apache-skywalking",
        "attribute": '{"endpoint":"test","test":"test2"}',
        "service": "test",
        "content": "test",
        "traceID": "test",
        "spanID": "test.0",
        "resource": '{"serviceInstance":"123"}',
        "timeUnixNano": "1651902032613",
    }


def test_logging_body_types_and_no_trace(spark):
    text = dict(MOCK_LOGGING, body={"type": "TEXT", "text": {"text": "plain"}})
    text.pop("traceContext")
    yaml = dict(MOCK_LOGGING, body={"type": "yaml", "yaml": {"yaml": "a: 1"}})
    out = _fields(
        SkywalkingLoggingParser().apply(
            _events(spark, [json.dumps(text), json.dumps(yaml)])
        )
    )
    assert out[0]["content"] == "plain"
    assert "traceID" not in out[0] and "spanID" not in out[0]
    assert out[1]["content"] == "a: 1"


def test_browser_error_golden(spark):
    from loongcollector_spark.operators.skywalking import SkywalkingBrowserErrorParser

    payload = {
        "uniqueId": "uid-1", "service": "web", "serviceVersion": "1.2",
        "time": 1651902032613, "pagePath": "/home", "category": "js",
        "grade": "ERROR", "message": "boom", "line": 65, "col": 97,
        "stack": "at x", "errorUrl": "/real", "firstReportedError": True,
    }
    out = _fields(SkywalkingBrowserErrorParser().apply(_events(spark, [json.dumps(payload)])))
    f = dict(out[0])
    assert f.pop("__ts_sec__") == "1651902032"
    assert f == {
        "otlp.name": "apache-skywalking",
        "service": "web",
        "uniqueId": "uid-1",
        "serviceVersion": "1.2",
        "category": "js",
        "pagePath": "/home",
        "grade": "ERROR",
        "message": "boom",
        "line": "A",  # Go string(int32) rune rendering (:168)
        "col": "a",
        "stack": "at x",
        "errorUrl": "a",  # the reference reads Col here (:170) — kept
        "firstReportedError": "true",
    }


def test_resource_properties_table_latest_wins_and_filter(spark):
    from loongcollector_spark.operators.skywalking import resource_properties_table

    def rep(order, host, ns):
        return (
            order,
            json.dumps(
                {
                    "service": "svc",
                    "serviceInstance": "i1",
                    "properties": [
                        {"key": "hostname", "value": host},
                        {"key": "Start Time", "value": "drop-me"},
                        {"key": "JVM Arguments", "value": "drop-me"},
                        {"key": "namespace", "value": ns},
                    ],
                }
            ),
        )

    df = to_events(
        spark.createDataFrame(
            [rep(1, "old-host", ""), rep(2, "new-host", "prod")],
            "event_id long, content string",
        )
    )
    rows = resource_properties_table(df).collect()
    assert len(rows) == 1
    props = {p["key"]: p["value"] for p in rows[0]["properties"]}
    # latest report wins; Start Time/JVM Arguments dropped; namespace renamed
    assert props == {"host.name": "new-host", "service.namespace": "prod"}
