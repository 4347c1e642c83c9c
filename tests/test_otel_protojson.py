"""processor_otel_trace / processor_otel_metric Format=protojson
(processor_otel_trace.go:87-90 → otlp_trace_parser.go:291-327
ConvertResourceSpans; processor_otel_metric.go:126-140). Fixture values
modeled on processor_otel_trace_test.go TestParserOtelData (hex-digit ids
under all three *NeedDecode flags)."""

import base64
import json

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.otel import OtelMetricParser, OtelTraceParser

# single ResourceSpans object (NOT wrapped in resourceSpans=[...]), per the
# reference test fixture shape: int kind, empty status, hex-digit ids
RS = {
    "resource": {
        "attributes": [
            {"key": "service.name", "value": {"stringValue": "adb_worker"}},
            {"key": "role", "value": {"stringValue": "worker"}},
        ]
    },
    "scopeSpans": [
        {
            "scope": {"name": "com.alibaba.cloud", "attributes": []},
            "spans": [
                {
                    "traceId": "31646461386336653337343330356530",
                    "spanId": "0108B2D29B652107",
                    "parentSpanId": "468e99f19f43d0db",
                    "name": "QueryExecutor::localQuery()",
                    "kind": 1,
                    "startTimeUnixNano": "1689831889338531120",
                    "endTimeUnixNano": "1689831889338737020",
                    "attributes": [
                        {"key": "query.visit_pe_num", "value": {"stringValue": "1"}}
                    ],
                    "events": [],
                    "links": [],
                    "status": {},
                }
            ],
        }
    ],
    "schemaUrl": "https://opentelemetry.io/schemas/1.20.0",
}


def _parse(spark, payloads, **kw):
    df = to_events(
        spark.createDataFrame(
            [(i, json.dumps(p) if isinstance(p, dict) else p) for i, p in enumerate(payloads)],
            ["i", "content"],
        )
    )
    rows = OtelTraceParser(format="protojson", **kw).apply(df).collect()
    return [dict(r[FIELDS]) for r in rows]


DECODE_ALL = dict(
    trace_id_need_decode=True,
    span_id_need_decode=True,
    parent_span_id_need_decode=True,
)


def test_protojson_reference_fixture_shape(spark):
    spans = _parse(spark, [RS], **DECODE_ALL)
    assert len(spans) == 1
    s = spans[0]
    assert s["service"] == "adb_worker" and s["host"] == ""
    # NeedDecode: the base64-reencode + hex-decode round trip recovers the
    # input string; String() re-hex-encodes lowercased
    assert s["traceID"] == "31646461386336653337343330356530"
    assert s["spanID"] == "0108b2d29b652107"
    assert s["parentSpanID"] == "468e99f19f43d0db"
    assert s["kind"] == "internal" and s["statusCode"] == "UNSET"
    assert s["name"] == "QueryExecutor::localQuery()"
    assert s["start"] == "1689831889338531"
    assert s["resource"] == '{"role":"worker"}'


def test_protojson_enum_names(spark):
    p = json.loads(json.dumps(RS))
    sp = p["scopeSpans"][0]["spans"][0]
    sp["kind"] = "SPAN_KIND_SERVER"
    sp["status"] = {"code": "STATUS_CODE_ERROR", "message": "boom"}
    s = _parse(spark, [p], **DECODE_ALL)[0]
    assert s["kind"] == "server"
    assert s["statusCode"] == "ERROR" and s["statusMessage"] == "boom"


def test_protojson_base64_ids_without_decode_flags(spark):
    p = json.loads(json.dumps(RS))
    sp = p["scopeSpans"][0]["spans"][0]
    tid = bytes(range(16))
    sid = bytes(range(8))
    sp["traceId"] = base64.b64encode(tid).decode()
    sp["spanId"] = base64.b64encode(sid).decode()
    sp["parentSpanId"] = ""
    s = _parse(spark, [p])[0]
    assert s["traceID"] == tid.hex()
    assert s["spanID"] == sid.hex()
    assert s["parentSpanID"] == ""


def test_protojson_invalid_hex_drops_whole_payload(spark):
    # hex.DecodeString error fails the payload: BOTH spans vanish, and an
    # independent valid payload in the same batch survives
    bad = json.loads(json.dumps(RS))
    good_span = bad["scopeSpans"][0]["spans"][0]
    bad_span = json.loads(json.dumps(good_span))
    bad_span["traceId"] = "zz-not-hex"
    bad["scopeSpans"][0]["spans"] = [good_span, bad_span]
    spans = _parse(spark, [bad, RS], **DECODE_ALL)
    assert len(spans) == 1
    assert spans[0]["traceID"] == "31646461386336653337343330356530"


def test_protojson_metric_wrap(spark):
    rm = {
        "resource": {
            "attributes": [
                {"key": "host.name", "value": {"stringValue": "h1"}}
            ]
        },
        "scopeMetrics": [
            {
                "metrics": [
                    {
                        "name": "m",
                        "gauge": {
                            "dataPoints": [
                                {
                                    "attributes": [],
                                    "timeUnixNano": "1663904182000000000",
                                    "asDouble": 1.5,
                                }
                            ]
                        },
                    }
                ]
            }
        ],
    }
    df = to_events(
        spark.createDataFrame([(0, json.dumps(rm))], ["i", "content"])
    )
    rows = OtelMetricParser(format="protojson").apply(df).collect()
    fields = [dict(r[FIELDS]) for r in rows]
    assert len(fields) == 1
    assert fields[0]["__name__"] == "m" and fields[0]["__value__"] == "1.5"
