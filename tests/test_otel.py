"""OTLP/JSON trace reshaping (processor_otel_trace Format=json;
otlp_trace_parser.go field mapping)."""

import json

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.otel import OtelTraceParser

PAYLOAD = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "host.name", "value": {"stringValue": "web-1"}},
                    {"key": "service.name", "value": {"stringValue": "checkout"}},
                    {"key": "region", "value": {"stringValue": "us"}},
                    {"key": "pid", "value": {"intValue": "42"}},
                ]
            },
            "scopeSpans": [
                {
                    "scope": {"name": "io.otel.example", "version": "1.18.0"},
                    "spans": [
                        {
                            "traceId": "0102030405060708090A0B0C0D0E0F10",
                            "spanId": "0102030405060708",
                            "parentSpanId": "",
                            "name": "HTTP GET",
                            "kind": 2,
                            "startTimeUnixNano": "1663904182348000000",
                            "endTimeUnixNano": "1663904182349500000",
                            "traceState": "vendor=x",
                            "attributes": [
                                {"key": "http.status", "value": {"intValue": "200"}},
                                {"key": "cached", "value": {"boolValue": True}},
                                {"key": "http.method", "value": {"stringValue": "GET"}},
                            ],
                            "status": {"code": 2, "message": "boom"},
                        },
                        {
                            "traceId": "0102030405060708090a0b0c0d0e0f10",
                            "spanId": "1112131415161718",
                            "parentSpanId": "0102030405060708",
                            "name": "db.query",
                            "kind": 1,
                            "startTimeUnixNano": "1663904182348100000",
                            "endTimeUnixNano": "1663904182348200000",
                            "status": {},
                        },
                    ],
                }
            ],
        }
    ]
}


def _parse(spark, payloads):
    df = to_events(
        spark.createDataFrame([(i, json.dumps(p) if isinstance(p, dict) else p) for i, p in enumerate(payloads)], ["i", "content"])
    )
    rows = OtelTraceParser().apply(df).collect()
    return [dict(r[FIELDS]) for r in sorted(rows, key=lambda r: (r["i"], dict(r[FIELDS])["spanID"]))]


def test_otel_trace_span_fields(spark):
    spans = _parse(spark, [PAYLOAD])
    assert len(spans) == 2
    s = spans[0]
    assert s["host"] == "web-1" and s["service"] == "checkout"
    # resource JSON: host.name/service.name removed, keys sorted
    assert s["resource"] == '{"pid":42,"region":"us"}'
    assert s["otlp.name"] == "io.otel.example" and s["otlp.version"] == "1.18.0"
    assert s["traceID"] == "0102030405060708090a0b0c0d0e0f10"  # lowercased hex
    assert s["spanID"] == "0102030405060708" and s["parentSpanID"] == ""
    assert s["kind"] == "server" and s["name"] == "HTTP GET"
    assert s["traceState"] == "vendor=x"
    assert s["start"] == "1663904182348000" and s["end"] == "1663904182349500"
    assert s["duration"] == "1500"
    # attribute JSON sorted keys; int bare, bool bare, string quoted
    assert s["attribute"] == '{"cached":true,"http.method":"GET","http.status":200}'
    assert s["statusCode"] == "ERROR" and s["statusMessage"] == "boom"
    assert s["links"] == "[]" and s["logs"] == "[]"

    s2 = spans[1]
    assert s2["kind"] == "internal" and s2["parentSpanID"] == "0102030405060708"
    assert s2["statusCode"] == "UNSET" and s2["duration"] == "100"


def test_otel_trace_bad_payload_dropped(spark):
    spans = _parse(spark, ["not json at all", {"resourceSpans": []}])
    assert spans == []


def test_otel_trace_events_and_links(spark):
    p = {
        "resourceSpans": [
            {
                "resource": {"attributes": []},
                "scopeSpans": [
                    {
                        "scope": {"name": "s"},
                        "spans": [
                            {
                                "traceId": "aa", "spanId": "bb",
                                "name": "op", "kind": 3,
                                "startTimeUnixNano": "1000",
                                "endTimeUnixNano": "2000",
                                "events": [
                                    {
                                        "timeUnixNano": "1500",
                                        "name": "ev1",
                                        "attributes": [
                                            {"key": "z", "value": {"stringValue": "1"}}
                                        ],
                                    }
                                ],
                                "links": [
                                    {
                                        "traceId": "CC", "spanId": "DD",
                                        "attributes": [],
                                    }
                                ],
                                "status": {"code": 1},
                            }
                        ],
                    }
                ],
            }
        ]
    }
    s = _parse(spark, [p])[0]
    assert s["kind"] == "client" and s["statusCode"] == "OK"
    assert s["logs"] == '[{"attribute":{"z":"1"},"name":"ev1","time":1500}]'
    assert s["links"] == '[{"attribute":{},"spanID":"dd","traceID":"cc"}]'
