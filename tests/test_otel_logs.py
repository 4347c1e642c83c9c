"""OTLP logs → SLS log rows (ConvertOtlpLogV1, otlpDataToSLSProto.go:280-338)
— JSON, protojson and protobuf-wire paths; golden from decoder_test.go:64-135."""

import json

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.otel import OtelLogParser
from loongcollector_spark.operators.otlp_pb import (
    OtelPbToJson,
    decode_logs,
    encode_attr,
    encode_log_record_pb,
    encode_logs_data,
)

NS = 1663904182000000000


def _payload():
    return json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "serviceName", "value": {"stringValue": "test-service"}}
                        ]
                    },
                    "scopeLogs": [
                        {
                            "logRecords": [
                                {
                                    "timeUnixNano": str(NS),
                                    "body": {"stringValue": "test-message"},
                                    "attributes": [
                                        {"key": "attr1", "value": {"intValue": "123"}},
                                        {"key": "attr2", "value": {"boolValue": True}},
                                    ],
                                }
                            ]
                        }
                    ],
                }
            ]
        }
    )


def _df(spark, payload):
    return to_events(spark.createDataFrame([("d1", payload)], "doc_id string, content string"))


def test_otel_log_golden(spark):
    # decoder_test.go:64-135: contents order/values + attributes/resources JSON
    r = OtelLogParser().apply(_df(spark, _payload())).collect()[0]
    f = r[FIELDS]
    assert f["time_unix_nano"] == str(NS)
    assert f["severity_number"] == "0"
    assert f["severity_text"] == ""
    assert f["content"] == "test-message"
    assert f["attributes"] == '{"attr1":123,"attr2":true}'
    assert f["resources"] == '{"serviceName":"test-service"}'
    assert r.ts_sec == NS // 10**9 and r.ts_ns == NS % 10**9


def test_otel_log_omits_empty_attr_maps(spark):
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "scopeLogs": [
                        {
                            "logRecords": [
                                {
                                    "timeUnixNano": str(NS),
                                    "severityNumber": 13,
                                    "severityText": "WARN",
                                    "body": {"intValue": "42"},
                                }
                            ]
                        }
                    ]
                }
            ]
        }
    )
    r = OtelLogParser().apply(_df(spark, payload)).collect()[0]
    f = r[FIELDS]
    assert "attributes" not in f and "resources" not in f
    assert f["severity_number"] == "13" and f["severity_text"] == "WARN"
    assert f["content"] == "42"  # Body().AsString() of an int body


def test_otel_log_severity_enum_name(spark):
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "scopeLogs": [
                        {
                            "logRecords": [
                                {
                                    "timeUnixNano": str(NS),
                                    "severityNumber": "SEVERITY_NUMBER_ERROR2",
                                    "body": {"stringValue": "x"},
                                }
                            ]
                        }
                    ]
                }
            ]
        }
    )
    r = OtelLogParser().apply(_df(spark, payload)).collect()[0]
    assert r[FIELDS]["severity_number"] == "18"


def test_otel_log_bad_payload_dropped(spark):
    out = OtelLogParser().apply(_df(spark, "not json"))
    assert out.count() == 0


def test_decode_logs_wire_roundtrip():
    rec = encode_log_record_pb(
        NS,
        severity_number=9,
        severity_text="INFO",
        body="hello",
        attrs=[encode_attr("attr1", 123), encode_attr("attr2", True)],
    )
    data = encode_logs_data([rec], resource_attrs=[encode_attr("serviceName", "svc")])
    d = decode_logs(data)
    lr = d["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert lr["timeUnixNano"] == str(NS)
    assert lr["severityNumber"] == 9
    assert lr["severityText"] == "INFO"
    assert lr["body"] == {"stringValue": "hello"}
    assert lr["attributes"] == [
        {"key": "attr1", "value": {"intValue": "123"}},
        {"key": "attr2", "value": {"boolValue": True}},
    ]
    assert d["resourceLogs"][0]["resource"]["attributes"] == [
        {"key": "serviceName", "value": {"stringValue": "svc"}}
    ]
    assert decode_logs(b"\xff\xff") is None
    assert decode_logs(b"") is None


def test_otel_log_pb_wire_e2e(spark):
    rec = encode_log_record_pb(NS, 5, "DEBUG", "wire-msg", [encode_attr("k", "v")])
    payload = encode_logs_data([rec]).hex()
    df = _df(spark, payload)
    out = OtelLogParser().apply(OtelPbToJson("log").apply(df)).collect()[0]
    f = out[FIELDS]
    assert f["content"] == "wire-msg"
    assert f["severity_number"] == "5"
    assert f["attributes"] == '{"k":"v"}'
