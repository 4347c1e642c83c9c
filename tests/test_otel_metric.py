"""OTLP/JSON metric conversion goldens (ConvertOtlpMetrics,
otlp_metric_parser.go:48-246): gauge / sum / histogram / summary data points
→ SLS metric logs (__name__/__time_nano__/__labels__/__value__)."""

import json

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.otel import OtelMetricParser


def _parse(spark, payload):
    df = to_events(
        spark.createDataFrame([(0, json.dumps(payload))], ["i", "content"])
    )
    rows = [dict(r[FIELDS]) for r in OtelMetricParser().apply(df).collect()]
    return {(r["__name__"], r["__labels__"]): r for r in rows}, rows


def _payload(metrics):
    return {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": [
                        {"key": "host.name", "value": {"stringValue": "web-1"}}
                    ]
                },
                "scopeMetrics": [{"metrics": metrics}],
            }
        ]
    }


def test_gauge_and_sum(spark):
    payload = _payload(
        [
            {
                "name": "cpu_usage",
                "gauge": {
                    "dataPoints": [
                        {
                            "attributes": [{"key": "core", "value": {"intValue": "0"}}],
                            "timeUnixNano": "1663904182348000000",
                            "asDouble": 0.75,
                        }
                    ]
                },
            },
            {
                "name": "requests_total",
                "sum": {
                    "isMonotonic": True,
                    "dataPoints": [
                        {
                            "attributes": [{"key": "code", "value": {"stringValue": "200"}}],
                            "timeUnixNano": "1663904182348000000",
                            "asInt": "1234",
                        }
                    ],
                },
            },
        ]
    )
    by_key, rows = _parse(spark, payload)
    assert len(rows) == 2
    g = by_key[("cpu_usage", "core#$#0|host.name#$#web-1")]
    assert g["__value__"] == "0.75"
    assert g["__time_nano__"] == "1663904182348000000"
    s = by_key[
        ("requests_total", "code#$#200|host.name#$#web-1|otlp_metric_ismonotonic#$#true")
    ]
    assert s["__value__"] == "1234"  # whole number renders Go-'g' style


def test_histogram_cumulative_buckets(spark):
    payload = _payload(
        [
            {
                "name": "latency",
                "histogram": {
                    "dataPoints": [
                        {
                            "attributes": [],
                            "timeUnixNano": "1000",
                            "count": "6",
                            "sum": 4.2,
                            "max": 2.5,
                            "explicitBounds": [0.5, 1.0],
                            "bucketCounts": ["1", "2", "3"],
                        }
                    ]
                },
            }
        ]
    )
    by_key, rows = _parse(spark, payload)
    base = "host.name#$#web-1"
    assert by_key[("latency_sum", base)]["__value__"] == "4.2"
    assert by_key[("latency_max", base)]["__value__"] == "2.5"
    assert by_key[("latency_count", base)]["__value__"] == "6"
    assert ("latency_min", base) not in by_key  # zero min skipped
    assert by_key[("latency_bucket", f"{base}|le#$#0.5")]["__value__"] == "1"
    assert by_key[("latency_bucket", f"{base}|le#$#1")]["__value__"] == "3"
    assert by_key[("latency_bucket", f"{base}|le#$#+Inf")]["__value__"] == "6"
    assert len(rows) == 6


def test_summary_quantiles(spark):
    payload = _payload(
        [
            {
                "name": "rt",
                "summary": {
                    "dataPoints": [
                        {
                            "attributes": [],
                            "timeUnixNano": "2000",
                            "count": "10",
                            "sum": 12.5,
                            "quantileValues": [
                                {"quantile": 0.5, "value": 1.1},
                                {"quantile": 0.99, "value": 3.3},
                            ],
                        }
                    ]
                },
            }
        ]
    )
    by_key, rows = _parse(spark, payload)
    base = "host.name#$#web-1"
    assert by_key[("rt_sum", base)]["__value__"] == "12.5"
    assert by_key[("rt_count", base)]["__value__"] == "10"
    assert by_key[("rt", f"{base}|quantile#$#0.5")]["__value__"] == "1.1"
    assert by_key[("rt", f"{base}|quantile#$#0.99")]["__value__"] == "3.3"
    assert len(rows) == 4
