"""JVM-tier OTLP struct→JSON transform parity.

No spark-protobuf jar ships in this sandbox, so the from_protobuf edge is
exercised under skipif on real clusters; what IS tested here — jar-free —
is the whole rest of the JVM tier: proto-shaped structs (exactly the schema
from_protobuf produces for the generated descriptors) are built as literals,
rendered to OTLP/JSON by traces/metrics/logs_struct_to_json, fed through the
SHARED parsers, and compared row-for-row against the Python wire tier
(OtelPbToJson) over the equivalent encoded payloads."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from loongcollector_spark.operators import otlp_pb as W
from loongcollector_spark.operators.base import FIELDS
from loongcollector_spark.operators.jvm_otlp import (
    logs_struct_to_json,
    metrics_struct_to_json,
    traces_struct_to_json,
)
from loongcollector_spark.operators.otel import (
    OtelLogParser,
    OtelMetricParser,
    OtelTraceParser,
)


def _any_ddl(depth: int) -> str:
    base = "string_value:string,bool_value:boolean,int_value:bigint,double_value:double"
    if depth == 0:
        return f"struct<{base},bytes_value:binary>"
    inner = _any_ddl(depth - 1)
    return (
        f"struct<{base},"
        f"array_value:struct<values:array<{inner}>>,"
        f"kvlist_value:struct<values:array<struct<key:string,value:{inner}>>>,"
        "bytes_value:binary>"
    )


ANY = _any_ddl(3)
KVS = f"array<struct<key:string,value:{ANY}>>"
RESOURCE = f"struct<attributes:{KVS}>"
SCOPE = "struct<name:string,version:string>"

SPAN = (
    "struct<trace_id:binary,span_id:binary,trace_state:string,"
    "parent_span_id:binary,name:string,kind:int,start_time_unix_nano:bigint,"
    f"end_time_unix_nano:bigint,attributes:{KVS},"
    f"events:array<struct<time_unix_nano:bigint,name:string,attributes:{KVS}>>,"
    f"links:array<struct<trace_id:binary,span_id:binary,attributes:{KVS}>>,"
    "status:struct<message:string,code:int>>"
)
TRACES = (
    f"struct<resource_spans:array<struct<resource:{RESOURCE},"
    f"scope_spans:array<struct<scope:{SCOPE},spans:array<{SPAN}>>>>>>"
)

LOG_RECORD = (
    "struct<time_unix_nano:bigint,severity_number:bigint,severity_text:string,"
    f"body:{ANY},attributes:{KVS}>"
)
LOGS = (
    f"struct<resource_logs:array<struct<resource:{RESOURCE},"
    f"scope_logs:array<struct<scope:{SCOPE},log_records:array<{LOG_RECORD}>>>>>>"
)

EXEMPLAR = (
    "struct<time_unix_nano:bigint,as_double:double,span_id:binary,"
    f"trace_id:binary,as_int:bigint,filtered_attributes:{KVS}>"
)
NUMBER_DP = (
    "struct<start_time_unix_nano:bigint,time_unix_nano:bigint,as_double:double,"
    f"exemplars:array<{EXEMPLAR}>,as_int:bigint,attributes:{KVS}>"
)
HIST_DP = (
    "struct<start_time_unix_nano:bigint,time_unix_nano:bigint,count:bigint,"
    "sum:double,bucket_counts:array<bigint>,explicit_bounds:array<double>,"
    f"exemplars:array<{EXEMPLAR}>,attributes:{KVS},min:double,max:double>"
)
BUCKETS = "struct<offset:int,bucket_counts:array<bigint>>"
EXP_DP = (
    f"struct<attributes:{KVS},start_time_unix_nano:bigint,time_unix_nano:bigint,"
    f"count:bigint,sum:double,scale:int,zero_count:bigint,positive:{BUCKETS},"
    f"negative:{BUCKETS},exemplars:array<{EXEMPLAR}>,min:double,max:double>"
)
SUMMARY_DP = (
    "struct<start_time_unix_nano:bigint,time_unix_nano:bigint,count:bigint,"
    "sum:double,quantile_values:array<struct<quantile:double,value:double>>,"
    f"attributes:{KVS}>"
)
METRIC = (
    "struct<name:string,description:string,unit:string,"
    f"gauge:struct<data_points:array<{NUMBER_DP}>>,"
    f"sum:struct<data_points:array<{NUMBER_DP}>,aggregation_temporality:int,is_monotonic:boolean>,"
    f"histogram:struct<data_points:array<{HIST_DP}>,aggregation_temporality:int>,"
    f"exponential_histogram:struct<data_points:array<{EXP_DP}>,aggregation_temporality:int>,"
    f"summary:struct<data_points:array<{SUMMARY_DP}>>>"
)
METRICS = (
    f"struct<resource_metrics:array<struct<resource:{RESOURCE},"
    f"scope_metrics:array<struct<scope:{SCOPE},metrics:array<{METRIC}>>>>>>"
)


def _python_tier_rows(spark, parser, signal, payload: bytes):
    df = spark.createDataFrame([(1,)], "i long").select(
        F.create_map(F.lit("content"), F.lit(payload.hex())).alias(FIELDS)
    )
    from loongcollector_spark.operators.otlp_pb import OtelPbToJson

    out = parser.apply(OtelPbToJson(signal).apply(df))
    return sorted(tuple(sorted(r[FIELDS].items())) for r in out.collect())


def _struct_tier_rows(spark, parser, to_json_fn, ddl: str, value: dict):
    df = spark.createDataFrame([(value,)], f"g {ddl}")
    ev = df.select(
        F.create_map(F.lit("content"), to_json_fn(F.col("g"))).alias(FIELDS)
    )
    return sorted(tuple(sorted(r[FIELDS].items())) for r in parser.apply(ev).collect())


def _sv(s: str) -> dict:
    return {"string_value": s}


def test_trace_struct_json_matches_python_tier(spark):
    # wire payload (Python tier input)
    span_full = W.encode_span_pb(
        trace_id=bytes.fromhex("0102030405060708090a0b0c0d0e0f10"),
        span_id=bytes.fromhex("1112131415161718"),
        name="op-a",
        kind=2,
        start_ns=1700000000000000001,
        end_ns=1700000000000000999,
        attrs=[W.encode_attr("k1", "v1"), W.encode_attr("n", 42),
               W.encode_attr("f", 2.5), W.encode_attr("b", True)],
        parent_span_id=bytes.fromhex("2122232425262728"),
        status_code=2,
        status_message="boom",
    ) + W._ld(3, b"w3c=1")  # trace_state (not in the fixture encoder)
    span_min = W.encode_span_pb(
        trace_id=b"", span_id=b"", name="", kind=0, start_ns=5, end_ns=9
    )
    payload = W.encode_traces_data(
        [W.encode_attr("svc", "cart")], "lib", "1.0", [span_full, span_min]
    )
    parser = OtelTraceParser()
    py = _python_tier_rows(spark, parser, "trace", payload)

    # equivalent proto-shaped struct (JVM tier input post-from_protobuf)
    g = {
        "resource_spans": [
            {
                "resource": {"attributes": [{"key": "svc", "value": _sv("cart")}]},
                "scope_spans": [
                    {
                        "scope": {"name": "lib", "version": "1.0"},
                        "spans": [
                            {
                                "trace_id": bytes.fromhex(
                                    "0102030405060708090a0b0c0d0e0f10"
                                ),
                                "span_id": bytes.fromhex("1112131415161718"),
                                "trace_state": "w3c=1",
                                "parent_span_id": bytes.fromhex("2122232425262728"),
                                "name": "op-a",
                                "kind": 2,
                                "start_time_unix_nano": 1700000000000000001,
                                "end_time_unix_nano": 1700000000000000999,
                                "attributes": [
                                    {"key": "k1", "value": _sv("v1")},
                                    {"key": "n", "value": {"int_value": 42}},
                                    {"key": "f", "value": {"double_value": 2.5}},
                                    {"key": "b", "value": {"bool_value": True}},
                                ],
                                "events": None,
                                "links": None,
                                "status": {"message": "boom", "code": 2},
                            },
                            {"start_time_unix_nano": 5, "end_time_unix_nano": 9},
                        ],
                    }
                ],
            }
        ]
    }
    jvm = _struct_tier_rows(spark, parser, traces_struct_to_json, TRACES, g)
    assert jvm == py


def test_log_struct_json_matches_python_tier(spark):
    rec = W.encode_log_record_pb(
        1700000000000000123, severity_number=9, severity_text="INFO", body="hello",
        attrs=[W.encode_attr("h", "x")],
    )
    rec_min = W.encode_log_record_pb(0)
    payload = W.encode_logs_data([rec, rec_min], resource_attrs=[W.encode_attr("svc", "db")])
    parser = OtelLogParser()
    py = _python_tier_rows(spark, parser, "log", payload)

    g = {
        "resource_logs": [
            {
                "resource": {"attributes": [{"key": "svc", "value": _sv("db")}]},
                "scope_logs": [
                    {
                        "scope": None,
                        "log_records": [
                            {
                                "time_unix_nano": 1700000000000000123,
                                "severity_number": 9,
                                "severity_text": "INFO",
                                "body": _sv("hello"),
                                "attributes": [{"key": "h", "value": _sv("x")}],
                            },
                            {"time_unix_nano": None},
                        ],
                    }
                ],
            }
        ]
    }
    jvm = _struct_tier_rows(spark, parser, logs_struct_to_json, LOGS, g)
    assert jvm == py


def test_metric_struct_json_matches_python_tier(spark):
    # gauge with asInt dp + exemplar; sum with asDouble dp, monotonic
    dp_int = W.encode_number_dp(
        1700000000000000111, as_int=-5, attrs=[W.encode_attr("host", "h1")]
    )
    dp_dbl = W.encode_number_dp(1700000000000000222, as_double=3.25)
    gauge = W.encode_gauge_metric("g1", [dp_int])
    msum = W.encode_sum_metric("s1", [dp_dbl], is_monotonic=True)
    payload = W.encode_metrics_data([gauge, msum],
                                    resource_attrs=[W.encode_attr("svc", "api")])
    parser = OtelMetricParser()
    py = _python_tier_rows(spark, parser, "metric", payload)

    g = {
        "resource_metrics": [
            {
                "resource": {"attributes": [{"key": "svc", "value": _sv("api")}]},
                "scope_metrics": [
                    {
                        "scope": None,
                        "metrics": [
                            {
                                "name": "g1",
                                "gauge": {
                                    "data_points": [
                                        {
                                            "time_unix_nano": 1700000000000000111,
                                            "as_int": -5,
                                            "attributes": [
                                                {"key": "host", "value": _sv("h1")}
                                            ],
                                        }
                                    ]
                                },
                            },
                            {
                                "name": "s1",
                                "sum": {
                                    "data_points": [
                                        {
                                            "time_unix_nano": 1700000000000000222,
                                            "as_double": 3.25,
                                        }
                                    ],
                                    "is_monotonic": True,
                                },
                            },
                        ],
                    }
                ],
            }
        ]
    }
    jvm = _struct_tier_rows(spark, parser, metrics_struct_to_json, METRICS, g)
    assert jvm == py


def test_histogram_exp_summary_struct_json_matches_python_tier(spark):
    """Hand-encode the three dp kinds the fixture encoders don't cover
    (public metrics.proto field numbers)."""
    from loongcollector_spark.operators.pb import write_varint

    ld, vi, f64, dbl = W._ld, W._vi, W._f64, W._dbl
    # HistogramDataPoint: time=3 fixed64, count=4 fixed64, sum=5 double,
    # bucket_counts=6 packed fixed64, explicit_bounds=7 packed double,
    # attributes=9, min=11, max=12
    hd = (
        f64(3, 1700000000000001000)
        + f64(4, 7)
        + dbl(5, 12.5)
        + ld(6, struct.pack("<QQQ", 1, 2, 4))
        + ld(7, struct.pack("<dd", 0.5, 1.5))
        + ld(9, W.encode_attr("le", "all"))
        + dbl(11, 0.1)
        + dbl(12, 9.9)
    )
    metric_hist = ld(1, b"h1") + ld(9, ld(1, hd))
    # ExponentialHistogramDataPoint: attrs=1, time=3, count=4, sum=5,
    # scale=6 sint32, zero_count=7, positive=8{offset=1 sint32, counts=2 packed}
    pos = vi(1, 2) + ld(2, b"".join(write_varint(c) for c in (1, 0, 3)))  # zigzag(1)=2
    ed = (
        ld(1, W.encode_attr("k", "e"))
        + f64(3, 1700000000000002000)
        + f64(4, 4)
        + dbl(5, 8.0)
        + vi(6, 6)  # zigzag(3)
        + f64(7, 1)
        + ld(8, pos)
    )
    metric_exp = ld(1, b"e1") + ld(10, ld(1, ed))
    # SummaryDataPoint: time=3, count=4, sum=5, quantile_values=6{q=1,v=2}
    qv = dbl(1, 0.99) + dbl(2, 123.0)
    sd = f64(3, 1700000000000003000) + f64(4, 11) + dbl(5, 321.0) + ld(6, qv)
    metric_sum = ld(1, b"q1") + ld(11, ld(1, sd))
    payload = W.encode_metrics_data([metric_hist, metric_exp, metric_sum])
    parser = OtelMetricParser()
    py = _python_tier_rows(spark, parser, "metric", payload)

    g = {
        "resource_metrics": [
            {
                "resource": None,
                "scope_metrics": [
                    {
                        "scope": None,
                        "metrics": [
                            {
                                "name": "h1",
                                "histogram": {
                                    "data_points": [
                                        {
                                            "time_unix_nano": 1700000000000001000,
                                            "count": 7,
                                            "sum": 12.5,
                                            "bucket_counts": [1, 2, 4],
                                            "explicit_bounds": [0.5, 1.5],
                                            "min": 0.1,
                                            "max": 9.9,
                                            "attributes": [
                                                {"key": "le", "value": _sv("all")}
                                            ],
                                        }
                                    ]
                                },
                            },
                            {
                                "name": "e1",
                                "exponential_histogram": {
                                    "data_points": [
                                        {
                                            "attributes": [
                                                {"key": "k", "value": _sv("e")}
                                            ],
                                            "time_unix_nano": 1700000000000002000,
                                            "count": 4,
                                            "sum": 8.0,
                                            "scale": 3,
                                            "zero_count": 1,
                                            "positive": {
                                                "offset": 1,
                                                "bucket_counts": [1, 0, 3],
                                            },
                                        }
                                    ]
                                },
                            },
                            {
                                "name": "q1",
                                "summary": {
                                    "data_points": [
                                        {
                                            "time_unix_nano": 1700000000000003000,
                                            "count": 11,
                                            "sum": 321.0,
                                            "quantile_values": [
                                                {"quantile": 0.99, "value": 123.0}
                                            ],
                                        }
                                    ]
                                },
                            },
                        ],
                    }
                ],
            }
        ]
    }
    jvm = _struct_tier_rows(spark, parser, metrics_struct_to_json, METRICS, g)
    assert jvm == py


def test_u64_string_past_signed_range(spark):
    from loongcollector_spark.operators.jvm_otlp import _u64_str

    df = spark.createDataFrame([(-1,), (1,), (-6917529027641081856,)], "v long")
    got = [r["s"] for r in df.select(_u64_str(F.col("v")).alias("s")).collect()]
    assert got == ["18446744073709551615", "1", "11529215046068469760"]


def test_auto_tier_falls_back_to_python_otlp(spark, monkeypatch):
    from loongcollector_spark.operators.jvm_otlp import otel_pb_to_json_auto

    monkeypatch.delenv("SPARK_GRAFT_JVM_PB", raising=False)
    payload = W.encode_traces_data(
        [], "s", "1",
        [W.encode_span_pb(trace_id=b"\x01" * 16, span_id=b"\x02" * 8, name="x",
                          kind=1, start_ns=1, end_ns=2)],
    )
    df = spark.createDataFrame([(1,)], "i long").select(
        F.create_map(F.lit("content"), F.lit(payload.hex())).alias(FIELDS)
    )
    out = OtelTraceParser().apply(otel_pb_to_json_auto(df, "trace"))
    rows = out.collect()
    assert len(rows) == 1


def test_jvm_otlp_path_when_module_present(spark):
    from loongcollector_spark.operators.jvm_decode import jvm_pb_available

    if not jvm_pb_available(spark):
        pytest.skip("spark-protobuf external module not on the classpath")
    from loongcollector_spark.operators.jvm_otlp import otel_pb_to_json_jvm

    payload = W.encode_traces_data(
        [], "s", "1",
        [W.encode_span_pb(trace_id=b"\x01" * 16, span_id=b"\x02" * 8, name="x",
                          kind=1, start_ns=1, end_ns=2)],
    )
    df = spark.createDataFrame([(1,)], "i long").select(
        F.create_map(F.lit("content"), F.lit(payload.hex())).alias(FIELDS)
    )
    out = OtelTraceParser().apply(otel_pb_to_json_jvm(df, "trace"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert out.count() == 1
