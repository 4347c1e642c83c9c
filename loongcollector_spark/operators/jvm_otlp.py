"""JVM-tier OTLP decode: ``from_protobuf`` struct → OTLP/JSON text → the
shared column-expression parsers (otel.py), Python nowhere in the plan.

The Python tier (otlp_pb.OtelPbToJson) decodes the wire byte-by-byte in a
``mapInPandas`` stage — correct, but Python-bytecode-bound at 100 TB. This
module replaces ONLY that stage: ``from_protobuf`` (spark-protobuf external
module) parses the wire into a struct, and a pure-Column transform renders
the struct into the exact OTLP/JSON text the Python tier emits (camelCase
names, hex ids, stringified 64-bit nanos, oneof AnyValue). Everything
downstream — OtelTraceParser / OtelMetricParser / OtelLogParser — is shared
verbatim, so both tiers produce identical rows.

The struct→JSON transform is jar-independent and fully tested in-sandbox by
building proto-shaped structs directly (tests/test_jvm_otlp.py) and
comparing against the Python tier over the equivalent encoded payloads; the
from_protobuf edge runs under skipif (no spark-protobuf jar ships in this
sandbox) and on real clusters via
``--packages org.apache.spark:spark-protobuf_2.13``.

Wire schemas: the descriptor sets generated from scratch in jvm_decode.py
(public opentelemetry-proto trace/metrics/logs subsets the Python codec
reads — field-number parity is asserted by tests/test_jvm_decode.py).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS

# AnyValue recursion depth for from_protobuf and the JSON transform — OTLP
# attributes in the wild are depth ≤2 (kvlist of arrays); both tiers truncate
# identically at this bound.
ANY_DEPTH = 3

_EMPTY_STR_ARR = "CAST(array() AS array<string>)"


def _u64_str(col: Column) -> Column:
    """fixed64 → unsigned decimal string (LongType is signed; values past
    2^63 must render like the Python tier's unsigned read)."""
    dec = col.cast("decimal(21,0)")
    two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
    return F.when(col < 0, (dec + two64).cast("string")).otherwise(dec.cast("string"))


def _any_json(v: Column, depth: int = ANY_DEPTH) -> Column:
    """AnyValue struct → the oneof JSON object (exactly one camelCase member
    non-null; to_json's ignoreNullFields drops the rest). intValue renders
    as a STRING (proto3-JSON int64), bytesValue as lowercase hex — matching
    otlp_pb._any_value."""
    members = [
        v["string_value"].alias("stringValue"),
        v["bool_value"].alias("boolValue"),
        v["int_value"].cast("string").alias("intValue"),
        v["double_value"].alias("doubleValue"),
    ]
    if depth > 0:
        arr = F.when(
            v["array_value"].isNotNull(),
            F.struct(
                F.transform(
                    F.coalesce(v["array_value"]["values"], F.expr("array()")),
                    lambda x: _any_json(x, depth - 1),
                ).alias("values")
            ),
        )
        kvl = F.when(
            v["kvlist_value"].isNotNull(),
            F.struct(
                _kvs_json(v["kvlist_value"]["values"], depth - 1).alias("values")
            ),
        )
        members += [arr.alias("arrayValue"), kvl.alias("kvlistValue")]
    members.append(F.lower(F.hex(v["bytes_value"])).alias("bytesValue"))
    return F.struct(*members)


def _kvs_json(arr: Column, depth: int = ANY_DEPTH) -> Column:
    """repeated KeyValue → [{"key": k, "value": {oneof}}] with the Python
    tier's defaults (key "" when absent; absent value → empty object — an
    all-null struct serializes as {})."""
    return F.transform(
        F.coalesce(arr, F.expr("array()")),
        lambda kv: F.struct(
            F.coalesce(kv["key"], F.lit("")).alias("key"),
            # a null value-struct's members all read null → serializes {}
            _any_json(kv["value"], depth).alias("value"),
        ),
    )


def _scope_json(sc: Column) -> Column:
    return F.struct(
        F.coalesce(sc["name"], F.lit("")).alias("name"),
        F.coalesce(sc["version"], F.lit("")).alias("version"),
    )


def _hexs(col: Column) -> Column:
    return F.coalesce(F.lower(F.hex(col)), F.lit(""))


def _nanos(col: Column) -> Column:
    return F.coalesce(_u64_str(col), F.lit("0"))


# --- traces -----------------------------------------------------------------


def _span_json(sp: Column) -> Column:
    status = F.struct(
        sp["status"]["message"].alias("message"),
        sp["status"]["code"].alias("code"),
    )
    return F.struct(
        _hexs(sp["trace_id"]).alias("traceId"),
        _hexs(sp["span_id"]).alias("spanId"),
        _hexs(sp["parent_span_id"]).alias("parentSpanId"),
        F.coalesce(sp["trace_state"], F.lit("")).alias("traceState"),
        F.coalesce(sp["name"], F.lit("")).alias("name"),
        F.coalesce(sp["kind"], F.lit(0)).alias("kind"),
        _nanos(sp["start_time_unix_nano"]).alias("startTimeUnixNano"),
        _nanos(sp["end_time_unix_nano"]).alias("endTimeUnixNano"),
        _kvs_json(sp["attributes"]).alias("attributes"),
        F.transform(
            F.coalesce(sp["events"], F.expr("array()")),
            lambda e: F.struct(
                _nanos(e["time_unix_nano"]).alias("timeUnixNano"),
                F.coalesce(e["name"], F.lit("")).alias("name"),
                _kvs_json(e["attributes"]).alias("attributes"),
            ),
        ).alias("events"),
        F.transform(
            F.coalesce(sp["links"], F.expr("array()")),
            lambda ln: F.struct(
                _hexs(ln["trace_id"]).alias("traceId"),
                _hexs(ln["span_id"]).alias("spanId"),
                _kvs_json(ln["attributes"]).alias("attributes"),
            ),
        ).alias("links"),
        status.alias("status"),
    )


def traces_struct_to_json(g: Column) -> Column:
    """otlp.TracesData struct → the OTLP/JSON text decode_traces emits."""
    body = F.struct(
        F.transform(
            F.coalesce(g["resource_spans"], F.expr("array()")),
            lambda rs: F.struct(
                F.struct(
                    _kvs_json(
                        F.when(rs["resource"].isNotNull(), rs["resource"]["attributes"])
                    ).alias("attributes")
                ).alias("resource"),
                F.transform(
                    F.coalesce(rs["scope_spans"], F.expr("array()")),
                    lambda ss: F.struct(
                        F.when(ss["scope"].isNotNull(), _scope_json(ss["scope"]))
                        .alias("scope"),
                        F.transform(
                            F.coalesce(ss["spans"], F.expr("array()")), _span_json
                        ).alias("spans"),
                    ),
                ).alias("scopeSpans"),
            ),
        ).alias("resourceSpans")
    )
    return F.to_json(body)


# --- logs -------------------------------------------------------------------


def logs_struct_to_json(g: Column) -> Column:
    """otlp.LogsData struct → the OTLP/JSON text decode_logs emits."""

    def log_record(lr: Column) -> Column:
        return F.struct(
            _nanos(lr["time_unix_nano"]).alias("timeUnixNano"),
            F.coalesce(lr["severity_number"], F.lit(0)).cast("int").alias(
                "severityNumber"
            ),
            F.coalesce(lr["severity_text"], F.lit("")).alias("severityText"),
            _any_json(lr["body"]).alias("body"),
            _kvs_json(lr["attributes"]).alias("attributes"),
        )

    body = F.struct(
        F.transform(
            F.coalesce(g["resource_logs"], F.expr("array()")),
            lambda rl: F.struct(
                F.struct(
                    _kvs_json(
                        F.when(rl["resource"].isNotNull(), rl["resource"]["attributes"])
                    ).alias("attributes")
                ).alias("resource"),
                F.transform(
                    F.coalesce(rl["scope_logs"], F.expr("array()")),
                    lambda sl: F.struct(
                        F.when(sl["scope"].isNotNull(), _scope_json(sl["scope"]))
                        .alias("scope"),
                        F.transform(
                            F.coalesce(sl["log_records"], F.expr("array()")), log_record
                        ).alias("logRecords"),
                    ),
                ).alias("scopeLogs"),
            ),
        ).alias("resourceLogs")
    )
    return F.to_json(body)


# --- metrics ----------------------------------------------------------------


def _exemplar_json(e: Column) -> Column:
    return F.struct(
        _nanos(e["time_unix_nano"]).alias("timeUnixNano"),
        e["as_double"].alias("asDouble"),
        F.when(e["as_int"].isNotNull(), e["as_int"].cast("string")).alias("asInt"),
        F.when(e["span_id"].isNotNull(), F.lower(F.hex(e["span_id"]))).alias("spanId"),
        F.when(e["trace_id"].isNotNull(), F.lower(F.hex(e["trace_id"]))).alias(
            "traceId"
        ),
        _kvs_json(e["filtered_attributes"]).alias("filteredAttributes"),
    )


def _exemplars_json(arr: Column) -> Column:
    """Python tier: the "exemplars" key exists only when ≥1 exemplar."""
    return F.when(
        F.size(F.coalesce(arr, F.expr("array()"))) > 0,
        F.transform(arr, _exemplar_json),
    )


def _number_dp_json(dp: Column) -> Column:
    return F.struct(
        _nanos(dp["time_unix_nano"]).alias("timeUnixNano"),
        # oneof value: exactly one of asDouble/asInt present on the wire
        dp["as_double"].alias("asDouble"),
        F.when(dp["as_int"].isNotNull(), dp["as_int"].cast("string")).alias("asInt"),
        _exemplars_json(dp["exemplars"]).alias("exemplars"),
        _kvs_json(dp["attributes"]).alias("attributes"),
    )


def _hist_dp_json(dp: Column) -> Column:
    return F.struct(
        _nanos(dp["time_unix_nano"]).alias("timeUnixNano"),
        _nanos(dp["count"]).alias("count"),
        dp["sum"].alias("sum"),
        F.coalesce(
            F.transform(dp["bucket_counts"], _u64_str), F.expr(_EMPTY_STR_ARR)
        ).alias("bucketCounts"),
        F.coalesce(dp["explicit_bounds"], F.expr("CAST(array() AS array<double>)")).alias(
            "explicitBounds"
        ),
        _exemplars_json(dp["exemplars"]).alias("exemplars"),
        dp["min"].alias("min"),
        dp["max"].alias("max"),
        _kvs_json(dp["attributes"]).alias("attributes"),
    )


def _exp_buckets_json(b: Column) -> Column:
    return F.when(
        b.isNotNull(),
        F.struct(
            F.coalesce(b["offset"], F.lit(0)).alias("offset"),
            F.coalesce(
                F.transform(b["bucket_counts"], lambda x: _u64_str(x)),
                F.expr(_EMPTY_STR_ARR),
            ).alias("bucketCounts"),
        ),
    )


def _exp_dp_json(dp: Column) -> Column:
    return F.struct(
        _nanos(dp["time_unix_nano"]).alias("timeUnixNano"),
        _nanos(dp["count"]).alias("count"),
        dp["sum"].alias("sum"),
        dp["scale"].alias("scale"),
        _nanos(dp["zero_count"]).alias("zeroCount"),
        _exp_buckets_json(dp["positive"]).alias("positive"),
        _exp_buckets_json(dp["negative"]).alias("negative"),
        _exemplars_json(dp["exemplars"]).alias("exemplars"),
        dp["min"].alias("min"),
        dp["max"].alias("max"),
        _kvs_json(dp["attributes"]).alias("attributes"),
    )


def _summary_dp_json(dp: Column) -> Column:
    return F.struct(
        _nanos(dp["time_unix_nano"]).alias("timeUnixNano"),
        _nanos(dp["count"]).alias("count"),
        dp["sum"].alias("sum"),
        F.transform(
            F.coalesce(dp["quantile_values"], F.expr("array()")),
            lambda q: F.struct(
                F.coalesce(q["quantile"], F.lit(0.0)).alias("quantile"),
                F.coalesce(q["value"], F.lit(0.0)).alias("value"),
            ),
        ).alias("quantileValues"),
        _kvs_json(dp["attributes"]).alias("attributes"),
    )


def _metric_json(m: Column) -> Column:
    def dps(parent: Column, fn) -> Column:
        return F.transform(F.coalesce(parent["data_points"], F.expr("array()")), fn)

    return F.struct(
        F.coalesce(m["name"], F.lit("")).alias("name"),
        F.when(m["gauge"].isNotNull(), F.struct(dps(m["gauge"], _number_dp_json).alias(
            "dataPoints"
        ))).alias("gauge"),
        F.when(
            m["sum"].isNotNull(),
            F.struct(
                dps(m["sum"], _number_dp_json).alias("dataPoints"),
                F.coalesce(m["sum"]["is_monotonic"], F.lit(False)).alias("isMonotonic"),
            ),
        ).alias("sum"),
        F.when(
            m["histogram"].isNotNull(),
            F.struct(dps(m["histogram"], _hist_dp_json).alias("dataPoints")),
        ).alias("histogram"),
        F.when(
            m["exponential_histogram"].isNotNull(),
            F.struct(
                dps(m["exponential_histogram"], _exp_dp_json).alias("dataPoints")
            ),
        ).alias("exponentialHistogram"),
        F.when(
            m["summary"].isNotNull(),
            F.struct(dps(m["summary"], _summary_dp_json).alias("dataPoints")),
        ).alias("summary"),
    )


def metrics_struct_to_json(g: Column) -> Column:
    """otlp.MetricsData struct → the OTLP/JSON text decode_metrics emits."""
    body = F.struct(
        F.transform(
            F.coalesce(g["resource_metrics"], F.expr("array()")),
            lambda rm: F.struct(
                F.struct(
                    _kvs_json(
                        F.when(rm["resource"].isNotNull(), rm["resource"]["attributes"])
                    ).alias("attributes")
                ).alias("resource"),
                F.transform(
                    F.coalesce(rm["scope_metrics"], F.expr("array()")),
                    lambda sm: F.struct(
                        F.transform(
                            F.coalesce(sm["metrics"], F.expr("array()")), _metric_json
                        ).alias("metrics")
                    ),
                ).alias("scopeMetrics"),
            ),
        ).alias("resourceMetrics")
    )
    return F.to_json(body)


# --- tier wiring --------------------------------------------------------------

_SIGNALS = {
    "trace": ("otlp.TracesData", traces_struct_to_json),
    "metric": ("otlp.MetricsData", metrics_struct_to_json),
    "log": ("otlp.LogsData", logs_struct_to_json),
}


def _descriptor(signal: str) -> bytes:
    from .jvm_decode import (
        otlp_logs_descriptor_set,
        otlp_metrics_descriptor_set,
        otlp_traces_descriptor_set,
    )

    return {
        "trace": otlp_traces_descriptor_set,
        "metric": otlp_metrics_descriptor_set,
        "log": otlp_logs_descriptor_set,
    }[signal]()


def otel_pb_to_json_jvm(
    df: DataFrame, signal: str = "trace", source_key: str = "content",
    binary_encoding: str = "hex",
) -> DataFrame:
    """JVM tier of OtelPbToJson: fields[source_key] wire bytes →
    from_protobuf → struct→JSON → fields[source_key] rewritten. PERMISSIVE:
    undecodable payloads null out and the row drops (the Python tier's
    error-path parity). No Python stage in the plan."""
    from pyspark.sql.protobuf.functions import from_protobuf

    message, to_json_fn = _SIGNALS[signal]
    src = F.element_at(F.col(FIELDS), F.lit(source_key))
    raw = {
        "hex": F.unhex(src),
        "base64": F.unbase64(src),
        "latin1": F.encode(src, "ISO-8859-1"),
    }[binary_encoding]
    g = from_protobuf(
        raw,
        message,
        binaryDescriptorSet=_descriptor(signal),
        options={"mode": "PERMISSIVE", "recursive.fields.max.depth": str(ANY_DEPTH)},
    )
    out = df.withColumn("__g__", g).filter(F.col("__g__").isNotNull())
    return out.withColumn(
        FIELDS,
        F.map_concat(
            F.map_filter(F.col(FIELDS), lambda k, v: k != source_key),
            F.create_map(F.lit(source_key), to_json_fn(F.col("__g__"))),
        ),
    ).drop("__g__")


def otel_pb_to_json_auto(
    df: DataFrame, signal: str = "trace", source_key: str = "content",
    binary_encoding: str = "hex",
) -> DataFrame:
    """Tier selection (same contract as jvm_decode.parse_sls_log_group_auto):
    SPARK_GRAFT_JVM_PB=1 forces JVM, =0 forces Python, unset probes the
    session for the spark-protobuf module."""
    from .jvm_decode import jvm_pb_available
    from .otlp_pb import OtelPbToJson

    mode = os.environ.get("SPARK_GRAFT_JVM_PB", "auto")
    use_jvm = mode == "1" or (
        mode not in ("0", "1") and jvm_pb_available(df.sparkSession)
    )
    if use_jvm:
        return otel_pb_to_json_jvm(df, signal, source_key, binary_encoding)
    return OtelPbToJson(signal, source_key, binary_encoding=binary_encoding).apply(df)
