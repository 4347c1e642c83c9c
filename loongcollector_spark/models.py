"""Typed event models beyond logs: MetricEvent / SpanEvent frames and the
event-type tag used for type routing.

Reference shapes:
- MetricEvent (core/models/MetricEvent.h:30): name, tags, timestamp, and a
  MetricValue variant (core/models/MetricValue.h:34-81) = UntypedSingleValue
  (one double) | UntypedMultiDoubleValues (map name -> (counter|gauge, double)).
- SpanEvent (core/models/SpanEvent.h:36): trace/span ids, name, kind,
  start/end ns, tags, status.
- Router conditions can match on the event TYPE (EventTypeCondition,
  core/collection_pipeline/route/Condition.cpp:36-59: "log" | "metric" |
  "trace").

Spark mapping: one frame per shape with a literal ``__event_type__`` column;
the MetricValue variant is two nullable columns (``value`` double,
``values`` map<string, struct<metric_type,value>>) with exactly one non-null
— the relational rendering of std::variant. Frames of different types union
by name with missing columns nulled, so a mixed event stream is one DataFrame
and type routing is an equality filter (see routing.EVENT_TYPE for the
router-side condition).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .operators.base import FIELDS, fget

EVENT_TYPE_COL = "__event_type__"
LOG, METRIC, TRACE = "log", "metric", "trace"

MULTI_VALUE_TYPE = "map<string,struct<metric_type:string,value:double>>"
COUNTER, GAUGE = "counter", "gauge"  # UntypedValueMetricType


def tag_log_events(df: DataFrame) -> DataFrame:
    """Stamp a log frame with its event type."""
    return df.withColumn(EVENT_TYPE_COL, F.lit(LOG))


def metric_events(
    df: DataFrame,
    name: Column | str,
    tags: Mapping[str, Column | str] | None = None,
    value: Column | str | None = None,
    values: Column | None = None,
    time_col: str | None = None,
) -> DataFrame:
    """Build a MetricEvent frame: (metric_name, tags, value | values,
    event_time, __event_type__='metric'). Exactly one of ``value`` (single
    double) / ``values`` (multi-double map) must be given — the MetricValue
    variant."""
    if (value is None) == (values is None):
        raise ValueError("exactly one of value/values (MetricValue variant)")
    name_c = F.lit(name) if isinstance(name, str) else name
    tag_args: list[Column] = []
    for k, v in (tags or {}).items():
        tag_args.append(F.lit(k))
        tag_args.append(F.col(v).cast("string") if isinstance(v, str) else v.cast("string"))
    tags_c = F.create_map(*tag_args) if tag_args else F.expr("map()")
    single = (
        (F.col(value) if isinstance(value, str) else value).cast("double")
        if value is not None
        else F.lit(None).cast("double")
    )
    multi = values if values is not None else F.lit(None).cast(MULTI_VALUE_TYPE)
    cols = [
        name_c.alias("metric_name"),
        tags_c.alias("tags"),
        single.alias("value"),
        multi.alias("values"),
        F.lit(METRIC).alias(EVENT_TYPE_COL),
    ]
    if time_col:
        cols.append(F.col(time_col).alias("event_time"))
    return df.select(*cols)


def multi_double_values(pairs: Mapping[str, tuple[str, Column]]) -> Column:
    """UntypedMultiDoubleValues literal: {name: (metric_type, value)}."""
    args: list[Column] = []
    for k, (mtype, v) in pairs.items():
        args.append(F.lit(k))
        args.append(
            F.struct(F.lit(mtype).alias("metric_type"), v.cast("double").alias("value"))
        )
    return F.create_map(*args)


def log_fields_to_metric_events(
    df: DataFrame,
    label_keys: Sequence[str],
    value_keys: Mapping[str, str],
    time_col: str | None = None,
) -> DataFrame:
    """LogToMetric emitting the typed MetricEvent frame (the reference's
    processor_log_to_sls_metric feeds SLS metricstores whose row model IS
    MetricEvent): event fields ``label_keys`` become tags, each
    (metric_name -> value_field) pair becomes one metric row; non-numeric
    values are dropped (processor_log_to_sls_metric.go:220-240)."""
    num_rx = r"^-?\d+(\.\d+)?$"
    tag_args: list[Column] = []
    for k in sorted(label_keys):
        tag_args.append(F.lit(k))
        tag_args.append(F.coalesce(fget(k), F.lit("")))
    tags_c = F.create_map(*tag_args) if tag_args else F.expr("map()")
    metrics = F.array(
        *[
            F.struct(F.lit(name).alias("n"), fget(vkey).alias("v"))
            for name, vkey in value_keys.items()
        ]
    )
    keep = [c for c in df.columns if c != FIELDS]
    out = df.select(*keep, tags_c.alias("tags"), F.explode(metrics).alias("__m__"))
    out = out.filter(F.col("__m__").getField("v").rlike(num_rx))
    cols = [
        F.col("__m__").getField("n").alias("metric_name"),
        "tags",
        F.col("__m__").getField("v").cast("double").alias("value"),
        F.lit(None).cast(MULTI_VALUE_TYPE).alias("values"),
        F.lit(METRIC).alias(EVENT_TYPE_COL),
    ]
    if time_col:
        cols.insert(0, F.col(time_col).alias("event_time"))
    return out.select(*cols)


def span_events(
    df: DataFrame,
    trace_id: Column,
    span_id: Column,
    name: Column,
    kind: Column | str = "internal",
    parent_span_id: Column | None = None,
    start_ns: Column | None = None,
    end_ns: Column | None = None,
    tags: Column | None = None,
) -> DataFrame:
    """SpanEvent frame (SpanEvent.h:36 shape; kind ∈ internal/server/client/
    producer/consumer)."""
    kind_c = F.lit(kind) if isinstance(kind, str) else kind
    return df.select(
        trace_id.cast("string").alias("trace_id"),
        span_id.cast("string").alias("span_id"),
        (parent_span_id if parent_span_id is not None else F.lit("")).cast("string").alias(
            "parent_span_id"
        ),
        name.cast("string").alias("span_name"),
        kind_c.alias("kind"),
        (start_ns if start_ns is not None else F.lit(0)).cast("long").alias("start_ns"),
        (end_ns if end_ns is not None else F.lit(0)).cast("long").alias("end_ns"),
        (tags if tags is not None else F.expr("map()")).alias("tags"),
        F.lit(TRACE).alias(EVENT_TYPE_COL),
    )


def union_event_stream(*frames: DataFrame) -> DataFrame:
    """Union typed frames into one mixed event stream (missing columns
    nulled) — the PipelineEventGroup analog for a heterogeneous pipeline."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
