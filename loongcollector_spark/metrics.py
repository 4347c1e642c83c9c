"""Pipeline self-metrics — the analog of the reference's per-plugin monitor
counters (mInEventsTotal / mOutSuccessfulEventsTotal / mDiscardedEventsTotal,
e.g. ProcessorParseRegexNative.cpp:95-103) and per-group lineage
(__pack_id__, aggregator_base.go:141-150).

Spark-first: ``df.observe(Observation, ...)`` attaches named aggregates to a
plan node — they're computed DURING the action (no extra pass, executor-side
partial aggregation, the exact semantics of the reference's atomic counters),
and read on the driver afterwards. Per-partition lineage is a narrow
projection (spark_partition_id + monotonically_increasing_id)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observed(df: DataFrame, name: str = "pipeline") -> tuple[DataFrame, Observation]:
    """Attach in-flight counters: rows + token/byte totals. Read
    ``obs.get`` after the first action on the returned frame."""
    obs = Observation(name)
    cols = [F.count(F.lit(1)).alias("events")]
    if "n_tok" in df.columns:
        cols.append(F.sum("n_tok").alias("tokens_total"))
    out = df.observe(obs, *cols)
    return out, obs


def partition_metrics(df: DataFrame) -> DataFrame:
    """Per-partition row counts + min/max pack-id — the lineage/metrics table
    a 100 TB run persists next to each output (one row per task partition;
    computed with map-side aggregation only)."""
    from .aggregate import PACK_ID_COL, with_lineage

    lin = with_lineage(df) if PACK_ID_COL not in df.columns else df
    return (
        lin.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.min(PACK_ID_COL).alias("first_pack_id"),
            F.max(PACK_ID_COL).alias("last_pack_id"),
        )
        .orderBy("partition_id")
    )
