"""The flagship end-to-end job (SURVEY.md §7 minimum slice):

read sequences (doc_id, tokens, n_tok, source)
  → decode tokens→content (JVM codegen path or Arrow path)
  → per-source parse (nginx regex / app-json / tab-delimited), with
    keep/discard-unmatch semantics
  → broadcast-join source lookup (team_tag, env, route_key)
  → router fan-out (tag conditions, multi-match copy) via explode
  → explicit repartition((source, route_key)) [+salt]
  → per-sink aggregates (events, tokens_total) + per-source drop counts

Scale notes: the three per-source branches are disjoint filters over the same
scan — on a source-partitioned 100 TB table each branch prunes to its own
partitions (one logical full scan total); the only wide operations are the
pre-write repartition and the tiny sink-key aggregation; the lookup join is
broadcast (no shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .aggregate import partition_for_sinks, sink_aggregates, with_lineage
from .operators.base import to_events, project_fields
from .operators.common import ParserOptions
from .operators.enrich import BroadcastLookup
from .operators.parse import DelimiterParser, JsonParser, RegexParser
from .routing import RouteCondition, Router
from .synth import ROUTE_RULES, sequences_df, source_lookup_df
from .tokens import decode_tokens, decode_tokens_arrow

# nginx access-log regex — the reference's own example pipeline
# (example_config/data_pipelines/nginx-regex.yaml)
NGINX_REGEX = (
    r'([\d\.:]+) - (\S+) \[(\S+) \S+\] "(\S+) (\S+) ([^"]+)" '
    r'(\d+) (\d+) "([^"]*)" "([^"]*)" "([^"]*)"'
)
NGINX_KEYS = [
    "remote_addr",
    "remote_user",
    "time_local",
    "method",
    "url",
    "protocol",
    "status",
    "body_bytes_sent",
    "http_referer",
    "http_user_agent",
    "http_x_forwarded_for",
]
CSV_KEYS = ["uid", "time", "cmethod", "value"]


def decoded_sequences(spark: SparkSession, sf_dir: str, arrow: bool = False) -> DataFrame:
    seq = sequences_df(spark, sf_dir)
    if arrow:
        return decode_tokens_arrow(seq, "tokens", "content")
    return seq.withColumn("content", decode_tokens("tokens"))


def parsed_events(
    spark: SparkSession, sf_dir: str, keep_unmatch: bool = False, arrow: bool = False
) -> DataFrame:
    """Per-source parse; returns the unified event frame
    (doc_id, source, n_tok, fields)."""
    seq = decoded_sequences(spark, sf_dir, arrow=arrow).drop("tokens")
    opts = ParserOptions(keep_fail=keep_unmatch, coping_raw_log=keep_unmatch)

    nginx = RegexParser(NGINX_REGEX, NGINX_KEYS, opts).apply(
        to_events(seq.filter(F.col("source") == "nginx"))
    )
    appjson = JsonParser(opts).apply(
        to_events(seq.filter(F.col("source") == "app-json"))
    )
    csvlog = DelimiterParser("\t", CSV_KEYS, opts).apply(
        to_events(seq.filter(F.col("source") == "csvlog"))
    )
    return nginx.unionByName(appjson).unionByName(csvlog)


def enriched(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    ev = parsed_events(spark, sf_dir, **kw)
    lookup = source_lookup_df(spark)
    return BroadcastLookup(lookup, on="source").apply(ev)


def routed(spark: SparkSession, sf_dir: str, salt_buckets: int = 0, **kw) -> DataFrame:
    """Fan-out: sink_a ⟵ env=prod, sink_b ⟵ team_tag=team-b, sink_default ⟵ all
    (multi-match copy semantics, Router.cpp:60-80)."""
    df = enriched(spark, sf_dir, **kw)
    rules = [
        RouteCondition(r["sink"], r["match_key"], r["match_value"]) for r in ROUTE_RULES
    ]
    out = Router(rules).apply(df)
    out = partition_for_sinks(out, keys=("source", "route_key"), salt_buckets=salt_buckets)
    return with_lineage(out)


def pipeline_aggregates(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    """Headline result: per-sink (events, tokens_total)."""
    r = routed(spark, sf_dir, **kw)
    return sink_aggregates(r).select(
        "sink", "events", F.col("tokens_total").cast("long").alias("tokens_total")
    )


def routed_rows(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    """Routed-row-set equality surface: one row per (sink, doc)."""
    r = routed(spark, sf_dir, **kw)
    return r.select("sink", "doc_id", "source", "route_key", "env", "team_tag")


def drop_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source discarded-event counts (≙ mDiscardedEventsTotal self-metric)."""
    seq = sequences_df(spark, sf_dir)
    inputs = seq.groupBy("source").agg(F.count(F.lit(1)).alias("input_events"))
    parsed = (
        parsed_events(spark, sf_dir, keep_unmatch=False)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("parsed_events"))
    )
    return (
        inputs.join(parsed, "source", "left")
        .select(
            "source",
            "input_events",
            F.coalesce("parsed_events", F.lit(0)).alias("parsed_events"),
            (F.col("input_events") - F.coalesce("parsed_events", F.lit(0))).alias("dropped"),
        )
        .orderBy("source")
    )
