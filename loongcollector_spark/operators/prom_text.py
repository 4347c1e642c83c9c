"""Prometheus text-exposition parsing — processor_prom_parse_metric_native.

Reference: core/plugin/processor/inner/ProcessorPromParseMetricNative.cpp:27-68
(per-raw-event ParseLine → MetricEvent, failures dropped, ``__name__`` tag
stamped) over core/prometheus/labels/TextParser.cpp:69-320 (the line FSM).

Spark-first: the whole FSM grammar is one anchored regex + a single-pass
group extraction (Column expressions, codegen) — no Python. Semantics pinned
by TextParserUnittest.cpp goldens:

- leading whitespace skipped; ``#`` comments / empty / malformed lines fail;
- name ``[a-zA-Z_:][a-zA-Z0-9_:]*``; optional ``{k="v",...}`` block with
  spaces anywhere, trailing comma ok, empty values kept;
- label values unescape ``\\\\``, ``\\"``, ``\\n``; any other backslash is
  kept verbatim ("incorrectly escaped backslash ... must be supported").
  (Divergence, documented: TextParser.cpp:176-190 classifies every escape by
  the value's SECOND character — ``lPos + 1`` — so ``x\\ny`` decodes as
  ``xny`` there; we implement the per-escape classification the goldens and
  upstream Prometheus define.)
- value accepts floats, scientific notation, ``±Inf(inity)``/``NaN`` in any
  case (OpenMetrics);
- optional timestamp: < 2^31 is SECONDS (×1000), else milliseconds
  (TextParser.cpp:296-301); with honor_timestamps the resulting seconds must
  be ≥ 1e9 or the line fails; without, the default scrape timestamp is used.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..models import EVENT_TYPE_COL, METRIC, MULTI_VALUE_TYPE
from .common import flet

NAME_RX = r"[a-zA-Z_:][a-zA-Z0-9_:]*"
LNAME_RX = r"[a-zA-Z_][a-zA-Z0-9_]*"
# UNROLLED-LOOP form (not `(?:\\.|[^"\\])*`): java regex recurses per
# iteration of an alternation-under-quantifier, so a ~100 KB label value
# would StackOverflow the executor JVM (see operators/influx.py note /
# tests/test_adversarial.py). Same language, iterative char-class loops.
QVAL_RX = r'"[^"\\]*(?:\\.[^"\\]*){0,200}"'
_PAIR_NC = rf"{LNAME_RX}\s*=\s*{QVAL_RX}"
# label-pair repetition capped: `(?:PAIR)*` recurses once per PAIR in java
# regex — 128 pairs ≈ bounded stack, far beyond any real exposition line
LBLOCK_RX = rf"\{{\s*(?:{_PAIR_NC}(?:\s*,\s*{_PAIR_NC}){{0,127}}\s*(?:,\s*)?)?\}}"
# groups: 1 = name, 2 = label block, 3 = value token, 4 = timestamp token
FULL_RX = (
    rf"^({NAME_RX})[ \t]*({LBLOCK_RX})?[ \t]*([^ \t#]+)"
    rf"(?:[ \t]+([^ \t#]+))?[ \t]*(?:#.*)?$"
)

_SENTINEL = "\x02"


def unescape_label_value(v: Column) -> Column:
    """Prom label-value unescape: \\\\ → \\, \\" → ", \\n → newline, unknown
    escapes kept. Sentinel trick keeps the passes left-to-right-correct."""
    v = F.replace(v, F.lit("\\\\"), F.lit(_SENTINEL))
    v = F.replace(v, F.lit('\\"'), F.lit('"'))
    v = F.replace(v, F.lit("\\n"), F.lit("\n"))
    return F.replace(v, F.lit(_SENTINEL), F.lit("\\"))


def prom_value(tok: Column) -> Column:
    """Sample-value text → double (incl. OpenMetrics Inf/NaN words); NULL =
    invalid."""
    low = F.lower(tok)
    return (
        F.when(low.rlike(r"^\+?(inf|infinity)$"), F.lit(float("inf")))
        .when(low.rlike(r"^-(inf|infinity)$"), F.lit(float("-inf")))
        .when(low == "nan", F.lit(float("nan")))
        .otherwise(tok.try_cast("double"))
    )


@dataclass
class PromTextParser:
    """Raw exposition lines (``content_col``) → MetricEvent frame rows
    (metric_name, tags, value, values=NULL, timestamp, ns,
    __event_type__='metric'); unparseable lines are DROPPED
    (ProcessorPromParseMetricNative::ProcessEvent only keeps successes)."""

    content_col: str = "content"
    honor_timestamps: bool = True
    default_timestamp_ms: int = 0
    include_name_tag: bool = True  # processor stamps tags[__name__]=name

    def apply(self, df: DataFrame) -> DataFrame:
        src = F.col(self.content_col)
        trimmed = F.regexp_replace(src, r"^[ \t]+", "")
        matched = trimmed.rlike(FULL_RX)
        sep = "\x01"
        arr = F.split(
            F.regexp_replace(trimmed, FULL_RX, f"$1{sep}$2{sep}$3{sep}$4"), sep, -1
        )

        def build(a: Column) -> Column:
            name, lb, valtok, tstok = (F.element_at(a, i) for i in range(1, 5))
            keys = F.regexp_extract_all(
                lb, F.lit(rf"({LNAME_RX})\s*=\s*{QVAL_RX}"), 1
            )
            quoted = F.regexp_extract_all(
                lb, F.lit(rf"{LNAME_RX}\s*=\s*({QVAL_RX})"), 1
            )
            vals = F.transform(
                quoted,
                lambda q: unescape_label_value(q.substr(F.lit(2), F.length(q) - 2)),
            )
            tags = F.map_from_arrays(keys, vals)
            if self.include_name_tag:
                tags = F.map_concat(tags, F.create_map(F.lit("__name__"), name))
            value = prom_value(valtok)
            ts_num = tstok.try_cast("double")
            # < 2^31 → seconds → ms (TextParser.cpp:296-301); > 2^63 overflow
            ms = F.when(ts_num < F.lit(2.0**31), ts_num * 1000).otherwise(ts_num)
            # TextParser.cpp:300-304 fails only the overflowing LINE; with ANSI
            # mode on (Spark 4 default) an unguarded cast of e.g. 1e300 to
            # long/decimal(25,0) would abort the whole job, so ts_sec/ts_ns are
            # computed only inside the in-range branch (try_cast as backstop).
            ms_ok = (ms <= F.lit(2.0**63)) & (ms >= F.lit(-(2.0**63)))
            ts_sec = F.when(ms_ok, F.floor(ms / 1000)).try_cast("long")
            ts_ns = (
                F.when(ms_ok, ms).try_cast("decimal(25,0)") % 1000
            ).try_cast("long") * 1000000
            has_ts = (tstok != "") & F.lit(self.honor_timestamps)
            default_sec = F.lit(self.default_timestamp_ms // 1000).cast("long")
            default_ns = F.lit(self.default_timestamp_ms % 1000 * 1000000).cast("long")
            if not self.honor_timestamps:
                # honor_timestamps=false never even scans the tail
                # (HandleSampleValue: `|| !mHonorTimestamps` → Done)
                ts_valid = F.lit(True)
            else:
                ts_valid = F.when(tstok == "", F.lit(True)).otherwise(
                    ts_num.isNotNull() & ms_ok & (ts_sec >= 1000000000)
                )
            return F.struct(
                name.alias("metric_name"),
                tags.alias("tags"),
                value.alias("value"),
                F.when(has_ts, ts_sec).otherwise(default_sec).alias("timestamp"),
                F.when(has_ts, ts_ns).otherwise(default_ns).alias("ns"),
                (value.isNotNull() & ts_valid).alias("ok"),
            )

        parsed = flet(arr, build)
        keep = [c for c in df.columns if c != self.content_col]
        out = (
            df.withColumn("__m__", F.when(matched, parsed))
            .filter(F.col("__m__").isNotNull() & F.col("__m__.ok"))
            .select(
                *keep,
                F.col("__m__.metric_name").alias("metric_name"),
                F.col("__m__.tags").alias("tags"),
                F.col("__m__.value").alias("value"),
                F.lit(None).cast(MULTI_VALUE_TYPE).alias("values"),
                F.col("__m__.timestamp").alias("timestamp"),
                F.col("__m__.ns").alias("ns"),
                F.lit(METRIC).alias(EVENT_TYPE_COL),
            )
        )
        return out
