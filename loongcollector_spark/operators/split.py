"""Event-cardinality operators (SURVEY.md §2.2): split one raw event into N
line events, sessionize lines into multiline records, merge adjacent events.

- SplitLogString      ≙ processor_split_log_string_native
  (core/plugin/processor/inner/ProcessorSplitLogStringNative.cpp:26-176) and
  the Go processor_split_log_string (plugins/processor/split/logstring:29-172)
- SplitMultiline      ≙ processor_split_multiline_log_string_native
  (core/plugin/processor/inner/ProcessorSplitMultilineLogStringNative.cpp:37-407;
  Multiline options core/file_server/MultilineOptions.h:40-52)
- MergeMultilineByFlag ≙ processor_merge_multiline_log_native MergeType=flag
  (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.cpp:34-385)

Spark mapping: explode/posexplode for the split; the multiline FSM becomes
sessionization — flag record-start lines, running-sum the flag over an ordered
window within the document, then group-concat. The window partitions by doc_id
(massively parallel — one doc's lines are tiny), so at 100 TB the shuffle keys
are fine-grained and skew-free.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .base import FIELDS, Operator, fget

LINE_NO_COL = "__line_no__"
FILE_OFFSET_KEY = "__file_offset__"


class UnmatchedTreatment:
    """MultilineOptions.h:32 UnmatchedContentTreatment."""

    DISCARD = "discard"
    SINGLE_LINE = "single_line"


@dataclass
class SplitLogString(Operator):
    """Split fields[source_key] by ``split_char`` into one event per line
    (one row → N rows). A single trailing separator does not produce an empty
    last event (the reference iterates line begins/ends). With
    ``enable_position_meta`` each line event carries its byte offset within the
    original blob under ``__file_offset__`` (SetPosition,
    ProcessorSplitLogStringNative.cpp:151), computed with an O(n) array fold —
    no shuffle."""

    source_key: str = "content"
    split_char: str = "\n"
    enable_position_meta: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        src = fget(self.source_key)
        parts = F.split(src, re.escape(self.split_char), -1)
        # drop ONE trailing empty element (blob ending in split_char)
        n = F.size(parts)
        parts = F.when(
            (n > 1) & (F.element_at(parts, -1) == ""), F.slice(parts, 1, n - 1)
        ).otherwise(parts)

        if self.enable_position_meta:
            sep_len = len(self.split_char)
            # running byte offsets: offsets[i] = sum(len(parts[j]) + sep_len, j<i)
            offsets = F.aggregate(
                parts,
                F.struct(
                    F.lit(0).cast("long").alias("off"),
                    F.array().cast("array<long>").alias("arr"),
                ),
                lambda acc, x: F.struct(
                    (acc.getField("off") + F.length(x) + sep_len).alias("off"),
                    F.concat(acc.getField("arr"), F.array(acc.getField("off"))).alias("arr"),
                ),
                lambda acc: acc.getField("arr"),
            )
            zipped = F.arrays_zip(parts.alias("line"), offsets.alias("off"))
            others = [c for c in df.columns if c != FIELDS]
            out = df.select(*others, F.col(FIELDS), F.posexplode(zipped).alias(LINE_NO_COL, "__z__"))
            new_fields = F.map_concat(
                F.map_filter(F.col(FIELDS), lambda k, v: k != F.lit(self.source_key)),
                F.create_map(
                    F.lit(self.source_key),
                    F.col("__z__").getField("line"),
                    F.lit(FILE_OFFSET_KEY),
                    F.col("__z__").getField("off").cast("string"),
                ),
            )
            return out.withColumn(FIELDS, new_fields).drop("__z__")

        others = [c for c in df.columns if c != FIELDS]
        out = df.select(*others, F.col(FIELDS), F.posexplode(parts).alias(LINE_NO_COL, "__line__"))
        new_fields = F.map_concat(
            F.map_filter(F.col(FIELDS), lambda k, v: k != F.lit(self.source_key)),
            F.create_map(F.lit(self.source_key), F.col("__line__")),
        )
        return out.withColumn(FIELDS, new_fields).drop("__line__")


def _record_ids(
    df: DataFrame,
    start_flag: Column,
    doc_col: str,
    order_col: str,
) -> DataFrame:
    """Sessionize: record_id = running count of start-flag lines up to and
    including this one, per document (SURVEY.md §2.2 mapping)."""
    w = Window.partitionBy(doc_col).orderBy(order_col)
    return df.withColumn("__rec__", F.sum(start_flag.cast("int")).over(w))


_ITEM = "struct<o:bigint,l:string>"
_REC = "struct<o:bigint,r:string>"


def _fsm_fold_records(
    df: DataFrame,
    mode: str,  # "se" (start+end) | "ce" (continue+end)
    start_pattern: str | None,
    continue_pattern: str | None,
    end_pattern: str,
    source_key: str,
    doc_col: str,
    order_col: str,
    joiner: str,
) -> tuple[DataFrame, DataFrame]:
    """Exact reference FSM for the two combos whose state is inherently
    sequential (a record's close depends on which line OPENED it, not on any
    prefix count): start+end and continue+end
    (ProcessorSplitMultilineLogStringNative.cpp:175-250). Notable semantics a
    split-at-start model gets wrong: a start line is never end-checked (no
    single-line 'START..END' records), an interior start inside an open
    record is plain content, an open record at group end is UNMATCHED (end
    pattern present), and a broken continue+end record unmatches ALL its
    lines.

    One JVM-side F.aggregate fold over the doc's ordered lines — the per-doc
    memory bound equals the reference's (it holds the whole event group).
    Returns (records, unmatched_line_keys): records as (doc, meta..., o,
    record); unmatched as (doc, order) keys for the caller to resolve
    against the original rows."""
    line = fget(source_key)
    empty_items = F.expr(f"CAST(array() AS array<{_ITEM}>)")
    empty_recs = F.expr(f"CAST(array() AS array<{_REC}>)")

    def acc(open_, start, cur, recs, unm):
        return F.struct(
            open_.alias("open"), start.cast("long").alias("start"),
            cur.alias("cur"), recs.alias("recs"), unm.alias("unm"),
        )

    def joined(items):
        return F.array_join(F.transform(items, lambda i: i.getField("l")), joiner)

    def step(a: Column, x: Column) -> Column:
        open_ = a.getField("open")
        start, cur = a.getField("start"), a.getField("cur")
        recs, unm = a.getField("recs"), a.getField("unm")
        e = x.getField("l").rlike(end_pattern)
        cur2 = F.concat(cur, F.array(x))
        closed = F.struct(start.alias("o"), joined(cur2).alias("r"))
        opened = acc(F.lit(True), x.getField("o"), F.array(x), recs, unm)
        unmatched_line = acc(open_, start, cur, recs, F.concat(unm, F.array(x)))
        if mode == "se":
            s = x.getField("l").rlike(start_pattern)
            return (
                # closed + start → open (the start line is NOT end-checked)
                F.when(~open_ & s, opened)
                .when(~open_, unmatched_line)
                # open + end → close the record (line included)
                .when(
                    e,
                    acc(F.lit(False), F.lit(-1), empty_items,
                        F.concat(recs, F.array(closed)), unm),
                )
                # open, not end (start or not) → plain content, wait
                .otherwise(acc(F.lit(True), start, cur2, recs, unm))
            )
        c = x.getField("l").rlike(continue_pattern)
        single = F.struct(x.getField("o").alias("o"), x.getField("l").alias("r"))
        return (
            F.when(~open_ & c, opened)
            # closed + end-match → 1-line record (go:186-191)
            .when(
                ~open_ & e,
                acc(F.lit(False), F.lit(-1), empty_items,
                    F.concat(recs, F.array(single)), unm),
            )
            .when(~open_, unmatched_line)
            .when(c, acc(F.lit(True), start, cur2, recs, unm))
            # open + non-continue: end decides — match closes, miss unmatches
            # the WHOLE record (go:204-227)
            .when(
                e,
                acc(F.lit(False), F.lit(-1), empty_items,
                    F.concat(recs, F.array(closed)), unm),
            )
            .otherwise(
                acc(F.lit(False), F.lit(-1), empty_items, recs, F.concat(unm, cur2))
            )
        )

    meta = [c for c in df.columns if c not in (FIELDS, order_col, doc_col)]
    per_doc = df.groupBy(doc_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).cast("long").alias("o"), line.alias("l")))
        ).alias("__lines__"),
        *[F.first(c).alias(c) for c in meta],
    )
    init = acc(F.lit(False), F.lit(-1), empty_items, empty_recs, empty_items)
    # open at group end → unmatched (an end pattern exists in both modes,
    # ProcessorSplitMultilineLogStringNative.cpp:262-270 analog)
    folded = per_doc.withColumn(
        "__fsm__",
        F.aggregate(
            "__lines__", init, step,
            lambda a: F.struct(
                a.getField("recs").alias("recs"),
                F.concat(a.getField("unm"), a.getField("cur")).alias("unm"),
            ),
        ),
    )
    records = folded.select(
        doc_col, *meta, F.explode("__fsm__.recs").alias("__r__")
    ).select(
        doc_col, *meta,
        F.col("__r__.o").alias(order_col),
        F.create_map(F.lit(source_key), F.col("__r__.r")).alias(FIELDS),
    )
    unmatched_keys = folded.select(
        doc_col, F.explode("__fsm__.unm").alias("__u__")
    ).select(doc_col, F.col("__u__.o").alias(order_col))
    return records, unmatched_keys


@dataclass
class SplitMultiline(Operator):
    """Multiline record assembly over line events — the reference's
    Start/Continue/End pattern FSM
    (ProcessorSplitMultilineLogStringNative.cpp:139-227; option combos per
    MultilineOptions.h:40-52):

    - ``start``:                 new record at each start-match
    - ``start`` + ``continue``:  only continue-matches may follow a start;
                                 other lines (and later lines of a broken
                                 record) are unmatched
    - ``start`` + ``end``:       record spans start..first end; lines after
                                 the end (before the next start) unmatched
    - ``continue`` + ``end``:    record = continue-matches closed by an end
    - ``end`` only:              record = everything up to each end-match

    Lines not belonging to any record are unmatched: DISCARD drops them,
    SINGLE_LINE emits each as its own record (UnmatchedContentTreatment,
    MultilineOptions.h:32).

    Input: one row per line with ``doc_col`` + ``order_col`` (e.g. the output
    of SplitLogString). Output: one row per record — doc/meta columns,
    ``fields[source_key]`` = '\\n'-joined record text, record's first
    ``order_col`` as its line_no."""

    start_pattern: str | None = None
    source_key: str = "content"
    doc_col: str = "doc_id"
    order_col: str = LINE_NO_COL
    continue_pattern: str | None = None
    end_pattern: str | None = None
    unmatched: str = UnmatchedTreatment.DISCARD
    joiner: str = "\n"

    def apply(self, df: DataFrame) -> DataFrame:
        if self.start_pattern is None and self.end_pattern is None:
            raise ValueError("need start_pattern and/or end_pattern")
        line = fget(self.source_key)

        mode = None
        if self.end_pattern is not None and self.continue_pattern is None and self.start_pattern is not None:
            mode = "se"
        elif self.end_pattern is not None and self.continue_pattern is not None and self.start_pattern is None:
            mode = "ce"
        if mode is not None:
            records, unmatched_keys = _fsm_fold_records(
                df, mode, self.start_pattern, self.continue_pattern,
                self.end_pattern, self.source_key, self.doc_col,
                self.order_col, self.joiner,
            )
            if self.unmatched == UnmatchedTreatment.SINGLE_LINE:
                singles = df.join(
                    unmatched_keys, [self.doc_col, self.order_col], "left_semi"
                )
                records = records.unionByName(singles, allowMissingColumns=True)
            return records

        if self.start_pattern is not None:
            start = line.rlike(self.start_pattern)
            df = _record_ids(df, start, self.doc_col, self.order_col)
            wrec = Window.partitionBy(self.doc_col, "__rec__").orderBy(self.order_col)
            unmatched = F.col("__rec__") == 0
            if self.end_pattern is not None:
                # lines strictly after the first end-match are unmatched
                ended = F.lag(
                    F.sum(line.rlike(self.end_pattern).cast("int")).over(wrec), 1, 0
                ).over(wrec)
                unmatched = unmatched | (ended > 0)
            elif self.continue_pattern is not None:
                # a non-start non-continue line breaks the record: it and
                # everything after it (until the next start) are unmatched
                bad = (~start & ~line.rlike(self.continue_pattern)).cast("int")
                unmatched = unmatched | (F.sum(bad).over(wrec) > 0)
            df = df.withColumn("__unmatched__", unmatched)
        else:
            # end-only / continue+end: records close AT each end-match —
            # rec id = count of end-matches strictly before this line
            end = line.rlike(self.end_pattern)
            w = Window.partitionBy(self.doc_col).orderBy(self.order_col)
            prior_ends = F.sum(end.cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
            total_ends = F.sum(end.cast("int")).over(
                Window.partitionBy(self.doc_col)
            )
            df = df.withColumn("__rec__", F.coalesce(prior_ends, F.lit(0)) + 1)
            # the tail after the last end never closes → unmatched
            unmatched = F.col("__rec__") > total_ends
            if self.continue_pattern is not None:
                unmatched = unmatched | (
                    ~line.rlike(self.continue_pattern) & ~end
                )
            df = df.withColumn("__unmatched__", unmatched)

        matched = df.filter(~F.col("__unmatched__"))
        meta = [
            c
            for c in df.columns
            if c not in (FIELDS, self.order_col, "__rec__", "__unmatched__", self.doc_col)
        ]
        grouped = (
            matched.groupBy(self.doc_col, "__rec__")
            .agg(
                F.min(self.order_col).alias(self.order_col),
                F.concat_ws(
                    self.joiner,
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col(self.order_col).alias("o"), line.alias("l")))
                        ),
                        lambda s: s.getField("l"),
                    ),
                ).alias("__record__"),
                *[F.first(c).alias(c) for c in meta],
            )
            .drop("__rec__")
        )
        out = grouped.withColumn(
            FIELDS, F.create_map(F.lit(self.source_key), F.col("__record__"))
        ).drop("__record__")

        if self.unmatched == UnmatchedTreatment.SINGLE_LINE:
            singles = df.filter(F.col("__unmatched__")).drop("__rec__", "__unmatched__")
            out = out.unionByName(singles, allowMissingColumns=True)
        return out


@dataclass
class MergeMultilineByFlag(Operator):
    """MergeType=flag (ProcessorMergeMultilineLogNative.cpp MergeLogsByFlag:113):
    container runtime partial-log merging — events whose ``flag_key`` field is
    'P' (partial) are joined with following events until an 'F' (full) event
    closes the record. Record boundary = previous event was 'F' (or first)."""

    flag_key: str = "_part_"
    source_key: str = "content"
    doc_col: str = "doc_id"
    order_col: str = LINE_NO_COL
    joiner: str = ""

    def apply(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.doc_col).orderBy(self.order_col)
        prev_full = F.lag(fget(self.flag_key) == "F", 1, True).over(w)
        df = _record_ids(df, prev_full, self.doc_col, self.order_col)
        line = fget(self.source_key)
        meta = [
            c for c in df.columns if c not in (FIELDS, self.order_col, "__rec__", self.doc_col)
        ]
        grouped = (
            df.groupBy(self.doc_col, "__rec__")
            .agg(
                F.min(self.order_col).alias(self.order_col),
                F.concat_ws(
                    self.joiner,
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col(self.order_col).alias("o"), line.alias("l")))
                        ),
                        lambda s: s.getField("l"),
                    ),
                ).alias("__record__"),
                *[F.first(c).alias(c) for c in meta],
            )
            .drop("__rec__")
        )
        return grouped.withColumn(
            FIELDS, F.create_map(F.lit(self.source_key), F.col("__record__"))
        ).drop("__record__")


def command_output_logs(
    df: DataFrame,
    script_content: str,
    line_split_sep: str = "",
    stdout_col: str = "stdout",
) -> DataFrame:
    """input_command stdout conversion (plugins/input/command/
    input_command.go:207-231): split the script's stdout by LineSplitSep
    (empty = one log for the whole output), each piece becomes a log with
    ``content`` + the ``script_md5`` of the configured ScriptContent. The
    script storage/exec/suid machinery is agent transport."""
    import hashlib

    md5 = hashlib.md5(script_content.encode("utf-8")).hexdigest()
    passthrough = [c for c in df.columns if c != stdout_col]
    # strings.Split is LITERAL; F.split takes a regex → escape
    pieces = (
        F.split(F.col(stdout_col), re.escape(line_split_sep), -1)
        if line_split_sep
        else F.array(F.col(stdout_col))
    )
    return df.select(
        *passthrough, F.explode(pieces).alias("__piece__")
    ).select(
        *passthrough,
        F.create_map(
            F.lit("content"), F.col("__piece__"),
            F.lit("script_md5"), F.lit(md5),
        ).alias(FIELDS),
    )
