"""Streaming pipeline: the reference is an always-on agent (arrival-time
processing, no event-time semantics — SURVEY.md §2.9); the Spark analog runs
the SAME operator chain (all Column expressions are streaming-compatible) over
``readStream`` with ``Trigger.AvailableNow`` for batch-catchup or continuous
micro-batches for tailing.

Watermark + windowed per-sink counts are the streaming analog of the batch
sink_aggregates; the reference's "history timeout discard"
(ProcessorParseTimestampNative.cpp:125-178) maps to the watermark dropping
late rows.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (the agent's 'input_file'
    tailing analog: new files are discovered per micro-batch;
    maxFilesPerTrigger is the rate-limit knob ≙ FlusherRunner rate limiting)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    process: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """Drain everything currently available through foreachBatch and stop —
    exactly-once per micro-batch via the streaming checkpoint (the WAL/commit
    log plays the role of the reference's range checkpoints)."""
    return (
        df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_rate_limit(
    df: DataFrame,
    key_cols: list[str],
    limit: int,
    output_schema,
):
    """Stateful streaming rate limit — the closest Spark analog of the
    reference's token bucket (plugins/processor/ratelimit/token_bucket.go:
    83-110): per distinct key-combo, pass rows until the running count
    reaches ``limit``; state (the count) persists ACROSS micro-batches via
    the state store, exactly like the agent's in-memory bucket persists
    across poll cycles. Arrival-order semantics (the documented divergence:
    no wall-clock refill — use windowed_sink_counts/RateLimit for event-time
    windows).

    Implemented with ``applyInPandasWithState`` (Arrow-batched custom
    stateful operator)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType([StructField("count", LongType())])

    def fn(key, pdf_iter, state: GroupState):
        (count,) = state.get if state.exists else (0,)
        for pdf in pdf_iter:
            remaining = limit - count
            if remaining <= 0:
                continue
            out = pdf.iloc[:remaining]
            count += len(out)
            if len(out):
                yield out
        state.update((count,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_merge_by_flag(
    df: DataFrame,
    doc_col: str = "doc_id",
    order_col: str = "line_no",
    content_col: str = "content",
    flag_col: str = "flag",
):
    """Streaming multiline merge across micro-batch boundaries — the
    streaming analog of MergeMultilineByFlag (container partial-log 'P'/'F'
    merging, ProcessorMergeMultilineLogNative.cpp MergeLogsByFlag:113).

    The agent buffers a partial record until the closing 'F' line arrives —
    which may be in a LATER read. Here that buffer is keyed state: per doc,
    pending partial content persists in the state store across micro-batches
    and is emitted once completed. Rows within a batch are processed in
    ``order_col`` order.

    Output schema: (doc, order of first line, merged content)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(doc_col, StringType()),
            StructField("record_start", LongType()),
            StructField("record", StringType()),
        ]
    )
    state_schema = StructType(
        [StructField("pending", StringType()), StructField("start", LongType())]
    )

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        pending, start = state.get if state.exists else ("", -1)
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col)
            for _, row in pdf.iterrows():
                pending += row[content_col]
                if start < 0:
                    start = int(row[order_col])
                if row[flag_col] == "F":
                    out_rows.append((key[0], start, pending))
                    pending, start = "", -1
        state.update((pending, start))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[doc_col, "record_start", "record"])

    return df.groupBy(doc_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_merge_by_regex(
    df: DataFrame,
    start_pattern: str | None = None,
    continue_pattern: str | None = None,
    end_pattern: str | None = None,
    unmatched: str = "discard",
    doc_col: str = "doc_id",
    order_col: str = "line_no",
    content_col: str = "content",
):
    """Streaming multiline merge by Start/Continue/End regexes across
    micro-batch boundaries — the streaming analog of MergeLogsByRegex
    (ProcessorMergeMultilineLogNative.cpp:161-325; same pattern combos as the
    batch SplitMultiline: start / start+continue / start+end / continue+end /
    end).

    The agent buffers an open record until a closing line arrives — possibly
    in a later file read. Here the open record is keyed state per doc:
    (in_partial, pending joined lines, first line_no), persisted in the state
    store across micro-batches; records are emitted when the FSM closes
    them. Rows within a batch are processed in ``order_col`` order (a shard's
    tailed lines arrive in order; cross-batch order is the file order, as in
    the agent). Unlike the batch operator there is no end-of-input flush —
    an open record simply waits for the next micro-batch.

    ``unmatched``: 'discard' drops unmatched lines, 'single_line' emits each
    as its own record (UnmatchedContentTreatment, MultilineOptions.h:32).

    Output schema: (doc, record_start, record)."""
    import re as _re

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if start_pattern is None and continue_pattern is None and end_pattern is None:
        raise ValueError("need at least one of start/continue/end pattern")
    start_rx = _re.compile(start_pattern) if start_pattern else None
    cont_rx = _re.compile(continue_pattern) if continue_pattern else None
    end_rx = _re.compile(end_pattern) if end_pattern else None
    single_line = unmatched == "single_line"

    out_schema = StructType(
        [
            StructField(doc_col, StringType()),
            StructField("record_start", LongType()),
            StructField("record", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("in_partial", LongType()),
            StructField("pending", StringType()),
            StructField("start", LongType()),
        ]
    )
    # if only the end pattern is given the FSM sticks to the partial state
    # (MergeLogsByRegex:175-178)
    end_only = end_rx is not None and start_rx is None and cont_rx is None

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            in_partial, pending, start = state.get
            in_partial = bool(in_partial)
            lines = pending.split("\n") if pending else []
        else:
            in_partial, lines, start = end_only, [], -1
        out_rows = []

        def emit(ls, first):
            if ls:
                out_rows.append((key[0], first, "\n".join(ls)))

        def unmatch(line, no):
            if single_line:
                out_rows.append((key[0], no, line))

        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col)
            for _, row in pdf.iterrows():
                line, no = row[content_col], int(row[order_col])
                if not in_partial:
                    rx = start_rx if start_rx is not None else cont_rx
                    if rx.search(line):
                        lines, start, in_partial = [line], no, True
                    elif end_rx is not None and start_rx is None and cont_rx is not None and end_rx.search(line):
                        # continue+end: line matches end directly (go straight
                        # to a 1-line record, MergeLogsByRegex:230-239)
                        emit([line], no)
                    else:
                        unmatch(line, no)
                elif cont_rx is not None and cont_rx.search(line):
                    lines.append(line)
                elif end_rx is not None:
                    lines.append(line)
                    if cont_rx is not None:
                        # continue+end: end decides match vs unmatch
                        if end_rx.search(line):
                            emit(lines, start)
                        else:
                            for j, l in enumerate(lines):
                                unmatch(l, start + j)
                        lines, in_partial = [], False
                    elif end_rx.search(line):
                        # start+end or end-only
                        emit(lines, start)
                        lines, start = [], -1
                        if start_rx is not None:
                            in_partial = False
                        # end-only: stay partial, next record starts
                    # else: wait for the closing line
                elif cont_rx is None:
                    # start-only
                    if not start_rx.search(line):
                        lines.append(line)
                    else:
                        emit(lines, start)
                        lines, start = [line], no
                else:
                    # start+continue: record closes on the non-continue line
                    emit(lines, start)
                    if start_rx.search(line):
                        lines, start = [line], no
                    else:
                        unmatch(line, no)
                        lines, in_partial = [], False
        state.update((int(in_partial), "\n".join(lines), start))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[doc_col, "record_start", "record"])

    return df.groupBy(doc_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_sink_counts(
    routed: DataFrame,
    time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    sink_col: str = "sink",
) -> DataFrame:
    """Event-time windowed per-sink aggregates with late-data drop: the
    streaming version of aggregate.sink_aggregates. Works on a streaming
    DataFrame (append output mode once the watermark passes)."""
    return (
        routed.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"), F.col(sink_col))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("n_tok").alias("tokens_total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            sink_col,
            "events",
            "tokens_total",
        )
    )
