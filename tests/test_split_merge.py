"""Cardinality operators (SURVEY.md §2.2): split-by-line, multiline
sessionization, flag-based merge — golden cases modeled on
core/unittest/processor/ProcessorSplitLogStringNativeUnittest /
ProcessorSplitMultilineLogStringNativeUnittest /
ProcessorMergeMultilineLogNativeUnittest."""

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS, fget, to_events
from loongcollector_spark.operators.split import (
    LINE_NO_COL,
    FILE_OFFSET_KEY,
    MergeMultilineByFlag,
    SplitLogString,
    SplitMultiline,
    UnmatchedTreatment,
)


def _blob(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    return to_events(df)


def _collect_lines(df):
    return sorted(
        (r["doc_id"], r[LINE_NO_COL], r[FIELDS].get("content"), r[FIELDS].get(FILE_OFFSET_KEY))
        for r in df.collect()
    )


def test_split_log_string_basic(spark):
    out = SplitLogString().apply(_blob(spark, [("d1", "a\nbb\nccc")]))
    assert _collect_lines(out) == [
        ("d1", 0, "a", None),
        ("d1", 1, "bb", None),
        ("d1", 2, "ccc", None),
    ]


def test_split_log_string_trailing_newline(spark):
    out = SplitLogString().apply(_blob(spark, [("d1", "a\nb\n")]))
    assert [x[2] for x in _collect_lines(out)] == ["a", "b"]


def test_split_log_string_position_meta(spark):
    out = SplitLogString(enable_position_meta=True).apply(_blob(spark, [("d1", "a\nbb\nccc")]))
    assert _collect_lines(out) == [
        ("d1", 0, "a", "0"),
        ("d1", 1, "bb", "2"),
        ("d1", 2, "ccc", "5"),
    ]


def test_split_log_string_preserves_other_fields(spark):
    df = spark.createDataFrame([("d1", "x\ny")], ["doc_id", "content"])
    ev = to_events(df).withColumn(
        FIELDS, F.map_concat(FIELDS, F.create_map(F.lit("tag"), F.lit("t1")))
    )
    out = SplitLogString().apply(ev)
    rows = out.collect()
    assert all(r[FIELDS]["tag"] == "t1" for r in rows)
    assert sorted(r[FIELDS]["content"] for r in rows) == ["x", "y"]


def _lines(spark, doc_lines):
    rows = [(d, i, line) for d, lines in doc_lines for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, ["doc_id", LINE_NO_COL, "content"])
    return to_events(df)


def test_multiline_start_pattern(spark):
    ev = _lines(
        spark,
        [("d1", ["ERROR boom", "  at f1", "  at f2", "ERROR bam", "  at g1"])],
    )
    out = SplitMultiline(start_pattern=r"ERROR.*").apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["ERROR bam\n  at g1", "ERROR boom\n  at f1\n  at f2"]


def test_multiline_unmatched_discard_vs_single_line(spark):
    ev = _lines(spark, [("d1", ["orphan1", "ERROR x", "  at f"])])
    d = SplitMultiline(start_pattern=r"ERROR.*").apply(ev)
    assert sorted(r[FIELDS]["content"] for r in d.collect()) == ["ERROR x\n  at f"]
    s = SplitMultiline(
        start_pattern=r"ERROR.*", unmatched=UnmatchedTreatment.SINGLE_LINE
    ).apply(ev)
    assert sorted(r[FIELDS]["content"] for r in s.collect()) == ["ERROR x\n  at f", "orphan1"]


def test_multiline_start_end_pattern(spark):
    ev = _lines(
        spark,
        [("d1", ["BEGIN", "body1", "END", "junk", "BEGIN", "body2", "END"])],
    )
    out = SplitMultiline(start_pattern=r"BEGIN", end_pattern=r"END").apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["BEGIN\nbody1\nEND", "BEGIN\nbody2\nEND"]


def test_multiline_start_continue_pattern(spark):
    ev = _lines(
        spark,
        [("d1", ["ERROR x", " at f1", "orphan", " at f2", "ERROR y", " at g1"])],
    )
    out = SplitMultiline(start_pattern=r"ERROR.*", continue_pattern=r" at .*").apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    # 'orphan' breaks the first record; ' at f2' after the break is unmatched
    assert recs == ["ERROR x\n at f1", "ERROR y\n at g1"]


def test_multiline_end_only(spark):
    ev = _lines(spark, [("d1", ["a", "b", "END", "c", "END", "tail"])])
    out = SplitMultiline(end_pattern=r"END").apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["a\nb\nEND", "c\nEND"]  # 'tail' unmatched → discarded


def test_multiline_continue_end(spark):
    ev = _lines(
        spark,
        [("d1", [" part1", " part2", "DONE", "noise", " p3", "DONE"])],
    )
    out = SplitMultiline(continue_pattern=r" .*", end_pattern=r"DONE").apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == [" p3\nDONE", " part1\n part2\nDONE"]


def test_multiline_end_only_single_line_unmatched(spark):
    ev = _lines(spark, [("d1", ["a", "END", "tail"])])
    out = SplitMultiline(
        end_pattern=r"END", unmatched=UnmatchedTreatment.SINGLE_LINE
    ).apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["a\nEND", "tail"]


def test_merge_by_flag(spark):
    rows = [
        ("d1", 0, "par", "P"),
        ("d1", 1, "tial", "P"),
        ("d1", 2, " line", "F"),
        ("d1", 3, "whole", "F"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", LINE_NO_COL, "content", "_part_"])
    ev = df.select(
        "doc_id",
        LINE_NO_COL,
        F.create_map(
            F.lit("content"), F.col("content"), F.lit("_part_"), F.col("_part_")
        ).alias(FIELDS),
    )
    out = MergeMultilineByFlag().apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["partial line", "whole"]


def test_split_then_sessionize_roundtrip(spark):
    blob = "ERROR first\n  at a\nERROR second\n  at b\n  at c"
    ev = _blob(spark, [("d1", blob)])
    lines = SplitLogString().apply(ev)
    recs = SplitMultiline(start_pattern=r"ERROR.*").apply(lines)
    joined = sorted(r[FIELDS]["content"] for r in recs.collect())
    assert joined == ["ERROR first\n  at a", "ERROR second\n  at b\n  at c"]


def test_multiline_begin_end_reference_goldens(spark):
    """TestLogSplitWithBeginEnd (ProcessorSplitMultilineLogStringNativeUnittest)
    exact cases: a start with no end is DISCARDED at group end (not emitted);
    an interior start inside an open record is plain content; a start line is
    never end-checked against itself."""
    # case: unmatch + start + unmatch -> 0 records (the open record dies)
    ev = _lines(spark, [("d1", ["junk", "BEGIN x", "junk2"])])
    out = SplitMultiline(start_pattern=r"^BEGIN", end_pattern=r"^END").apply(ev)
    assert out.collect() == []

    # case: unmatch + start + end + unmatch -> exactly the BEGIN..END record
    ev = _lines(spark, [("d1", ["junk", "BEGIN x", "END y", "junk2"])])
    out = SplitMultiline(start_pattern=r"^BEGIN", end_pattern=r"^END").apply(ev)
    recs = [r[FIELDS]["content"] for r in out.collect()]
    assert recs == ["BEGIN x\nEND y"]

    # interior BEGIN is content, not a new record
    ev = _lines(spark, [("d1", ["BEGIN a", "BEGIN b", "END c"])])
    out = SplitMultiline(start_pattern=r"^BEGIN", end_pattern=r"^END").apply(ev)
    recs = [r[FIELDS]["content"] for r in out.collect()]
    assert recs == ["BEGIN a\nBEGIN b\nEND c"]

    # a line matching both start and end does NOT self-close
    ev = _lines(spark, [("d1", ["BEGIN mid END", "tail END", "BEGIN solo END"])])
    out = SplitMultiline(start_pattern=r"^BEGIN", end_pattern=r"END$").apply(ev)
    recs = [r[FIELDS]["content"] for r in out.collect()]
    assert recs == ["BEGIN mid END\ntail END"]  # the trailing solo stays open

    # single_line treatment surfaces the dropped lines as their own records
    ev = _lines(spark, [("d1", ["junk", "BEGIN x", "junk2"])])
    out = SplitMultiline(
        start_pattern=r"^BEGIN", end_pattern=r"^END",
        unmatched=UnmatchedTreatment.SINGLE_LINE,
    ).apply(ev)
    recs = sorted(r[FIELDS]["content"] for r in out.collect())
    assert recs == ["BEGIN x", "junk", "junk2"]


def test_multiline_continue_end_broken_record_unmatches_all(spark):
    """continue+end: a record broken by a non-continue non-end line unmatches
    ALL its lines (HandleUnmatchLogs begin..cur,
    ProcessorSplitMultilineLogStringNative.cpp:215-227)."""
    ev = _lines(
        spark, [("d1", [" c1", "breaker", " c2", "fin DONE", "DONE"])]
    )
    out = SplitMultiline(continue_pattern=r"^ ", end_pattern=r"DONE$").apply(ev)
    recs = [r[FIELDS]["content"] for r in out.collect()]
    # ' c1'+'breaker' all unmatched (discarded); ' c2'+'fin DONE' record;
    # lone 'DONE' from closed state is its own record
    assert sorted(recs) == [" c2\nfin DONE", "DONE"]

    out2 = SplitMultiline(
        continue_pattern=r"^ ", end_pattern=r"DONE$",
        unmatched=UnmatchedTreatment.SINGLE_LINE,
    ).apply(ev)
    recs2 = sorted(r[FIELDS]["content"] for r in out2.collect())
    assert recs2 == [" c1", " c2\nfin DONE", "DONE", "breaker"]


def test_command_output_logs(spark):
    """input_command stdout conversion (input_command.go:207-231)."""
    import hashlib

    from loongcollector_spark.operators.split import command_output_logs

    df = spark.createDataFrame([(1, "a||b||"), (2, "solo")], "i long, stdout string")
    out = command_output_logs(df, "echo hi", line_split_sep="||")
    rows = [(r["i"], dict(r["fields"])) for r in out.collect()]
    md5 = hashlib.md5(b"echo hi").hexdigest()
    # literal split keeps trailing empties (strings.Split semantics)
    assert [(i, f["content"]) for i, f in rows] == [
        (1, "a"), (1, "b"), (1, ""), (2, "solo")
    ]
    assert all(f["script_md5"] == md5 for _, f in rows)
    # no separator configured → whole stdout as one log
    one = command_output_logs(
        spark.createDataFrame([(3, "x||y")], "i long, stdout string"), "s"
    ).collect()
    assert dict(one[0]["fields"])["content"] == "x||y"
