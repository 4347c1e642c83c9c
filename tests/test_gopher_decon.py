"""Gopher-style repetition measures + n-gram decontamination
(dataops/text.gopher_repetition, decontaminate)."""

import pyspark.sql.functions as F
import pytest

from loongcollector_spark.dataops import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_all_same_word(spark):
    out = text.gopher_repetition(_docs(spark, [(1, "a a a a")])).collect()[0]
    assert out.n_words == 4
    assert out.top_word_share == 1.0
    # grams: ["a a"]*3 -> 1 distinct of 3
    assert out.dup_2gram_frac == round(1 - 1 / 3, 4)
    assert out.top_2gram_share == 1.0
    assert out.repetition_ok == 0


def test_repetition_all_distinct(spark):
    out = text.gopher_repetition(_docs(spark, [(1, "a b c d e")])).collect()[0]
    assert out.top_word_share == 0.2
    assert out.dup_2gram_frac == 0.0
    assert out.dup_3gram_frac == 0.0
    assert out.top_2gram_share == 0.25
    assert out.repetition_ok == 0  # top shares exceed thresholds on tiny docs


def test_repetition_single_word_empty_grams(spark):
    out = text.gopher_repetition(_docs(spark, [(1, "solo")])).collect()[0]
    assert out.n_words == 1
    assert out.top_word_share == 1.0
    # no 2/3-grams: fractions defined as 0.0, not 1.0
    assert out.dup_2gram_frac == 0.0
    assert out.dup_3gram_frac == 0.0
    assert out.top_2gram_share == 0.0


def test_max_multiplicity_fold(spark):
    df = spark.range(1).select(
        text.max_multiplicity(F.array(*[F.lit(x) for x in "babcbb"])).alias("m")
    )
    assert df.collect()[0].m == 4


def test_decontaminate_flags_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "w x y z q"),  # shares 3-gram "w x y" with eval
            (2, "p q r s t"),  # no overlap
            (3, "ab"),  # <3 words: zero grams, kept
        ],
    )
    ev = _docs(spark, [(100, "m n w x y k")])
    got = {r.doc_id: r for r in text.decontaminate(train, ev).collect()}
    assert got[1].contaminated == 1 and got[1].overlap_grams == 1
    assert got[2].contaminated == 0 and got[2].overlap_grams == 0
    assert got[3].contaminated == 0 and got[3].n_grams == 0


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same overlapping 3-gram repeated in a train doc counts once
    train = _docs(spark, [(1, "w x y w x y")])
    ev = _docs(spark, [(9, "w x y")])
    r = text.decontaminate(train, ev).collect()[0]
    assert r.overlap_grams == 1 and r.contaminated == 1
