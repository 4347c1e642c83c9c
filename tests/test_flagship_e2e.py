"""Flagship end-to-end behaviors: per-sink resumable writes, routed-row
equality across paths, skew salting, Arrow/JVM parity, Arrow desensitize."""

import pyspark.sql.functions as F
import pytest

from loongcollector_spark import flagship
from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.transforms import Desensitize, DesensitizeArrow
from loongcollector_spark.plans.checkpoint import Manifest, resumable_sink_write
from loongcollector_spark.synth import sequences_df


def test_arrow_and_jvm_paths_identical(spark, sf_dir):
    a = flagship.routed_rows(spark, sf_dir, arrow=True).collect()
    b = flagship.routed_rows(spark, sf_dir, arrow=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fused_equals_branched(spark, sf_dir):
    seq = sequences_df(spark, sf_dir)
    a = flagship.parsed_events_from(seq).select("doc_id", "source", FIELDS).collect()
    b = flagship.fused_parsed_events(seq).select("doc_id", "source", FIELDS).collect()
    ka = sorted((r["doc_id"], r["source"], tuple(sorted(r[FIELDS].items()))) for r in a)
    kb = sorted((r["doc_id"], r["source"], tuple(sorted(r[FIELDS].items()))) for r in b)
    assert ka == kb


def test_flagship_sink_writes_match_routed_rows(spark, sf_dir, tmp_path):
    routed = flagship.routed(spark, sf_dir).select("sink", "doc_id", "source")
    manifest = Manifest(str(tmp_path / "m"))
    out = str(tmp_path / "sinks")
    sinks = ["sink_a", "sink_b", "sink_default"]
    written = resumable_sink_write(routed, sinks, out, manifest)
    assert written == sinks
    # read back every sink dir and compare to the routed row set
    back = []
    for s in sinks:
        for r in spark.read.parquet(f"{out}/unit={s}").collect():
            back.append((s, r["doc_id"], r["source"]))
    expect = [(r["sink"], r["doc_id"], r["source"]) for r in routed.collect()]
    assert sorted(back) == sorted(expect)
    # expected per-sink counts at sf0.001 (deterministic from seeded testdata)
    counts = {s: sum(1 for b in back if b[0] == s) for s in sinks}
    assert counts == {"sink_a": 850, "sink_b": 100, "sink_default": 950}


def test_flagship_sink_write_resume_after_crash(spark, sf_dir, tmp_path):
    routed = flagship.routed(spark, sf_dir).select("sink", "doc_id")
    manifest = Manifest(str(tmp_path / "m"))
    out = str(tmp_path / "sinks")
    sinks = ["sink_a", "sink_b", "sink_default"]
    with pytest.raises(RuntimeError):
        resumable_sink_write(routed, sinks, out, manifest, fail_after=1)
    assert manifest.done_units() == {"sink_a"}
    # resume: only the two unfinished sinks are written
    written = resumable_sink_write(routed, sinks, out, manifest)
    assert written == ["sink_b", "sink_default"]
    total = sum(
        spark.read.parquet(f"{out}/unit={s}").count() for s in sinks
    )
    assert total == 1900


def test_salting_spreads_hot_source(spark, sf_dir):
    from loongcollector_spark.aggregate import partition_for_sinks

    # nginx is the deliberate 80% hot source; partitioning by source alone
    # puts 80% of rows in one partition — salting must spread it
    seq = sequences_df(spark, sf_dir)
    plain = partition_for_sinks(seq, keys=("source",), num_partitions=8)
    salted = partition_for_sinks(seq, keys=("source",), num_partitions=8, salt_buckets=8)

    def sizes(df):
        return [
            r["c"]
            for r in df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
    total = seq.count()
    assert max(sizes(plain)) >= total * 0.8  # hot partition exists unsalted
    assert max(sizes(salted)) < total * 0.4  # salting broke the hot key


def test_desensitize_arrow_md5_all_occurrences(spark):
    import hashlib

    line = "id=123 then id=456 end"
    ev = to_events(
        spark.createDataFrame([(0, line)], ["i", "content"])
    )
    out = DesensitizeArrow(
        source_key="content", method="md5", prefix_pattern="id=",
        content_pattern=r"\d+", replacing_all=True,
    ).apply(ev)
    got = out.collect()[0][FIELDS]["content"]
    h1 = hashlib.md5(b"123").hexdigest().upper()
    h2 = hashlib.md5(b"456").hexdigest().upper()
    assert got == f"id={h1} then id={h2} end"


def test_desensitize_arrow_matches_jvm_const(spark):
    rows = [(i, f"user=u{i} pass=secret{i} tail") for i in range(20)]
    ev = to_events(spark.createDataFrame(rows, ["i", "content"]))
    kw = dict(
        source_key="content", method="const", prefix_pattern="pass=",
        content_pattern=r"\w+", replacing_string="***", replacing_all=True,
    )
    a = {r["i"]: r[FIELDS]["content"] for r in Desensitize(**kw).apply(ev).collect()}
    b = {r["i"]: r[FIELDS]["content"] for r in DesensitizeArrow(**kw).apply(ev).collect()}
    assert a == b


def test_dict_map_csv_file(spark, tmp_path):
    from loongcollector_spark.operators.enrich import DictMap, read_dict_csv

    p = tmp_path / "dict.csv"
    p.write_text("nginx,web\ncsvlog,trade\n")
    d = read_dict_csv(str(p))
    assert d == {"nginx": "web", "csvlog": "trade"}
    ev = spark.createDataFrame([(0, {"k": "nginx"})], ["i", FIELDS])
    out = DictMap(d, source_key="k", dest_key="cat").apply(ev)
    assert out.collect()[0][FIELDS]["cat"] == "web"


def test_dict_map_csv_rejects_conflicts(tmp_path):
    from loongcollector_spark.operators.enrich import read_dict_csv

    p = tmp_path / "bad.csv"
    p.write_text("a,1\na,2\n")
    with pytest.raises(ValueError, match="hash crash"):
        read_dict_csv(str(p))


def test_fused_csvlog_overflow_matches_branched(spark):
    """A csvlog line with MORE than len(CSV_KEYS) tab-separated fields gets
    the same __column{i}__ EXTEND overflow keys on the fused path as on the
    branched DelimiterParser path."""
    seq = spark.createDataFrame(
        [("d1", [ord(c) for c in "u1\t10\tGET\t42\textra1\textra2"], 6, "csvlog")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    a = flagship.parsed_events_from(seq, arrow=False).collect()
    b = flagship.fused_parsed_events(seq, arrow=False).collect()
    fa, fb = dict(a[0][FIELDS]), dict(b[0][FIELDS])
    assert fa == fb
    assert fa["__column4__"] == "extra1" and fa["__column5__"] == "extra2"


def test_fused_full_pipeline_matches_branched(spark, sf_dir):
    """pipeline_aggregates with fused=True (single-scan CASE-dispatch parse)
    must produce the exact branched-path aggregates."""
    a = sorted(
        flagship.pipeline_aggregates(spark, sf_dir).collect(), key=lambda r: r["sink"]
    )
    b = sorted(
        flagship.pipeline_aggregates(spark, sf_dir, fused=True).collect(),
        key=lambda r: r["sink"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r["sink"]: r["events"] for r in a} == {
        "sink_a": 850, "sink_b": 100, "sink_default": 950,
    }
