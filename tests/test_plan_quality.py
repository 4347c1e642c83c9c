"""Physical-plan quality gates — the 100 TB design invariants asserted on
the actual Catalyst output, so a regression that silently de-optimizes the
plan (lost broadcast, surprise cartesian, missing partial agg, unpushed
source filter) fails CI rather than surfacing as a cluster incident."""

import re

import pyspark.sql.functions as F

from loongcollector_spark import flagship
from loongcollector_spark.synth import sequences_df


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_flagship_lookup_join_is_broadcast(spark, sf_dir):
    plan = _plan(flagship.pipeline_aggregates(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_flagship_aggregate_is_partial(spark, sf_dir):
    """Two HashAggregate nodes around the exchange = map-side combine."""
    plan = _plan(flagship.pipeline_aggregates(spark, sf_dir))
    aggs = plan.count("HashAggregate")
    assert aggs >= 2


def test_source_filter_below_python_stage(spark, sf_dir):
    """The per-source filter must sit BELOW MapInPandas (filters don't push
    through a Python stage on their own) so each branch decodes only its
    slice."""
    plan = _plan(flagship.parsed_events(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # in the numbered tree, every MapInPandas node must appear with a Filter
    # deeper than it (higher indent) within its branch
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        if "MapInPandas" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        below = lines[i + 1 : i + 4]
        assert any("Filter" in b or "Scan" in b for b in below), (
            "MapInPandas without a pushed filter/scan beneath:\n" + "\n".join(lines[i : i + 4])
        )


def test_aggregate_path_has_no_prewrite_shuffle(spark, sf_dir):
    """pipeline_aggregates must NOT contain the (source, route_key)
    repartition — only the tiny aggregate exchange (partition=False path)."""
    plan = _plan(flagship.pipeline_aggregates(spark, sf_dir))
    assert "REPARTITION_BY_COL" not in plan


def test_routed_write_path_has_explicit_repartition(spark, sf_dir):
    plan = _plan(flagship.routed(spark, sf_dir))
    assert "hashpartitioning(source" in plan or "REPARTITION_BY_COL" in plan


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection over the events scan must not read all columns."""
    seq = sequences_df(spark, sf_dir)
    plan = _plan(seq.select("doc_id", "source"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    # doc_id/source derive from event_id+user_id etc.; the heavy `props`
    # string column must be pruned away
    assert "props" not in cols
    assert "value" not in cols


def test_brute_topk_broadcasts_queries(spark, sf_dir):
    from loongcollector_spark.dataops.queries import q_embed_topk

    plan = _plan(q_embed_topk(spark, sf_dir))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_joins_are_equijoins(spark, sf_dir):
    from loongcollector_spark.dataops.queries import q_dedup_minhash

    plan = _plan(q_dedup_minhash(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
