"""Prometheus relabel goldens (ported from
core/unittest/prometheus/RelabelUnittest.cpp) + MetricEvent/SpanEvent frame
shapes and event-type routing."""

import hashlib

import pyspark.sql.functions as F

from loongcollector_spark.models import (
    EVENT_TYPE_COL,
    log_fields_to_metric_events,
    metric_events,
    multi_double_values,
    span_events,
    tag_log_events,
    union_event_stream,
)
from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.relabel import PromRelabelProcessor, RelabelConfig

K8S_LABELS = {
    "__meta_kubernetes_pod_ip": "172.17.0.3",
    "__meta_kubernetes_pod_label_app": "node-exporter",
}


def _tags_df(spark, tags):
    args = []
    for k, v in tags.items():
        args += [F.lit(k), F.lit(v)]
    return spark.range(1).select(F.create_map(*args).alias("tags"))


def _one(df):
    rows = df.collect()
    return dict(rows[0]["tags"]) if rows else None


def test_relabel_replace_golden(spark):
    """TestRelabel 'replace' golden: (.*) -> ${1}:9100 on pod ip."""
    cfg = RelabelConfig(
        action="replace",
        regex="(.*)",
        replacement="${1}:9100",
        source_labels=["__meta_kubernetes_pod_ip"],
        target_label="__address__",
    )
    out = _one(cfg.apply(_tags_df(spark, K8S_LABELS)))
    assert out == {**K8S_LABELS, "__address__": "172.17.0.3:9100"}


def test_relabel_keep_drop(spark):
    df = _tags_df(spark, K8S_LABELS)
    keep = RelabelConfig(
        action="keep", regex="172.*", source_labels=["__meta_kubernetes_pod_ip"]
    )
    assert keep.apply(df).count() == 1
    drop = RelabelConfig(
        action="drop", regex="172.*", source_labels=["__meta_kubernetes_pod_ip"]
    )
    assert drop.apply(df).count() == 0
    # keep is a FULL match (boost::regex_match): '7.0' must not keep
    keep2 = RelabelConfig(
        action="keep", regex="7.0", source_labels=["__meta_kubernetes_pod_ip"]
    )
    assert keep2.apply(df).count() == 0


def test_relabel_equal_actions(spark):
    tags = {**K8S_LABELS, "pod_ip": "172.17.0.3"}
    df = _tags_df(spark, tags)
    dropeq = RelabelConfig(
        action="dropequal",
        source_labels=["__meta_kubernetes_pod_ip"],
        target_label="pod_ip",
    )
    assert dropeq.apply(df).count() == 0
    keepeq = RelabelConfig(
        action="keepequal",
        source_labels=["__meta_kubernetes_pod_ip"],
        target_label="pod_ip",
    )
    assert keepeq.apply(df).count() == 1


def test_relabel_case_actions(spark):
    tags = {**K8S_LABELS, "__meta_kubernetes_pod_label_app": "node-Exporter"}
    df = _tags_df(spark, tags)
    lower = RelabelConfig(
        action="lowercase",
        source_labels=["__meta_kubernetes_pod_label_app"],
        target_label="__meta_kubernetes_pod_label_app",
    )
    assert (
        _one(lower.apply(df))["__meta_kubernetes_pod_label_app"] == "node-exporter"
    )
    upper = RelabelConfig(
        action="uppercase",
        source_labels=["__meta_kubernetes_pod_label_app"],
        target_label="__meta_kubernetes_pod_label_app",
    )
    assert (
        _one(upper.apply(df))["__meta_kubernetes_pod_label_app"] == "NODE-EXPORTER"
    )


def test_relabel_hashmod_exact(spark):
    """hashmod = last 8 md5 bytes as u64 % modulus (Relabel.cpp:196-206) —
    pinned against a python reimplementation."""
    tags = {"app": "node-Exporter"}
    digest = hashlib.md5(b"node-Exporter").digest()
    hv = 0
    for b in digest[8:]:
        hv = (hv << 8) | b
    expected = str(hv % 255)
    cfg = RelabelConfig(
        action="hashmod", source_labels=["app"], target_label="hash_val", modulus=255
    )
    assert _one(cfg.apply(_tags_df(spark, tags)))["hash_val"] == expected


def test_relabel_labelmap_golden(spark):
    cfg = RelabelConfig(
        action="labelmap",
        regex="__meta_kubernetes_pod_label_(.+)",
        replacement="k8s_$1",
    )
    out = _one(cfg.apply(_tags_df(spark, K8S_LABELS)))
    assert out == {**K8S_LABELS, "k8s_app": "node-exporter"}


def test_relabel_labeldrop_labelkeep(spark):
    tags = {**K8S_LABELS, "job": "node"}
    dropped = _one(
        RelabelConfig(action="labeldrop", regex="__meta.*").apply(_tags_df(spark, tags))
    )
    assert dropped == {"job": "node"}
    kept = _one(
        RelabelConfig(action="labelkeep", regex="__meta.*").apply(_tags_df(spark, tags))
    )
    assert kept == K8S_LABELS


def test_relabel_dropmetric(spark):
    df = _tags_df(spark, {"__name__": "go_gc_duration_seconds", "job": "x"})
    cfg = RelabelConfig(action="dropmetric", match_list=["go_gc_duration_seconds"])
    assert cfg.apply(df).count() == 0
    cfg2 = RelabelConfig(action="dropmetric", match_list=["other_metric"])
    assert cfg2.apply(df).count() == 1


def test_relabel_replace_empty_deletes_target(spark):
    """Relabel.cpp:185-188: empty expanded value deletes the target label."""
    cfg = RelabelConfig(
        action="replace",
        regex="(.*)",
        replacement="$1",
        source_labels=["missing_label"],
        target_label="job",
    )
    out = _one(cfg.apply(_tags_df(spark, {"job": "node", "a": "b"})))
    assert out == {"a": "b"}


def test_prom_processor_exported_prefix_and_cleanup(spark):
    """ProcessorPromRelabelMetricNative.cpp:92-135: target-tag conflict gets
    exported_ prefix (honor_labels=false); __-prefixed and empty tags are
    dropped after the chain."""
    df = _tags_df(spark, {"job": "event-job", "__scheme__": "http", "empty": ""})
    proc = PromRelabelProcessor(
        configs=(),
        target_tags={"job": "scrape-job", "instance": "1.2.3.4:9100"},
        honor_labels=False,
    )
    out = _one(proc.apply(df))
    assert out == {
        "job": "scrape-job",
        "exported_job": "event-job",
        "instance": "1.2.3.4:9100",
    }
    proc_honor = PromRelabelProcessor(
        target_tags={"job": "scrape-job"}, honor_labels=True
    )
    out2 = _one(proc_honor.apply(_tags_df(spark, {"job": "event-job"})))
    assert out2 == {"job": "event-job"}


# --- metric / span event frames ---------------------------------------------


def test_metric_event_frame_variants(spark):
    df = spark.createDataFrame(
        [(1, "GET", 12.5, 3.0)], ["i", "method", "rt", "cnt"]
    )
    single = metric_events(df, "request_rt", tags={"method": "method"}, value="rt")
    r = single.collect()[0]
    assert r["metric_name"] == "request_rt" and r["value"] == 12.5
    assert r["values"] is None and dict(r["tags"]) == {"method": "GET"}
    multi = metric_events(
        df,
        "request_stats",
        values=multi_double_values(
            {"rt": ("gauge", F.col("rt")), "cnt": ("counter", F.col("cnt"))}
        ),
    )
    m = multi.collect()[0]
    assert m["value"] is None
    assert m["values"]["rt"].metric_type == "gauge" and m["values"]["rt"].value == 12.5
    assert m["values"]["cnt"].metric_type == "counter"


def test_log_fields_to_metric_events(spark):
    df = spark.createDataFrame(
        [(1, "host1\t42"), (2, "host2\tnot-a-number")], ["i", "content"]
    )
    from loongcollector_spark.operators.parse import DelimiterParser

    ev = DelimiterParser("\t", ["host", "rt"]).apply(to_events(df))
    out = log_fields_to_metric_events(ev, ["host"], {"rt_ms": "rt"})
    rows = out.collect()
    assert len(rows) == 1  # non-numeric dropped
    assert rows[0]["metric_name"] == "rt_ms" and rows[0]["value"] == 42.0
    assert dict(rows[0]["tags"]) == {"host": "host1"}
    assert rows[0][EVENT_TYPE_COL] == "metric"


def test_union_event_stream_and_types(spark):
    logs = tag_log_events(
        to_events(spark.createDataFrame([(1, "a line")], ["i", "content"]))
    )
    mets = metric_events(
        spark.createDataFrame([(1.0,)], ["v"]), "m", value="v"
    )
    spans = span_events(
        spark.createDataFrame([("t1", "s1", "op")], ["t", "s", "n"]),
        trace_id=F.col("t"),
        span_id=F.col("s"),
        name=F.col("n"),
    )
    stream = union_event_stream(logs, mets, spans)
    counts = {
        r[EVENT_TYPE_COL]: r["cnt"]
        for r in stream.groupBy(EVENT_TYPE_COL).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert counts == {"log": 1, "metric": 1, "trace": 1}


def test_relabel_literal_dollar_in_replacement(spark):
    """boost::regex_replace emits a '$' not followed by a group ref literally
    ('cost$'); Java regexp_replace throws unless it is escaped."""
    cfg = RelabelConfig(
        action="replace",
        regex="(.*)",
        replacement="${1}-cost$",
        source_labels=["__meta_kubernetes_pod_label_app"],
        target_label="price",
    )
    out = _one(cfg.apply(_tags_df(spark, K8S_LABELS)))
    assert out["price"] == "node-exporter-cost$"

    # '$' in the target_label template too
    cfg2 = RelabelConfig(
        action="replace",
        regex="(.*)",
        replacement="v",
        source_labels=["__meta_kubernetes_pod_label_app"],
        target_label="usd$amt",
    )
    out2 = _one(cfg2.apply(_tags_df(spark, K8S_LABELS)))
    assert out2["usd$amt"] == "v"
