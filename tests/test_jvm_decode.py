"""Descriptor-set generation + JVM protobuf tier selection.

The sandbox has no spark-protobuf jar and no protobuf runtime, so the
descriptor bytes are validated with an independent reader over the raw wire
(descriptor.proto is itself protobuf); the live from_protobuf path runs
under skipif and executes on clusters that ship the external module."""

from __future__ import annotations

import pytest

from loongcollector_spark.operators.jvm_decode import (
    jvm_pb_available,
    parse_sls_log_group_auto,
    sls_descriptor_set,
)
from loongcollector_spark.operators.pb import _fields


def _read_fields(buf: bytes) -> list[tuple[int, int, object]]:
    return list(_fields(buf))


def _msg_shape(buf: bytes) -> dict:
    """Independent DescriptorProto reader: name, {field: (number, label,
    type, type_name)}, nested."""
    out = {"name": None, "fields": {}, "nested": []}
    for fno, wt, v in _read_fields(buf):
        if fno == 1 and wt == 2:
            out["name"] = bytes(v).decode()
        elif fno == 2 and wt == 2:
            f = {"type_name": ""}
            for f2, w2, v2 in _read_fields(bytes(v)):
                if f2 == 1:
                    f["name"] = bytes(v2).decode()
                elif f2 == 3:
                    f["number"] = int(v2)
                elif f2 == 4:
                    f["label"] = int(v2)
                elif f2 == 5:
                    f["type"] = int(v2)
                elif f2 == 6:
                    f["type_name"] = bytes(v2).decode()
            out["fields"][f["name"]] = f
        elif fno == 3 and wt == 2:
            out["nested"].append(_msg_shape(bytes(v)))
    return out


def test_sls_descriptor_set_shape():
    ds = sls_descriptor_set()
    files = [bytes(v) for fno, wt, v in _read_fields(ds) if fno == 1]
    assert len(files) == 1
    name = package = syntax = None
    msgs = []
    for fno, wt, v in _read_fields(files[0]):
        if fno == 1:
            name = bytes(v).decode()
        elif fno == 2:
            package = bytes(v).decode()
        elif fno == 4:
            msgs.append(_msg_shape(bytes(v)))
        elif fno == 12:
            syntax = bytes(v).decode()
    assert (name, package, syntax) == ("sls_logs.proto", "sls", "proto2")
    by_name = {m["name"]: m for m in msgs}
    assert set(by_name) == {"Log", "LogTag", "LogGroup"}

    log = by_name["Log"]
    assert log["fields"]["Time"] == {
        "name": "Time", "number": 1, "label": 2, "type": 13, "type_name": ""
    }  # required uint32
    assert log["fields"]["Contents"]["type"] == 11  # message
    assert log["fields"]["Contents"]["label"] == 3  # repeated
    assert log["fields"]["Contents"]["type_name"] == ".sls.Log.Content"
    assert log["fields"]["Time_ns"] == {
        "name": "Time_ns", "number": 4, "label": 1, "type": 7, "type_name": ""
    }  # optional fixed32
    assert log["nested"][0]["name"] == "Content"
    assert log["nested"][0]["fields"]["Key"]["label"] == 2

    lg = by_name["LogGroup"]
    assert lg["fields"]["Logs"]["type_name"] == ".sls.Log"
    assert lg["fields"]["LogTags"]["type_name"] == ".sls.LogTag"
    assert [lg["fields"][k]["number"] for k in
            ("Logs", "Category", "Topic", "Source", "MachineUUID", "LogTags")] == [
        1, 2, 3, 4, 5, 6
    ]


def test_auto_tier_falls_back_to_python(spark, monkeypatch):
    """Without the spark-protobuf jar the auto tier must take the Python
    codec and produce the exact ParseSlsLogGroup output."""
    from loongcollector_spark.operators.pb import encode_sls_log, encode_sls_log_group

    payload = encode_sls_log_group(
        [encode_sls_log(1663904182, {"k": "v"}, time_ns=7)],
        topic="t", source="s", tags={"g": "1"},
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "i long, payload binary")
    monkeypatch.delenv("SPARK_GRAFT_JVM_PB", raising=False)
    out = parse_sls_log_group_auto(df, "payload", ["i"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["time"], r["time_ns"], dict(r["contents"])) == (1663904182, 7, {"k": "v"})
    assert (r["topic"], r["source"], dict(r["group_tags"])) == ("t", "s", {"g": "1"})


def test_jvm_path_when_module_present(spark):
    """Full from_protobuf roundtrip — runs only where spark-protobuf is on
    the classpath (real clusters; skipped in this sandbox)."""
    if not jvm_pb_available(spark):
        pytest.skip("spark-protobuf external module not on the classpath")
    from loongcollector_spark.operators.jvm_decode import parse_sls_log_group_jvm
    from loongcollector_spark.operators.pb import encode_sls_log, encode_sls_log_group

    payload = encode_sls_log_group(
        [encode_sls_log(1663904182, {"k": "v"}, time_ns=7)], topic="t", source="s"
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\xff\xff"))],
        "i long, payload binary",
    )
    out = parse_sls_log_group_jvm(df, "payload", ["i"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["time"] == 1663904182
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def _file_shape(ds: bytes) -> tuple[str, str, str, dict]:
    files = [bytes(v) for fno, wt, v in _read_fields(ds) if fno == 1]
    assert len(files) == 1
    name = package = syntax = None
    msgs = {}
    for fno, wt, v in _read_fields(files[0]):
        if fno == 1:
            name = bytes(v).decode()
        elif fno == 2:
            package = bytes(v).decode()
        elif fno == 4:
            m = _msg_shape(bytes(v))
            msgs[m["name"]] = m
        elif fno == 12:
            syntax = bytes(v).decode()
    return name, package, syntax, msgs


def test_prompb_descriptor_set_shape():
    from loongcollector_spark.operators.jvm_decode import prompb_descriptor_set

    name, package, syntax, msgs = _file_shape(prompb_descriptor_set())
    assert (name, package, syntax) == ("remote.proto", "prompb", "proto3")
    assert set(msgs) == {"Label", "Sample", "TimeSeries", "WriteRequest"}
    assert msgs["Sample"]["fields"]["value"]["type"] == 1  # double
    assert msgs["Sample"]["fields"]["timestamp"]["type"] == 3  # int64
    assert msgs["TimeSeries"]["fields"]["labels"]["type_name"] == ".prompb.Label"
    assert msgs["WriteRequest"]["fields"]["timeseries"]["label"] == 3  # repeated


def test_otlp_logs_descriptor_set_shape():
    from loongcollector_spark.operators.jvm_decode import otlp_logs_descriptor_set

    name, package, syntax, msgs = _file_shape(otlp_logs_descriptor_set())
    assert (name, package, syntax) == ("logs.proto", "otlp", "proto3")
    lr = msgs["LogRecord"]["fields"]
    # field numbers must match the wire the Python codec reads
    # (otlp_pb.py _log_record: 1/2/3/5/6)
    assert [lr[k]["number"] for k in
            ("time_unix_nano", "severity_number", "severity_text", "body",
             "attributes")] == [1, 2, 3, 5, 6]
    assert lr["time_unix_nano"]["type"] == 6  # fixed64
    assert msgs["LogsData"]["fields"]["resource_logs"]["type_name"] == ".otlp.ResourceLogs"
    assert msgs["KeyValue"]["fields"]["value"]["type_name"] == ".otlp.AnyValue"


def test_jvm_otlp_and_prompb_paths_when_module_present(spark):
    """from_protobuf over the generated OTLP/prompb descriptors — skipped
    where spark-protobuf is absent (this sandbox)."""
    if not jvm_pb_available(spark):
        pytest.skip("spark-protobuf external module not on the classpath")
    from pyspark.sql.protobuf.functions import from_protobuf

    from loongcollector_spark.operators import otlp_pb as W
    from loongcollector_spark.operators.jvm_decode import otlp_logs_descriptor_set

    rec = W.encode_log_record_pb(123, severity_text="I", body="m")
    df = spark.createDataFrame(
        [(bytearray(W.encode_logs_data([rec])),)], "payload binary"
    )
    out = df.select(
        from_protobuf(
            "payload", "otlp.LogsData",
            binaryDescriptorSet=otlp_logs_descriptor_set(),
        ).alias("d")
    ).collect()
    lr = out[0]["d"]["resource_logs"][0]["scope_logs"][0]["log_records"][0]
    assert lr["severity_text"] == "I"


def test_otlp_traces_descriptor_set_shape():
    from loongcollector_spark.operators.jvm_decode import otlp_traces_descriptor_set

    name, package, syntax, msgs = _file_shape(otlp_traces_descriptor_set())
    assert (name, package, syntax) == ("trace.proto", "otlp", "proto3")
    sp = msgs["Span"]["fields"]
    # field numbers must match the wire the Python codec reads
    # (otlp_pb.py _span: 1/2/3/4/5/6/7/8/9/11/13/15)
    assert [sp[k]["number"] for k in
            ("trace_id", "span_id", "trace_state", "parent_span_id", "name",
             "kind", "start_time_unix_nano", "end_time_unix_nano", "attributes",
             "events", "links", "status")] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 13, 15]
    assert sp["trace_id"]["type"] == 12  # bytes
    assert sp["start_time_unix_nano"]["type"] == 6  # fixed64
    assert msgs["Span"]["nested"][0]["name"] == "Event"
    assert msgs["Span"]["nested"][1]["name"] == "Link"
    assert msgs["Status"]["fields"]["message"]["number"] == 2
    assert msgs["Status"]["fields"]["code"]["number"] == 3
    # full AnyValue oneof incl. the recursive kinds
    av = msgs["AnyValue"]["fields"]
    assert [av[k]["number"] for k in
            ("string_value", "bool_value", "int_value", "double_value",
             "array_value", "kvlist_value", "bytes_value")] == [1, 2, 3, 4, 5, 6, 7]
    assert av["array_value"]["type_name"] == ".otlp.ArrayValue"
    assert msgs["ArrayValue"]["fields"]["values"]["type_name"] == ".otlp.AnyValue"


def test_otlp_metrics_descriptor_set_shape():
    from loongcollector_spark.operators.jvm_decode import otlp_metrics_descriptor_set

    name, package, syntax, msgs = _file_shape(otlp_metrics_descriptor_set())
    assert (name, package, syntax) == ("metrics.proto", "otlp", "proto3")
    m = msgs["Metric"]["fields"]
    # otlp_pb.py _metric reads 1/5/7/9/10/11
    assert [m[k]["number"] for k in
            ("name", "gauge", "sum", "histogram", "exponential_histogram",
             "summary")] == [1, 5, 7, 9, 10, 11]
    ndp = msgs["NumberDataPoint"]["fields"]
    assert (ndp["time_unix_nano"]["number"], ndp["as_double"]["number"],
            ndp["exemplars"]["number"], ndp["as_int"]["number"],
            ndp["attributes"]["number"]) == (3, 4, 5, 6, 7)
    assert ndp["as_int"]["type"] == 16  # sfixed64
    hdp = msgs["HistogramDataPoint"]["fields"]
    assert (hdp["count"]["number"], hdp["bucket_counts"]["number"],
            hdp["explicit_bounds"]["number"], hdp["attributes"]["number"],
            hdp["min"]["number"], hdp["max"]["number"]) == (4, 6, 7, 9, 11, 12)
    assert hdp["bucket_counts"]["label"] == 3 and hdp["bucket_counts"]["type"] == 6
    edp = msgs["ExponentialHistogramDataPoint"]["fields"]
    assert (edp["attributes"]["number"], edp["scale"]["number"],
            edp["zero_count"]["number"], edp["positive"]["number"],
            edp["negative"]["number"]) == (1, 6, 7, 8, 9)
    assert edp["scale"]["type"] == 17  # sint32 (zigzag)
    assert msgs["ExponentialHistogramDataPoint"]["nested"][0]["name"] == "Buckets"
    ex = msgs["Exemplar"]["fields"]
    assert (ex["time_unix_nano"]["number"], ex["as_double"]["number"],
            ex["span_id"]["number"], ex["trace_id"]["number"],
            ex["as_int"]["number"]) == (2, 3, 4, 5, 6)
    sdp = msgs["SummaryDataPoint"]["fields"]
    assert sdp["quantile_values"]["number"] == 6


def test_pprof_descriptor_set_shape():
    from loongcollector_spark.operators.jvm_decode import pprof_descriptor_set

    name, package, syntax, msgs = _file_shape(pprof_descriptor_set())
    assert (name, package, syntax) == ("profile.proto", "perftools.profiles", "proto3")
    p = msgs["Profile"]["fields"]
    # public profile.proto numbers (the wire pprof_profile.py decodes)
    assert [p[k]["number"] for k in
            ("sample_type", "sample", "mapping", "location", "function",
             "string_table", "time_nanos", "duration_nanos", "period_type",
             "period", "default_sample_type")] == [1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 14]
    assert p["string_table"]["label"] == 3 and p["string_table"]["type"] == 9
    s = msgs["Sample"]["fields"]
    assert (s["location_id"]["number"], s["value"]["number"],
            s["label"]["number"]) == (1, 2, 3)
    assert s["location_id"]["label"] == 3 and s["location_id"]["type"] == 4  # rep uint64
    loc = msgs["Location"]["fields"]
    assert (loc["id"]["number"], loc["line"]["number"]) == (1, 4)
    assert msgs["Line"]["fields"]["function_id"]["number"] == 1
    fn = msgs["Function"]["fields"]
    assert (fn["id"]["number"], fn["name"]["number"], fn["system_name"]["number"],
            fn["filename"]["number"]) == (1, 2, 3, 4)
