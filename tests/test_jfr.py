"""JFR profile ingestion (pkg/helper/profile/pyroscope/jfr/) — reference
golden (example_parsed.json.gz → 323 logs, jfr_test.go TestParse) +
synthetic mapping/labels tests."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from loongcollector_spark.operators.jfr import (
    JfrChunkParser,
    decode_labels_snapshot,
    encode_labels_snapshot,
    jfr_chunk_logs,
    merge_jvm_generated_classes,
)

_PARSED = "/root/reference/pkg/helper/profile/pyroscope/jfr/testdata/example_parsed.json.gz"
_LABELS_RAW = "/root/reference/pkg/helper/profile/pyroscope/jfr/testdata/jfr_labels.raw"


def _ref_events():
    d = json.loads(gzip.decompress(open(_PARSED, "rb").read()))

    def fr(e):
        st = e.get("StackTrace")
        if st is None:
            return None
        out = []
        for f in st.get("Frames") or []:
            m = f.get("Method") or {}
            t = m.get("Type") or {}
            out.append(
                {
                    "type": (t.get("Name") or {}).get("String"),
                    "method": (m.get("Name") or {}).get("String"),
                }
            )
        return out

    events = []
    for e in d[0]["Events"]:
        if "State" in e and "StackTrace" in e:
            events.append(
                dict(
                    kind="execution_sample",
                    context_id=e.get("ContextId") or 0,
                    state=(e["State"] or {}).get("Name"),
                    frames=fr(e),
                )
            )
        elif "TLABSize" in e:
            events.append(
                dict(kind="alloc_in_new_tlab", context_id=e.get("ContextId") or 0,
                     tlab_size=e.get("TLABSize"), frames=fr(e))
            )
        elif "AllocationSize" in e:
            events.append(
                dict(kind="alloc_outside_tlab", context_id=e.get("ContextId") or 0,
                     alloc_size=e.get("AllocationSize"), frames=fr(e))
            )
        elif "MonitorClass" in e:
            events.append(
                dict(kind="java_monitor_enter", context_id=e.get("ContextId") or 0,
                     duration=e.get("Duration"), frames=fr(e))
            )
        elif "ID" in e and "Name" in e and "Value" in e:
            events.append(dict(kind="active_setting", name=e["Name"], value=e["Value"]))
    return events


@pytest.mark.skipif(not os.path.exists(_PARSED), reason="reference fixture absent")
def test_reference_golden_chunk():
    """jfr_test.go TestParse: the example chunk yields exactly 323 logs."""
    logs = jfr_chunk_logs(
        _ref_events(), spy_name="javaspy", meta_tags={"_app_name_": "12"},
        sample_rate=99, agg_type="sum",
    )
    assert len(logs) == 323
    # event setting is 'cpu' → wall trees suppressed, cpu trees named cpu
    kinds = {l["valueTypes"] for l in logs}
    assert "wall" not in kinds and "cpu" in kinds
    cpu = [l for l in logs if l["valueTypes"] == "cpu"]
    assert len(cpu) == 183
    assert all(l["units"] == "nanoseconds" for l in cpu)  # samples × 1e9/99
    assert all(l["labels"] == '{"_app_name_":"12","_sample_rate_":"99"}' for l in logs)
    assert all(l["type"] == "profile_cpu" for l in cpu)
    assert {l["valueTypes"] for l in logs if l["units"] == "objects"} == {
        "alloc_in_new_tlab_objects", "alloc_outside_tlab_objects"
    }


@pytest.mark.skipif(not os.path.exists(_LABELS_RAW), reason="reference fixture absent")
def test_reference_labels_snapshot_decodes():
    snap = decode_labels_snapshot(open(_LABELS_RAW, "rb").read())
    assert snap["strings"] and snap["contexts"]
    # every context label key/value resolves through the string table
    for labels in snap["contexts"].values():
        for k, v in labels.items():
            assert k in snap["strings"] and v in snap["strings"]


def test_labels_snapshot_roundtrip_and_context_labels():
    pb = encode_labels_snapshot(
        {7: {1: 2}, 9: {1: 3}}, {1: "region", 2: "eu", 3: "us"}
    )
    snap = decode_labels_snapshot(pb)
    assert snap == {"contexts": {7: {1: 2}, 9: {1: 3}},
                    "strings": {1: "region", 2: "eu", 3: "us"}}
    ev = [
        dict(kind="active_setting", name="event", value="cpu"),
        dict(kind="execution_sample", context_id=7, state="STATE_RUNNABLE",
             frames=[{"type": "A", "method": "m"}]),
        dict(kind="execution_sample", context_id=9, state="STATE_RUNNABLE",
             frames=[{"type": "A", "method": "m"}]),
    ]
    logs = jfr_chunk_logs(ev, labels_snapshot=snap, sample_rate=0)
    # same stack under two label sets → one id, two value entries; last
    # labels write wins (ctx 9)
    assert len(logs) == 2
    assert all(l["val"] == "1.00" and l["units"] == "samples" for l in logs)
    assert logs[0]["labels"] == '{"region":"us"}'


def test_wall_gate_and_lock_events():
    ev = [
        dict(kind="active_setting", name="event", value="wall"),
        dict(kind="execution_sample", context_id=0, state="STATE_SLEEPING",
             frames=[{"type": "A", "method": "m"}]),
        dict(kind="java_monitor_enter", context_id=0, duration=500,
             frames=[{"type": "L", "method": "lock"}]),
    ]
    logs = jfr_chunk_logs(ev, sample_rate=100)
    by = {(l["valueTypes"], l["name"]): l for l in logs}
    # non-runnable sample lands in the wall tree only; event=wall → emitted
    # under the "wall" name (getName's cpu rename applies to the CPU slot)
    assert ("wall", "A.m") in by and by[("wall", "A.m")]["val"] == "10000000.00"
    assert by[("wall", "A.m")]["type"] == "profile_cpu"
    assert ("cpu", "A.m") not in by
    assert by[("lock_count", "L.lock")]["val"] == "1.00"
    assert by[("lock_count", "L.lock")]["units"] == "lock_samples"
    assert by[("lock_duration", "L.lock")]["val"] == "500.00"
    assert by[("lock_duration", "L.lock")]["units"] == "lock_nanoseconds"
    # reference quirk: DetectProfileType puts underscored lock_count /
    # lock_duration in the CPU list (the mutex list has the dashed forms)
    assert by[("lock_duration", "L.lock")]["type"] == "profile_cpu"


def test_symbol_normalization():
    assert merge_jvm_generated_classes(
        "jdk/internal/reflect/GeneratedMethodAccessor31"
    ) == "jdk/internal/reflect/GeneratedMethodAccessor_"
    assert merge_jvm_generated_classes(
        "org/example/rideshare/OrderService$$Lambda$669.0x0000000800fd7318"
    ) == "org/example/rideshare/OrderService$$Lambda$_"
    assert merge_jvm_generated_classes(
        "/tmp/libzstd-jni-1.5.1-16931311898282279136.so (deleted)"
    ) == "libzstd-jni-_.so"


def test_jfr_parser_operator_sparkside(spark):
    from loongcollector_spark.operators.jfr import _EVENT_T, encode_labels_snapshot

    ev = [
        ("active_setting", 0, None, "event", "cpu", None, None, None, None),
        ("execution_sample", 1, "STATE_RUNNABLE", None, None, None, None, None,
         [("A", "m"), ("Base", "run")]),
    ]
    pb = encode_labels_snapshot({1: {1: 2}}, {1: "region", 2: "eu"})
    df = spark.createDataFrame(
        [(1, ev, bytearray(pb), 100)],
        f"doc_id long, events {_EVENT_T}, labels_pb binary, sample_rate long",
    )
    out = JfrChunkParser(passthrough=["doc_id"]).apply(df).collect()
    assert len(out) == 1
    r = out[0]
    # JFR frames arrive leaf-first; reversed → name=leaf A.m, stack=Base.run
    assert r["name"] == "A.m" and r["stack"] == "Base.run"
    assert r["val"] == "10000000.00" and r["units"] == "nanoseconds"
    assert r["labels"] == '{"_sample_rate_":"100","region":"eu"}'
    assert r["language"] == "javaspy"
