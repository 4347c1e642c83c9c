"""pprof profile ingestion (pkg/helper/profile/pyroscope/pprof/) — golden
parity against the reference fixture + synthetic wire tests."""

from __future__ import annotations

import os

import pytest

from loongcollector_spark.operators.pprof_profile import (
    PprofBuilder,
    PprofProfileParser,
    decode_pprof,
    extract_profile_logs,
)

_FIXTURE = "/root/reference/pkg/helper/profile/pyroscope/pprof/testdata/cpu.pb.gz"


def _cpu_profile(gzipped: bool = True) -> bytes:
    b = PprofBuilder()
    b.sample_type("samples", "count")
    b.sample_type("cpu", "nanoseconds")
    f1 = b.function("main", "main.go")
    f2 = b.function("work", "work.go")
    l1 = b.location([f1])
    l2 = b.location([f2])
    b.sample([l2, l1], [5, 50_000_000])  # leaf=work, root=main
    b.sample([l1], [3, 30_000_000])
    return b.build(
        time_nanos=1_619_321_948_265_140_000,
        duration_nanos=1_100_177_167,
        period=10_000_000,
        period_type=("cpu", "nanoseconds"),
        gzipped=gzipped,
    )


@pytest.mark.skipif(not os.path.exists(_FIXTURE), reason="reference fixture absent")
def test_reference_golden_cpu_profile():
    """pprof_test.go:70-105 — the reference's own golden expectations."""
    data = open(_FIXTURE, "rb").read()
    logs = extract_profile_logs(
        data, spy_name="go", meta_tags={"_app_name_": "12"},
        extra_tags={"cluster": "cluster2"},
    )
    assert len(logs) == 6
    picks = [l for l in logs if l["stackID"] == "40fb694aa9506d0b"]
    assert len(picks) == 1
    l = picks[0]
    assert l["name"] == (
        "runtime.kevent /opt/homebrew/Cellar/go/1.16.1/libexec/src/runtime/sys_darwin.go"
    )
    assert l["stack"].startswith(
        "runtime.netpoll /opt/homebrew/Cellar/go/1.16.1/libexec/src/runtime/netpoll_kqueue.go\n"
    )
    assert l["stack"].endswith(
        "runtime.mcall /opt/homebrew/Cellar/go/1.16.1/libexec/src/runtime/asm_arm64.s"
    )
    assert l["val"] == "250000000.00"
    assert l["units"] == "nanoseconds"
    assert l["valueTypes"] == "cpu"
    assert l["aggTypes"] == "sum"
    assert l["type"] == "profile_cpu"
    assert l["dataType"] == "CallStack"
    assert l["language"] == "go"
    assert l["durationNs"] == 1_619_321_949_365_317_167 - 1_619_321_948_265_140_000
    assert l["labels"] == '{"_app_name_":"12","cluster":"cluster2"}'


def test_samples_scale_and_stack_aggregation():
    logs = extract_profile_logs(_cpu_profile(), spy_name="go")
    # 'cpu' sample type is not in DefaultSampleTypeMapping → filtered;
    # 'samples' values scale by period ns and the unit flips.
    assert len(logs) == 2
    by_name = {l["name"]: l for l in logs}
    assert by_name["work work.go"]["val"] == "50000000.00"
    assert by_name["work work.go"]["stack"] == "main main.go"
    assert by_name["main main.go"]["val"] == "30000000.00"
    assert by_name["main main.go"]["stack"] == ""
    for l in logs:
        assert l["units"] == "nanoseconds" and l["valueTypes"] == "cpu"
        assert l["time_sec"] == 1_619_321_948


def test_same_stack_accumulates_and_gzip_optional():
    b = PprofBuilder()
    b.sample_type("inuse_space", "bytes")
    f1 = b.function("alloc", "a.go")
    l1 = b.location([f1])
    b.sample([l1], [100])
    b.sample([l1], [150])
    logs = extract_profile_logs(b.build(gzipped=False), start_ns=5_000_000_000, end_ns=6_000_000_000)
    assert len(logs) == 1
    assert logs[0]["val"] == "250.00"
    assert logs[0]["units"] == "bytes"
    assert logs[0]["valueTypes"] == "inuse_space" and logs[0]["type"] == "profile_mem"
    # no TimeNanos → meta times
    assert logs[0]["time_sec"] == 5 and logs[0]["durationNs"] == 1_000_000_000


def test_cumulative_types_emit_nothing_single_profile():
    b = PprofBuilder()
    b.sample_type("alloc_space", "bytes")
    l1 = b.location([b.function("alloc", "a.go")])
    b.sample([l1], [100])
    assert extract_profile_logs(b.build()) == []


def test_exemplar_profile_id_label_and_labels_json():
    b = PprofBuilder()
    b.sample_type("samples", "count")
    l1 = b.location([b.function("f", "f.go")])
    b.sample([l1], [7], labels=[("profile_id", "abc"), ("region", "eu")])
    logs = extract_profile_logs(b.build(), meta_tags={"app": "x"}, sample_rate=99)
    # exemplar inserts into the baseline (label cut) AND the labeled set —
    # same stack → one id, two value entries
    assert len(logs) == 2
    # no period in the profile → sampleRate 0 → no ns scaling, unit verbatim
    assert all(l["val"] == "7.00" and l["units"] == "count" for l in logs)
    # last write wins for the labels entry (labeled set comes second)
    assert logs[0]["labels"] == (
        '{"_sample_rate_":"99","app":"x","profile_id":"abc","region":"eu"}'
    )
    # profileID resolves from meta tags only; here absent → deterministic uuid
    assert len(logs[0]["profileID"]) == 36


def test_inlined_functions_and_unknown_location():
    b = PprofBuilder()
    b.sample_type("samples", "count")
    f_inline = b.function("memcpy", "m.go")
    f_caller = b.function("printf", "p.go")
    lid = b.location([f_inline, f_caller])  # line[0] inlined into line[1]
    b.sample([99, lid], [4])  # 99: unresolvable location → skipped
    logs = extract_profile_logs(b.build())
    assert len(logs) == 1
    # caller precedes the inlinee root→leaf; leaf-first emit → memcpy on top
    assert logs[0]["name"] == "memcpy m.go"
    assert logs[0]["stack"] == "printf p.go"


def test_garbage_payload_raises_not_crashes():
    with pytest.raises(Exception):
        decode_pprof(b"\x1f\x8bnot-gzip")


def test_parser_operator_sparkside(spark):
    rows = [(1, _cpu_profile()), (2, None), (3, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = PprofProfileParser(passthrough=["doc_id"]).apply(df).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 2
    assert {r["name"] for r in out} == {"work work.go", "main main.go"}
    assert all(r["language"] == "go" for r in out)  # default spy


_DUMP = "/root/reference/pkg/protocol/decoder/pyroscope/test/dump_pprof_mem_data"


@pytest.mark.skipif(not os.path.exists(_DUMP), reason="reference fixture absent")
def test_reference_golden_cumulative_diff():
    """decoder_test.go TestDecoder_DecodePprofCumulative: a multipart push
    with profile + prev_profile emits ONLY the cumulative types, as
    positive per-stack deltas vs the previous tree (4 logs, exact vals)."""
    import base64 as b64
    import json as js
    import struct

    from loongcollector_spark.operators.pprof_profile import parse_push_body

    data = open(_DUMP, "rb").read()
    ln = struct.unpack(">I", data[:4])[0]
    req = js.loads(data[4 : 4 + ln])["Req"]
    body = b64.b64decode(req["Body"])
    ct = req["Header"]["Content-Type"][0]

    profile, prev, cfg = parse_push_body(body, ct)
    assert prev is not None and cfg is None
    logs = extract_profile_logs(
        profile, spy_name="gospy", sample_rate=100, prev_payload=prev,
        start_ns=1_677_124_540 * 10**9, end_ns=1_677_124_550 * 10**9,
    )
    got = sorted((l["name"], l["valueTypes"], l["val"]) for l in logs)
    assert got == [
        ("compress/flate.NewWriter /Users/evan/sdk/go1.19.4/src/compress/flate/deflate.go",
         "alloc_objects", "1.00"),
        ("compress/flate.NewWriter /Users/evan/sdk/go1.19.4/src/compress/flate/deflate.go",
         "alloc_space", "924248.00"),
        ("runtime/pprof.WithLabels /Users/evan/sdk/go1.19.4/src/runtime/pprof/label.go",
         "alloc_objects", "1820.00"),
        ("runtime/pprof.WithLabels /Users/evan/sdk/go1.19.4/src/runtime/pprof/label.go",
         "alloc_space", "524432.00"),
    ]
    # inuse types present in the profile are NOT emitted (cumulative-only
    # filter when a previous profile exists)
    assert all(l["valueTypes"].startswith("alloc_") for l in logs)


def test_cumulative_diff_first_group_seeds_only():
    def mem(vals):
        b = PprofBuilder()
        b.sample_type("alloc_space", "bytes")
        l1 = b.location([b.function("alloc", "a.go")])
        b.sample([l1], vals)
        return b.build()

    # prev has the group → delta; unseen label groups emit nothing
    logs = extract_profile_logs(mem([500]), prev_payload=mem([180]))
    assert [(l["valueTypes"], l["val"]) for l in logs] == [("alloc_space", "320.00")]
    # non-positive delta → nothing
    assert extract_profile_logs(mem([100]), prev_payload=mem([100])) == []
    assert extract_profile_logs(mem([90]), prev_payload=mem([100])) == []
