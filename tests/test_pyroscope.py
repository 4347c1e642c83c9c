"""Pyroscope groups-format profile decoder tests.

Goldens from pkg/protocol/decoder/pyroscope/decoder_test.go:36-83
(TestDecoder_DecodeTire re-expressed in the equivalent FormatGroups body —
the trie and groups callbacks yield the same (stack, count) pairs) and the
sequenceMapping frame examples of pkg/helper/profile/meta.go:140-156.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.pyroscope import PyroscopeGroupsDecoder
from loongcollector_spark.operators.xxh import xxh64, xxh64_hex

_META = dict(
    name_param="demo.cpu{a=b}",
    from_sec="1673495500",
    until_sec="1673495510",
    sample_rate="100",
    spy_name="ebpfspy",
    units_param="samples",
    agg_type="sum",
)
_COLS = ["i", "body"] + list(_META)


def _requests(spark, bodies, **overrides):
    meta = {**_META, **overrides}
    rows = [(i, b, *meta.values()) for i, b in enumerate(bodies)]
    df = spark.createDataFrame(rows, ["i", "body"] + list(meta))
    return to_events(df, content_col="body")


GOLDEN_BODY = "\n".join(
    [
        "foo;bar;baz 1",
        "foo;bar;baz;a 1",
        "foo;bar;baz;b 1",
        "foo;bar;baz;c 1",
        "foo;bar;bar 1",
        "foo;bar;qux 1",
        "foo;bax;bar 1",
        "zoo;boo 1",
        "zoo;bao 1",
    ]
)


def test_decoder_golden(spark):
    out = PyroscopeGroupsDecoder(tags={"cluster": "sls-mall"}).apply(
        _requests(spark, [GOLDEN_BODY])
    )
    rows = out.orderBy("i").collect()
    assert len(rows) == 9
    r = rows[0].asDict()  # the foo;bar;baz line
    assert r["name"] == "baz"
    assert r["stack"] == "bar\nfoo"
    assert r["language"] == "ebpf"
    assert r["type"] == "profile_cpu"
    assert r["units"] == "nanoseconds"
    assert r["valueTypes"] == "cpu"
    assert r["aggTypes"] == "sum"
    assert r["dataType"] == "CallStack"
    assert r["durationNs"] == "10000000000"
    assert r["labels"] == '{"__name__":"demo","a":"b","cluster":"sls-mall"}'
    assert r["val"] == "10000000.00"
    assert r["log_time_sec"] == 1673495500
    # single-frame stack → empty stack string (raw/profile.go:170-172)
    single = PyroscopeGroupsDecoder().apply(_requests(spark, ["lonely 3"]))
    s = single.collect()[0]
    assert s["name"] == "lonely" and s["stack"] == ""


def test_exact_stack_id_matches_go_xxhash(spark):
    out = PyroscopeGroupsDecoder(exact_stack_id=True).apply(
        _requests(spark, ["foo;bar;baz 1"])
    )
    assert out.collect()[0]["stackID"] == xxh64_hex(b"foo;bar;baz")
    # pin the pure-python implementation to the published xxh64 vectors
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_default_stack_id_is_spark_xxhash64_seed42(spark):
    """Default (JVM) tier: same public algorithm, Spark's pinned seed 42 —
    the documented deviation from the Go agent's seed 0."""
    out = PyroscopeGroupsDecoder().apply(_requests(spark, ["foo;bar;baz 1"]))
    got = out.collect()[0]["stackID"]
    expect = format(xxh64(b"foo;bar;baz", seed=42) - (1 << 64)
                    if xxh64(b"foo;bar;baz", seed=42) >= (1 << 63)
                    else xxh64(b"foo;bar;baz", seed=42), "x")
    # Spark renders via hex(bigint) = unsigned 16-digit-or-fewer lowercase
    assert got == format(xxh64(b"foo;bar;baz", seed=42), "x")
    assert got != xxh64_hex(b"foo;bar;baz")
    assert expect  # silence lint on the two's-complement note


def test_frame_sequence_mapping(spark):
    frame = "compress/flate.NewWriter /usr/local/go/src/compress/flate/deflate.go"
    py_frame = "lib/utility/utility.py:38 - find_nearest_vehicle"
    body = f"{frame};leaf 1"
    # go spy → FunctionFirst: "name pos" (unchanged for a one-space frame)
    go = PyroscopeGroupsDecoder().apply(
        _requests(spark, [body], spy_name="gospy")
    ).collect()[0]
    assert go["language"] == "go"
    assert go["stack"] == frame
    # pyspy → PosFirst: pos before name, middle tokens dropped
    py = PyroscopeGroupsDecoder().apply(
        _requests(spark, [f"{py_frame};leaf 1"], spy_name="pyspy")
    ).collect()[0]
    assert py["language"] == "py"
    assert py["stack"] == "find_nearest_vehicle lib/utility/utility.py:38"
    # unmapped spy → frame untouched (Go map zero value → switch default)
    other = PyroscopeGroupsDecoder().apply(
        _requests(spark, [f"{py_frame};leaf 1"], spy_name="weird")
    ).collect()[0]
    assert other["language"] == "weird"
    assert other["stack"] == py_frame
    # pyroscope- prefix is stripped before the spy suffix
    pfx = PyroscopeGroupsDecoder().apply(
        _requests(spark, [body], spy_name="pyroscope-rbspy")
    ).collect()[0]
    assert pfx["language"] == "rb"


def test_units_and_types_matrix(spark):
    cases = {
        # units → (units_out, valueTypes, type) — meta.go:104-121 + 214-225;
        # bytes → valueTypes "mem" but DetectProfileType("mem") is unmatched
        # → profile_unknown (reference quirk, mirrored)
        "samples": ("nanoseconds", "cpu", "profile_cpu"),
        "bytes": ("bytes", "mem", "profile_unknown"),
        "objects": ("objects", "mem", "profile_unknown"),
        "goroutines": ("goroutines", "goroutines", "profile_goroutines"),
        "lock_samples": ("lock_samples", "mutex", "profile_unknown"),
        "weird_unit": ("weird_unit", "unknown", "profile_unknown"),
    }
    for units, (u_out, vt, ty) in cases.items():
        r = PyroscopeGroupsDecoder().apply(
            _requests(spark, ["a;b 7"], units_param=units)
        ).collect()[0]
        assert (r["units"], r["valueTypes"], r["type"]) == (u_out, vt, ty), units
        if units == "samples":
            assert r["val"] == "70000000.00"  # 7 × (1e9 / 100)
        else:
            assert r["val"] == "7.00"  # non-samples: raw count


def test_name_key_rules(spark):
    # no .cpu suffix → __name__ keeps the full app name
    r = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 1"], name_param="svc{env=prod}")
    ).collect()[0]
    assert r["labels"] == '{"__name__":"svc","env":"prod"}'
    # profile_id label feeds profileID (meta.go:131-136) — before config tags
    r = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 1"], name_param="svc{profile_id=pid-7}")
    ).collect()[0]
    assert r["profileID"] == "pid-7"
    # no profile_id → deterministic uuid-shaped id, stable across rows
    r2 = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 1", "c;d 2"], name_param="svc{}")
    ).collect()
    ids = {x["profileID"] for x in r2}
    assert len(ids) == 1
    (pid,) = ids
    assert len(pid) == 36 and pid.count("-") == 4


def test_request_and_line_failure_semantics(spark):
    bodies = [
        "ok;fine 1\nbad;count notanint 2x",  # bad count → WHOLE request dropped
        "ok;fine 1\nnospaceline\nok2;fine 2",  # no-space line skipped only
        "ok;fine 1\n 5",  # empty stacktrace line dropped (Go would panic)
        "ok;fine 99999999999999999999",  # Atoi overflow → request dropped
    ]
    out = PyroscopeGroupsDecoder().apply(_requests(spark, bodies))
    rows = [(r["i"], r["name"]) for r in out.orderBy("i", "name").collect()]
    assert rows == [(1, "fine"), (1, "fine"), (2, "fine")]
    # malformed app key → request dropped
    bad = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 1"], name_param="svc{unclosed")
    )
    assert bad.count() == 0
    # sampleRate=0 would divide-by-zero panic in Go — pinned 100 fallback
    z = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 2"], sample_rate="0")
    ).collect()[0]
    assert z["val"] == "20000000.00"
    # count × scale int64 overflow: Go wraps silently; we drop the line
    ov = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["a;b 9223372036854775807\nc;d 1"])
    )
    assert [r["name"] for r in ov.collect()] == ["d"]


def test_trailing_semicolon_and_crlf(spark):
    out = PyroscopeGroupsDecoder().apply(
        _requests(spark, ["zoo;;boo; 4\r\nzoo;bao 1"])
    )
    rows = {r["name"]: r for r in out.collect()}
    assert set(rows) == {"boo", "bao"}
    assert rows["boo"]["stack"] == "\nzoo"  # middle empty frame survives
    assert rows["bao"]["val"] == "10000000.00"  # \r stripped before Atoi
