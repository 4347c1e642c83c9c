"""processor_parse_from_pb_native: wire-format goldens.

The oracle queries prove the encode->decode round trip over the events
table; these tests pin BOTH directions against HAND-ASSEMBLED wire bytes
(field keys and payloads written out byte by byte from the proto3 spec +
protobuf_public/models/*.proto), so the encoder and decoder cannot drift
together. Failure contract from ProcessorParseFromPBNative.cpp:96-104 and
ProtocolConversion.cpp:9-108: parse error / empty event list / missing
metric value variant -> group discarded.
"""

from __future__ import annotations

import struct

import pytest

from loongcollector_spark.operators.pb import (
    PBError,
    ParseFromPB,
    decode_event_group,
    encode_event_group,
    encode_log_event,
    encode_metric_event,
    encode_span_event,
    read_varint,
    write_varint,
)


def k(fno: int, wt: int) -> bytes:
    return bytes([fno << 3 | wt])


def ld(fno: int, payload: bytes) -> bytes:
    return k(fno, 2) + bytes([len(payload)]) + payload


class TestVarint:
    def test_roundtrip_values(self):
        for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1):
            enc = write_varint(v)
            dec, i = read_varint(enc, 0)
            assert dec == v and i == len(enc)

    def test_known_encodings(self):
        # canonical examples from the protobuf encoding docs
        assert write_varint(1) == b"\x01"
        assert write_varint(150) == b"\x96\x01"
        assert read_varint(b"\x96\x01", 0) == (150, 2)

    def test_truncated(self):
        with pytest.raises(PBError):
            read_varint(b"\x96", 0)


# one LogEvent, every field, written out by hand:
#   Timestamp=1700000001000000123 (field 1 varint)
#   Contents=[{Key='k1', Value='v1'}] (field 2 message)
#   Level='warn' (field 3), FileOffset=7 (field 4), RawSize=42 (field 5)
HAND_LOG = (
    k(1, 0) + write_varint(1_700_000_001_000_000_123)
    + ld(2, ld(1, b"k1") + ld(2, b"v1"))
    + ld(3, b"warn")
    + k(4, 0) + b"\x07"
    + k(5, 0) + b"\x2a"
)
# group: Tags={'host': 'h1'} (field 2 map entry), Logs (field 3) wrapping
# repeated Events (field 1)
HAND_GROUP = ld(2, ld(1, b"host") + ld(2, b"h1")) + ld(3, ld(1, HAND_LOG))


class TestDecodeHandAssembled:
    def test_log_group(self):
        g = decode_event_group(HAND_GROUP)
        assert g is not None and g["type"] == "log"
        assert g["tags"] == {"host": "h1"}
        (ev,) = g["events"]
        assert ev["ts"] == 1_700_000_001_000_000_123
        assert ev["contents"] == {"k1": "v1"}
        assert ev["level"] == "warn"
        assert ev["file_offset"] == 7 and ev["raw_size"] == 42

    def test_encoder_matches_hand_bytes(self):
        body = encode_log_event(
            ts=1_700_000_001_000_000_123,
            contents={"k1": "v1"},
            level="warn",
            file_offset=7,
            raw_size=42,
        )
        assert body == HAND_LOG
        assert encode_event_group("log", [body], tags={"host": "h1"}) == HAND_GROUP

    def test_metric_group(self):
        # MetricEvent: ts (1), Name (2), Tags map (3), UntypedSingleValue (4)
        # with inner double field 1 (fixed64)
        inner = k(1, 1) + struct.pack("<d", 2.5)
        m = (
            k(1, 0) + write_varint(1_000_000_007)
            + ld(2, b"cpu")
            + ld(3, ld(1, b"core") + ld(2, b"0"))
            + ld(4, inner)
        )
        g = decode_event_group(ld(4, ld(1, m)))
        assert g is not None and g["type"] == "metric"
        (ev,) = g["events"]
        assert ev == {"ts": 1_000_000_007, "name": "cpu", "tags": {"core": "0"}, "value": 2.5}
        assert encode_metric_event(1_000_000_007, "cpu", 2.5, {"core": "0"}) == m

    def test_span_group(self):
        s = (
            k(1, 0) + b"\x05"
            + ld(2, b"tr1") + ld(3, b"sp1") + ld(6, b"op")
            + k(7, 0) + b"\x02"           # Kind=SERVER
            + k(8, 0) + b"\x0a" + k(9, 0) + b"\x14"
            + ld(10, ld(1, b"u") + ld(2, b"9"))
            + k(13, 0) + b"\x02"          # Status=Error
        )
        g = decode_event_group(ld(5, ld(1, s)))
        assert g is not None and g["type"] == "trace"
        (ev,) = g["events"]
        assert ev["trace_id"] == "tr1" and ev["span_id"] == "sp1"
        assert ev["kind"] == 2 and ev["status"] == 2
        assert ev["start_ns"] == 10 and ev["end_ns"] == 20
        assert ev["tags"] == {"u": "9"}
        assert (
            encode_span_event(
                5, "tr1", "sp1", "op", kind=2, start_ns=10, end_ns=20,
                tags={"u": "9"}, status=2,
            )
            == s
        )

    def test_span_inner_events_and_links(self):
        inner_ev = ld(2, b"retry") + k(1, 0) + b"\x03"  # out-of-order fields
        link = ld(1, b"tr2") + ld(2, b"sp2") + ld(4, ld(1, b"x") + ld(2, b"y"))
        s = ld(2, b"tr1") + ld(11, inner_ev) + ld(12, link)
        g = decode_event_group(ld(5, ld(1, s)))
        (ev,) = g["events"]
        assert ev["events"] == [{"ts": 3, "name": "retry", "tags": {}}]
        assert ev["links"] == [
            {"trace_id": "tr2", "span_id": "sp2", "trace_state": "", "tags": {"x": "y"}}
        ]


class TestFailureContract:
    def test_garbage_discarded(self):
        assert decode_event_group(b"\xff\xff\xff") is None

    def test_truncated_discarded(self):
        assert decode_event_group(HAND_GROUP[:-3]) is None

    def test_no_oneof_discarded(self):
        # tags only, PipelineEvents_case NOT_SET
        assert decode_event_group(ld(2, ld(1, b"a") + ld(2, b"b"))) is None

    def test_empty_events_discarded(self):
        # Logs present but zero events — cpp:14 "no log events"
        assert decode_event_group(ld(3, b"")) is None

    def test_metric_without_value_variant_discarded(self):
        m_ok = encode_metric_event(1, "a", 1.0, {})
        m_bad = k(1, 0) + b"\x01" + ld(2, b"b")  # no field-4 variant
        # one bad metric fails the WHOLE group (conversion returns false)
        assert decode_event_group(ld(4, ld(1, m_ok) + ld(1, m_bad))) is None

    def test_unknown_fields_skipped(self):
        # trailing unknown field no. 15 (varint) + no. 9 (len) are tolerated
        extra = k(15, 0) + b"\x01" + ld(9, b"zz")
        g = decode_event_group(HAND_GROUP + extra)
        assert g is not None and g["events"][0]["contents"] == {"k1": "v1"}

    def test_oneof_last_wins(self):
        logs = ld(3, ld(1, encode_log_event(1, {"a": "b"})))
        metrics = ld(4, ld(1, encode_metric_event(2, "m", 1.0, {})))
        g = decode_event_group(logs + metrics)
        assert g["type"] == "metric"

    def test_ns_timestamp_split(self):
        body = encode_log_event(ts=1_700_000_000_999_999_999, contents={"a": "b"})
        g = decode_event_group(encode_event_group("log", [body]))
        assert g["events"][0]["ts"] == 1_700_000_000_999_999_999


class TestSparkOperator:
    def test_bad_rows_dropped_good_fan_out(self, spark):
        good = encode_event_group(
            "log",
            [encode_log_event(10**9 + 5, {"m": "x"}, level="info"),
             encode_log_event(2 * 10**9, {"m": "y"})],
            tags={"src": "t"},
        )
        df = spark.createDataFrame(
            [("g1", bytearray(good)), ("g2", bytearray(b"\xff\x00garbage"))],
            "gid string, payload binary",
        )
        out = ParseFromPB("payload", passthrough=["gid"]).apply(df).collect()
        assert [r.gid for r in out] == ["g1", "g1"]
        by_msg = {r.contents["m"]: r for r in out}
        assert by_msg["x"].ts_sec == 1 and by_msg["x"].ts_ns == 5
        assert by_msg["x"].level == "info"
        assert by_msg["y"].ts_sec == 2 and by_msg["y"].ts_ns == 0
        assert all(r.group_tags == {"src": "t"} for r in out)
        assert all(r["__event_type__"] == "log" for r in out)


class TestReferenceUnittestGoldens:
    """Fixture values transcribed from
    ProcessorParseFromPBNativeUnittest.cpp:269-443 (the HttpServer + NoSQL
    span pair): field-for-field decode parity incl. Tags, ScopeTags, kind and
    status enums, and the valid/invalid group matrix."""

    def _http_span(self):
        return encode_span_event(
            ts=0,
            trace_id="cba78930fe0c2626bc60696a3453cc40",
            span_id="4083239a6a2e704e",
            parent_span_id="0000000000000000",
            name="/components/api/v1/http/success",
            kind=2,  # SERVER
            start_ns=1748313835253000000,
            end_ns=1748313840262969241,
            status=0,  # Unset
            tags={
                "http.path": "/components/api/v1/http/success",
                "endpoint": "mall-user-service:9190",
                "http.method": "POST",
                "component.name": "http",
                "http.status_code": "200",
                "http.route": "/components/api/v1/http/success",
            },
            scope_tags={
                "otel.scope.version": "1.28.0-alpha",
                "otel.scope.name": "io.opentelemetry.tomcat-8.0.15",
            },
        )

    def _nosql_span(self):
        return encode_span_event(
            ts=0,
            trace_id="cba78930fe0c2626bc60696a3453cc40",
            span_id="9a2c1a8a371d6798",
            parent_span_id="4083239a6a2e704e",
            name="LLEN",
            kind=3,  # CLIENT
            start_ns=1748313840259486017,
            end_ns=1748313840259765375,
            status=0,
            tags={
                "db.system": "redis",
                "endpoint": "redis:6379",
                "component.name": "redis",
                "db.name": "redis:6379",
                "net.peer.name": "redis:6379",
                "redis.args": "key<big_key>",
                "db.statement.id": "2191aada7df3c872",
            },
            scope_tags={
                "otel.scope.version": "1.28.0-alpha",
                "otel.scope.name": "io.opentelemetry.lettuce-5.1",
            },
        )

    def test_valid_span_pair_decodes_field_for_field(self):
        g = decode_event_group(
            encode_event_group("trace", [self._http_span(), self._nosql_span()])
        )
        assert g is not None and len(g["events"]) == 2
        http, nosql = g["events"]
        assert http["trace_id"] == "cba78930fe0c2626bc60696a3453cc40"
        assert http["span_id"] == "4083239a6a2e704e"
        assert http["parent_span_id"] == "0000000000000000"
        assert http["name"] == "/components/api/v1/http/success"
        assert http["kind"] == 2 and http["status"] == 0
        assert http["start_ns"] == 1748313835253000000
        assert http["end_ns"] == 1748313840262969241
        assert len(http["tags"]) == 6
        assert http["tags"]["http.status_code"] == "200"
        assert http["tags"]["endpoint"] == "mall-user-service:9190"
        assert len(http["scope_tags"]) == 2
        assert http["scope_tags"]["otel.scope.name"] == "io.opentelemetry.tomcat-8.0.15"
        assert nosql["span_id"] == "9a2c1a8a371d6798"
        assert nosql["parent_span_id"] == "4083239a6a2e704e"
        assert nosql["kind"] == 3 and nosql["name"] == "LLEN"
        assert len(nosql["tags"]) == 7
        assert nosql["tags"]["redis.args"] == "key<big_key>"
        assert nosql["scope_tags"]["otel.scope.name"] == "io.opentelemetry.lettuce-5.1"

    def test_invalid_protobuf_group_discarded(self):
        # TestProcessInvalidProtobufData: "invalid_protobuf_data" raw content
        assert decode_event_group(b"invalid_protobuf_data") is None

    def test_partial_invalid_batch_keeps_valid_group(self, spark):
        # TestProcessPartialInvalidProtobufData: one valid + one invalid
        # group -> the two valid span rows survive, the bad group vanishes
        good = encode_event_group(
            "trace", [self._http_span(), self._nosql_span()]
        )
        df = spark.createDataFrame(
            [("g1", bytearray(good)), ("g2", bytearray(b"invalid_protobuf_data"))],
            "gid string, payload binary",
        )
        out = ParseFromPB("payload", passthrough=["gid"]).apply(df).collect()
        assert [r.gid for r in out] == ["g1", "g1"]
        assert sorted(r.span_id for r in out) == [
            "4083239a6a2e704e",
            "9a2c1a8a371d6798",
        ]
        assert {r.scope_tags["otel.scope.version"] for r in out} == {"1.28.0-alpha"}


# --- sls_logs.proto LogGroup (Format=sls HTTP body) ---------------------------


def test_sls_log_group_roundtrip_and_required():
    from loongcollector_spark.operators.pb import (
        decode_sls_log_group,
        encode_sls_log,
        encode_sls_log_group,
        write_varint,
        _len_field,
    )

    data = encode_sls_log_group(
        [encode_sls_log(1434055562, {"a": "1", "b": "2"}, 777)],
        category="cat", topic="top", source="10.0.0.1", tags={"g": "x"},
    )
    g = decode_sls_log_group(data)
    assert g["logs"] == [
        {"time": 1434055562, "time_ns": 777, "contents": {"a": "1", "b": "2"}}
    ]
    assert (g["category"], g["topic"], g["source"]) == ("cat", "top", "10.0.0.1")
    assert g["tags"] == {"g": "x"}
    # proto2 required: a Log without Time fails the whole group
    no_time = _len_field(1, _len_field(2, _len_field(1, b"k") + _len_field(2, b"v")))
    assert decode_sls_log_group(no_time) is None
    # a Content missing Value fails too
    bad_content = _len_field(
        1, write_varint(1 << 3) + write_varint(1) + _len_field(2, _len_field(1, b"k"))
    )
    assert decode_sls_log_group(bad_content) is None
    assert decode_sls_log_group(b"") is None
    assert decode_sls_log_group(b"\xff\xff\xff") is None


def test_parse_sls_log_group_spark(spark):
    from loongcollector_spark.operators.pb import (
        ParseSlsLogGroup,
        encode_sls_log,
        encode_sls_log_group,
    )

    good = encode_sls_log_group(
        [
            encode_sls_log(100, {"m": "one"}),
            encode_sls_log(200, {"m": "two"}, 5),
        ],
        topic="t1", source="s1", tags={"env": "prod"},
    )
    df = spark.createDataFrame(
        [("r1", bytearray(good)), ("r2", bytearray(b"\x00bad"))],
        "req string, payload binary",
    )
    rows = sorted(
        (r.req, r.time, r.time_ns, dict(r.contents), r.topic, r.source, dict(r.group_tags))
        for r in ParseSlsLogGroup("payload", ["req"]).apply(df).collect()
    )
    assert rows == [
        ("r1", 100, None, {"m": "one"}, "t1", "s1", {"env": "prod"}),
        ("r1", 200, 5, {"m": "two"}, "t1", "s1", {"env": "prod"}),
    ]
