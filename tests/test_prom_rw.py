"""Prometheus remote-write decode: snappy block codec, prompb wire decode,
NewMetricLog mapping (pkg/protocol/decoder/prometheus/decoder.go:120-152,
pkg/helper/log_helper.go:258-290)."""

import math
import struct

import pytest

from loongcollector_spark.operators.prom_rw import (
    STALE_NAN_BITS,
    PromRemoteWriteDecoder,
    SnappyError,
    decode_write_request,
    encode_write_request,
    fmt_go_g,
    normalize_time_nano,
    remote_write_to_rows,
    snappy_compress,
    snappy_decompress,
)


# --- snappy block format -------------------------------------------------------


def test_snappy_roundtrip_literals():
    for payload in (b"", b"x", b"hello world" * 10, bytes(range(256)) * 300):
        assert snappy_decompress(snappy_compress(payload)) == payload


def test_snappy_copy_1byte_offset():
    # literal "ab", then copy len=6 offset=2 → "abababab"
    stream = bytes([8]) + bytes([0x04]) + b"ab" + bytes([((6 - 4) << 2) | 1, 2])
    assert snappy_decompress(stream) == b"abababab"


def test_snappy_copy_2byte_offset():
    # literal "abcd", copy len=4 offset=4 via 2-byte-offset element
    stream = bytes([8]) + bytes([0x0C]) + b"abcd" + bytes([((4 - 1) << 2) | 2, 4, 0])
    assert snappy_decompress(stream) == b"abcdabcd"


def test_snappy_overlapping_copy():
    # literal "a", copy len=7 offset=1 → "aaaaaaaa" (RLE via overlap)
    stream = bytes([8]) + bytes([0x00]) + b"a" + bytes([((7 - 4) << 2) | 1, 1])
    assert snappy_decompress(stream) == b"aaaaaaaa"


def test_snappy_errors():
    with pytest.raises(SnappyError):
        snappy_decompress(bytes([4, 0x00]))  # truncated literal
    with pytest.raises(SnappyError):
        snappy_decompress(bytes([8, 0x04]) + b"ab" + bytes([1, 9]))  # offset OOR
    with pytest.raises(SnappyError):
        snappy_decompress(bytes([9, 0x04]) + b"ab" + bytes([((6 - 4) << 2) | 1, 2]))  # len mismatch


# --- prompb wire ---------------------------------------------------------------


def _req():
    # decoder_test.go:96-105 shape
    return [
        {
            "labels": [("__name__", "test_metric"), ("label1", "value1")],
            "samples": [(1.23, 1434055562000), (2.34, 1434055563000)],
        }
    ]


def test_write_request_roundtrip():
    data = encode_write_request(_req())
    out = decode_write_request(data)
    assert out == _req()


def test_remote_write_rows_golden():
    payload = snappy_compress(encode_write_request(_req()))
    rows = remote_write_to_rows(payload)
    assert rows == [
        ("test_metric", "label1#$#value1", "1434055562000000000", "1.23"),
        ("test_metric", "label1#$#value1", "1434055563000000000", "2.34"),
    ]


def test_labels_sorted_and_stale_nan():
    stale = struct.unpack("<d", struct.pack("<Q", STALE_NAN_BITS))[0]
    req = [
        {
            "labels": [("z", "1"), ("__name__", "m"), ("a", "2")],
            "samples": [(stale, 1434055562000)],
        }
    ]
    rows = remote_write_to_rows(snappy_compress(encode_write_request(req)))
    assert rows == [("m", "a#$#2|z#$#1", "1434055562000000000", "__STALE_NAN__")]


def test_fmt_go_g():
    assert fmt_go_g(1.0) == "1"
    assert fmt_go_g(12.5) == "12.5"
    assert fmt_go_g(float("nan")) == "NaN"
    assert fmt_go_g(float("inf")) == "+Inf"
    assert fmt_go_g(float("-inf")) == "-Inf"


def test_normalize_time_nano_digit_rules():
    # 13 digits (ms) → +000000; 19 passes; 10 scales by 10^9
    assert normalize_time_nano(1434055562123) == (
        "1434055562123000000", 1434055562, 123000000
    )
    assert normalize_time_nano(1434055562123456789) == (
        "1434055562123456789", 1434055562, 123456789
    )
    tn, sec, ns = normalize_time_nano(1434055562)
    assert tn == "1434055562000000000" and sec == 1434055562 and ns == 0


# --- Spark operator ------------------------------------------------------------


def test_decoder_spark(spark):
    good = snappy_compress(encode_write_request(_req()))
    bad = b"\x00garbage"
    df = spark.createDataFrame(
        [("r1", bytearray(good)), ("r2", bytearray(bad))],
        "req_id string, payload binary",
    )
    out = PromRemoteWriteDecoder("payload", passthrough=["req_id"]).apply(df)
    rows = sorted(
        (r.req_id, r["__name__"], r["__time_nano__"], r["__value__"], r.ts_sec)
        for r in out.collect()
    )
    assert rows == [
        ("r1", "test_metric", "1434055562000000000", "1.23", 1434055562),
        ("r1", "test_metric", "1434055563000000000", "2.34", 1434055563),
    ]
    assert math.isfinite(1.0)  # keep math import honest


# --- flusher_prometheus encode direction ----------------------------------------


def test_metrics_to_write_requests_batching_and_sorting():
    from loongcollector_spark.operators.prom_rw import metrics_to_write_requests

    evs = [
        ("m1", {"z": "1", "a": "2", "empty": "", "": "x"}, 1.5, 1434055562123456789),
        ("m2", {}, 2.0, 1434055563000000000),
        ("m3", {"b": "3"}, 3.0, 1434055564000000000),
    ]
    payloads = metrics_to_write_requests(evs, series_limit=2)
    assert len(payloads) == 2  # 2 + 1 with the limit
    got = decode_write_request(snappy_decompress(payloads[0]))
    # labels lexicographically sorted incl. __name__; empty name/value dropped
    assert got[0]["labels"] == [("__name__", "m1"), ("a", "2"), ("z", "1")]
    # ns → ms (encoder_prometheus utils.go:57)
    assert got[0]["samples"] == [(1.5, 1434055562123)]
    assert got[1]["labels"] == [("__name__", "m2")]
    got2 = decode_write_request(snappy_decompress(payloads[1]))
    assert got2[0]["labels"] == [("__name__", "m3"), ("b", "3")]


def test_prom_rw_encoder_spark_roundtrip(spark):
    from loongcollector_spark.operators.prom_rw import PromRemoteWriteEncoder

    df = spark.createDataFrame(
        [
            ("s1", "m_a", {"h": "1"}, 1.5, 1434055562123000000, 1),
            ("s1", "m_b", {"h": "2"}, 2.5, 1434055563456000000, 2),
            ("s2", "m_c", {}, 3.5, 1434055564789000000, 1),
        ],
        "sink string, metric_name string, tags map<string,string>, value double, ts_ns long, ord int",
    )
    enc = PromRemoteWriteEncoder(["sink"], order_col="ord").apply(df)
    out = PromRemoteWriteDecoder("payload", passthrough=["sink"]).apply(enc)
    rows = sorted(
        (r.sink, r["__name__"], r["__labels__"], r["__time_nano__"], r["__value__"])
        for r in out.collect()
    )
    # decode normalizes the 13-digit ms timestamp back to 19 digits
    assert rows == [
        ("s1", "m_a", "h#$#1", "1434055562123000000", "1.5"),
        ("s1", "m_b", "h#$#2", "1434055563456000000", "2.5"),
        ("s2", "m_c", "", "1434055564789000000", "3.5"),
    ]
