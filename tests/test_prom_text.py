"""Prometheus text-exposition parser goldens, ported from
core/unittest/prometheus/TextParserUnittest.cpp."""

import math

from loongcollector_spark.operators.prom_text import PromTextParser


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], ["i", "content"])
    rows = PromTextParser(**kw).apply(df).collect()
    return sorted(rows, key=lambda r: r["i"])


def test_multiple_lines_golden(spark):
    """TestParseMultipleLines: 7 of the 10 non-empty lines parse (the
    unterminated-quote line and the two comments fail/skip)."""
    lines = [
        "# begin",
        "",
        'test_metric1{k1="v1", k2="v 1.0',
        '  test_metric2{k1="v1", k2="v2"} 2.0 1234567890',
        'test_metric3{k1="v1",k2="v2"} 9.9410452992e+10',
        '  test_metric4{k1="v1",k2="v2"} 9.9410452992e+10 1715829785083',
        '  test_metric5{k1="v1", k2="v2" } 9.9410452992e+10 1715829785083',
        'test_metric6{k1="v1",k2="v2",} 9.9410452992e+10 1715829785083',
        'test_metric7{k1="v1",k2="v2", } 9.9410452992e+10 1715829785083  ',
        'test_metric8{k1="v1", k2="v2", } 9.9410452992e+10 1715829785083',
        "# end",
    ]
    rows = _parse(spark, lines)
    assert len(rows) == 7
    assert [r["metric_name"] for r in rows] == [f"test_metric{i}" for i in range(2, 9)]
    m4 = rows[2]
    assert m4["timestamp"] == 1715829785 and m4["ns"] == 83000000
    assert abs(m4["value"] - 9.9410452992e10) < 1
    assert dict(m4["tags"]) == {"k1": "v1", "k2": "v2", "__name__": "test_metric4"}


def test_parse_success_goldens(spark):
    """TestParseSuccess assorted cases."""
    rows = _parse(spark, ["foobar 123", "foobar2 123.456 1000000000"])
    assert rows[0]["metric_name"] == "foobar" and rows[0]["value"] == 123.0
    assert rows[1]["timestamp"] == 1000000000 and rows[1]["ns"] == 0

    # '#' inside a label value; histogram-ish names
    rows = _parse(spark, ['foo{bar="#1 az"} 24', 'foo_bucket{le="10",a="#b"} 17'])
    assert dict(rows[0]["tags"])["bar"] == "#1 az"
    assert dict(rows[1]["tags"]) == {"le": "10", "a": "#b", "__name__": "foo_bucket"}

    # incorrectly escaped backslash must survive verbatim
    rows = _parse(
        spark,
        [r'mssql{loginname="domain\somelogin",env="develop"} 56'],
    )
    assert dict(rows[0]["tags"])["loginname"] == "domain\\somelogin"

    # proper escapes \" \\ (and \n)
    rows = _parse(spark, [r'foo{bar="b\"a\\z"} -1.2', r'nl{x="a\nb"} 1'])
    assert dict(rows[0]["tags"])["bar"] == 'b"a\\z'
    assert rows[0]["value"] == -1.2
    assert dict(rows[1]["tags"])["x"] == "a\nb"

    # empty tag values kept; space between name and block
    rows = _parse(spark, ['foo {bar="baz",aa="",x="y"} 1 1000000000'])
    t = dict(rows[0]["tags"])
    assert t["aa"] == "" and t["bar"] == "baz"
    assert rows[0]["timestamp"] == 1000000000

    # empty label block with spaces + tab separators
    rows = _parse(spark, ["\t foo\t {  } 0.3\t 1000000000", "aaa", "  barbaz 0.34 1000000000"])
    assert [r["metric_name"] for r in rows] == ["foo", "barbaz"]


def test_openmetrics_inf_nan(spark):
    lines = [
        "foo Infinity", "bar +Infinity", "baz -infinity",
        "aaa +inf", "bbb -INF", "ccc INF", "ddd NaN",
    ]
    rows = _parse(spark, lines)
    vals = [r["value"] for r in rows]
    assert vals[0] == math.inf and vals[1] == math.inf and vals[3] == math.inf
    assert vals[2] == -math.inf and vals[4] == -math.inf and vals[5] == math.inf
    assert math.isnan(vals[6])


def test_parse_failure_goldens(spark):
    """TestParseFaliure: word value / invalid timestamp / garbage drop."""
    rows = _parse(spark, ["foo bar 124", "foo 123 bar", "foo", "=== 1"])
    assert rows == []


def test_honor_timestamps_off_uses_default(spark):
    rows = _parse(
        spark,
        ["m1 1.5 1715829785083"],
        honor_timestamps=False,
        default_timestamp_ms=1700000000123,
    )
    assert rows[0]["timestamp"] == 1700000000 and rows[0]["ns"] == 123000000


def test_seconds_vs_millis_timestamp(spark):
    """< 2^31 is seconds (x1000), else milliseconds (TextParser.cpp:296-301);
    honor mode requires >= 1e9 seconds."""
    rows = _parse(spark, ["a 1 1234567890", "b 1 1715829785083", "c 1 123"])
    assert [r["metric_name"] for r in rows] == ["a", "b"]
    assert rows[0]["timestamp"] == 1234567890
    assert rows[1]["timestamp"] == 1715829785


def test_event_type_and_values_variant(spark):
    rows = _parse(spark, ["m 1"])
    assert rows[0]["__event_type__"] == "metric"
    assert rows[0]["values"] is None


def test_timestamp_overflow_drops_line_not_job(spark):
    """TextParser.cpp:300-304 fails only the overflowing LINE ('timestamp
    overflow'); with ANSI casts an unguarded 1e300 or >2^63 token would abort
    the whole Spark job (NUMERIC_VALUE_OUT_OF_RANGE)."""
    rows = _parse(
        spark,
        [
            "ok 1 1234567890",
            "huge 1 1e300",            # double parses, ms cast overflows
            "big 1 99999999999999999999",  # > 2^63
            "neg 1 -1e300",            # negative overflow path
            "ok2 2 1715829785083",
        ],
    )
    assert [r["metric_name"] for r in rows] == ["ok", "ok2"]


def test_prom_text_generated_roundtrip(spark):
    """Property check over ~150 generated exposition lines: assembling
    (name, labels, value, timestamp) with randomized spacing, trailing
    commas, escape sequences, Inf/NaN case forms, seconds-vs-millis
    timestamps and trailing comments, then parsing, recovers every field —
    including the per-escape label-value decode (\\\\ → \\, \\" → ", \\n →
    newline, unknown escapes kept verbatim) and the <2^31 seconds / else
    millis timestamp split."""
    import random

    rng = random.Random(31)
    name_first = "abcXYZ_:"
    name_rest = "abcXYZ_:019"
    key_first = "abkz_"
    key_rest = "abkz_09"
    # (display chars in the quoted value, decoded result)
    val_atoms = [
        ("a", "a"), ("7", "7"), ("#", "#"), (" ", " "), (":", ":"),
        ("{", "{"), ("}", "}"), (",", ","), ("=", "="),
        ("\\\\", "\\"), ('\\"', '"'), ("\\n", "\n"), ("\\t", "\\t"),
    ]

    lines, expected = [], []
    for i in range(150):
        name = rng.choice(name_first) + "".join(
            rng.choice(name_rest) for _ in range(rng.randint(0, 10))
        )
        tags = {}
        block = ""
        shape = rng.random()
        if shape < 0.15:
            block = rng.choice(["{}", "{ }", "{  }"])
        elif shape < 0.85:
            keys = set()
            parts = []
            for _ in range(rng.randint(1, 4)):
                k = rng.choice(key_first) + "".join(
                    rng.choice(key_rest) for _ in range(rng.randint(0, 6))
                )
                if k in keys:
                    continue
                keys.add(k)
                atoms = [rng.choice(val_atoms) for _ in range(rng.randint(0, 6))]
                disp = "".join(a[0] for a in atoms)
                tags[k] = "".join(a[1] for a in atoms)
                sp = lambda: rng.choice(["", " ", "  "])  # noqa: E731
                parts.append(f'{sp()}{k}{sp()}={sp()}"{disp}"')
            block = "{" + ",".join(parts) + rng.choice(["", ",", " ,", ", "]) + "}"

        vkind = rng.random()
        if vkind < 0.6:
            vtok = rng.choice([
                repr(rng.uniform(-1e6, 1e6)),
                repr(rng.random() * 10 ** rng.randint(-8, 8)),
                str(rng.randint(-10**6, 10**6)),
            ])
            vexp = float(vtok)
        elif vkind < 0.8:
            sign = rng.choice(["", "+", "-"])
            word = "".join(rng.choice([c.lower(), c.upper()]) for c in
                           rng.choice(["inf", "infinity"]))
            vtok = sign + word
            vexp = float("-inf") if sign == "-" else float("inf")
        else:
            vtok = "".join(rng.choice([c.lower(), c.upper()]) for c in "nan")
            vexp = float("nan")

        if rng.random() < 0.5:
            secs = rng.randint(1_000_000_000, 2**31 - 1)
            tstok, ts, ns = str(secs), secs, 0
        else:
            # millis branch: must still yield seconds ≥ 1e9 (honor_timestamps
            # fails the line otherwise, TextParser.cpp:296-304)
            ms = rng.randint(10**12, 4 * 10**12)
            tstok, ts, ns = str(ms), ms // 1000, (ms % 1000) * 1_000_000

        lead = rng.choice(["", " ", "\t ", "  "])
        gap1 = rng.choice([" ", "\t", "  "]) if not block else rng.choice(["", " ", "\t"])
        gap2 = rng.choice([" ", "\t", " \t "])
        tail = rng.choice(["", "  ", " # scrape comment", "\t# x"])
        lines.append(f"{lead}{name}{gap1}{block}{gap2}{vtok} {tstok}{tail}")
        tags["__name__"] = name
        expected.append({"name": name, "tags": tags, "v": vexp, "ts": ts, "ns": ns})

    rows = _parse(spark, lines)
    assert len(rows) == len(expected)
    for r, e in zip(rows, expected):
        assert r["metric_name"] == e["name"], (r, e)
        assert dict(r["tags"]) == e["tags"], (r, e)
        if math.isnan(e["v"]):
            assert math.isnan(r["value"])
        else:
            assert r["value"] == e["v"], (r, e)
        assert (r["timestamp"], r["ns"]) == (e["ts"], e["ns"]), (r, e)
