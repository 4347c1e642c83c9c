"""Property-based tests (hypothesis) for the pure-Python kernels — no
SparkSession needed, so these run in milliseconds."""

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from loongcollector_spark.dataops.similarity import hyperplanes
from loongcollector_spark.operators.parse import expand_grok
from loongcollector_spark.tokens import _decode_batch, _decode_np

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@given(st.lists(ascii_text, max_size=30))
@settings(max_examples=200)
def test_decode_batch_matches_per_row(lines):
    token_lists = [[ord(c) for c in line] for line in lines]
    assert _decode_batch(token_lists) == [_decode_np(t) for t in token_lists]


@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                                      exclude_categories=("Cs",)), max_size=50))
@settings(max_examples=100)
def test_decode_np_roundtrips_any_unicode(s):
    assert _decode_np([ord(c) for c in s]) == s


@given(st.integers(1, 16), st.integers(1, 8))
@settings(max_examples=50)
def test_hyperplanes_shape_and_determinism(dim, n):
    a = hyperplanes(dim, n)
    assert len(a) == n and all(len(r) == dim for r in a)
    assert a == hyperplanes(dim, n)
    # derivation is the documented md5-parity rule
    h = hashlib.md5(b"0-0").hexdigest()
    assert a[0][0] == (1 if int(h[0], 16) % 2 == 0 else -1)


def test_expand_grok_produces_valid_regex():
    for pat in [
        "%{IP:client} %{WORD:method}",
        "%{NUMBER:n:int} %{GREEDYDATA:rest}",
        "%{COMBINEDAPACHELOG}",
    ]:
        rx = expand_grok(pat)
        re.compile(rx)  # must be a valid python regex
        assert "%{" not in rx  # fully expanded


@given(st.text(alphabet="abc123.:- ", min_size=1, max_size=40))
@settings(max_examples=100)
def test_expand_grok_literal_text_passthrough(s):
    # text without grok references expands to itself
    if "%{" not in s:
        assert expand_grok(s) == s


def test_csv_parser_matches_go_csv_fsm_on_generated_inputs(spark):
    """Property check: CsvParser's validity-regex + field-count machinery
    must agree with the strict quote FSM (_split_quoted_strict — the same
    grammar Go encoding/csv accepts) on ~400 adversarial generated lines
    over {letters, comma, quote, space}."""
    import random

    from loongcollector_spark.operators.base import FIELDS, to_events
    from loongcollector_spark.operators.parse import CsvParser, _split_quoted_strict

    rng = random.Random(42)
    alphabet = ['a', 'b', ',', '"', ' ', '""', '","', 'x,y']
    lines = []
    for _ in range(400):
        n = rng.randint(0, 8)
        lines.append("".join(rng.choice(alphabet) for _ in range(n)))
    lines = sorted(set(lines))

    keys = ["f1", "f2", "f3"]
    df = to_events(
        spark.createDataFrame(
            [(i, l) for i, l in enumerate(lines)], ["i", "content"]
        )
    )
    out = CsvParser(keys).apply(df)
    got = {r["i"]: dict(r[FIELDS]) for r in out.collect()}

    for i, line in enumerate(lines):
        cols = _split_quoted_strict(line, ",", '"')
        if cols is None:
            expect = {"content": line}  # Go csv error → source kept
        else:
            expect = {k: cols[j] for j, k in enumerate(keys) if j < len(cols)}
        assert got[i] == expect, (line, got[i], expect)
