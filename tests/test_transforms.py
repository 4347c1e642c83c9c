"""Transform/enrich operator goldens (semantics per plugins/processor/*_test.go)."""

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS
from loongcollector_spark.operators.enrich import DictMap
from loongcollector_spark.operators.transforms import (
    AddFields,
    Anchor,
    Base64Decode,
    Base64Encode,
    Desensitize,
    Drop,
    DropLastKey,
    FieldsWithCondition,
    KeyValueSplitter,
    Md5,
    PackJson,
    PickKey,
    Rename,
    StringReplace,
)


def _frame(spark, *field_dicts):
    rows = [(i, d) for i, d in enumerate(field_dicts)]
    return spark.createDataFrame(rows, "i int, fields map<string,string>")


def _fields(df):
    return {r["i"]: r[FIELDS] for r in df.collect()}


def test_add_fields(spark):
    df = _frame(spark, {"a": "1"})
    assert _fields(AddFields({"b": "2"}).apply(df))[0] == {"a": "1", "b": "2"}
    # overwrite by default; ignore_if_exist keeps existing
    assert _fields(AddFields({"a": "9"}).apply(df))[0] == {"a": "9"}
    assert _fields(AddFields({"a": "9"}, ignore_if_exist=True).apply(df))[0] == {"a": "1"}


def test_rename(spark):
    df = _frame(spark, {"a": "1", "b": "2"})
    assert _fields(Rename({"a": "x"}).apply(df))[0] == {"x": "1", "b": "2"}
    # missing source key: no-op
    assert _fields(Rename({"zz": "y"}).apply(df))[0] == {"a": "1", "b": "2"}


def test_drop_pick(spark):
    df = _frame(spark, {"a": "1", "b": "2", "c": "3"})
    assert _fields(Drop(["b"]).apply(df))[0] == {"a": "1", "c": "3"}
    assert _fields(PickKey(include=["a", "c"]).apply(df))[0] == {"a": "1", "c": "3"}
    assert _fields(PickKey(exclude=["a"]).apply(df))[0] == {"b": "2", "c": "3"}


def test_drop_last_key(spark):
    df = _frame(spark, {"raw": "x", "k1": "1", "k2": "2"})
    # all include keys present → drop
    assert _fields(DropLastKey("raw", ["k1", "k2"]).apply(df))[0] == {"k1": "1", "k2": "2"}
    df2 = _frame(spark, {"raw": "x", "k1": "1"})
    assert _fields(DropLastKey("raw", ["k1", "k2"]).apply(df2))[0] == {"raw": "x", "k1": "1"}


def test_string_replace(spark):
    df = _frame(spark, {"c": "hello world hello"})
    assert _fields(StringReplace("c", "regex", "hello", "hi").apply(df))[0] == {
        "c": "hi world hi"
    }
    assert _fields(StringReplace("c", "const", "world", "there").apply(df))[0] == {
        "c": "hello there hello"
    }
    dfq = _frame(spark, {"c": '"quoted"'})
    assert _fields(StringReplace("c", "unquote").apply(dfq))[0] == {"c": "quoted"}


def test_desensitize_const(spark):
    # doc example: password fields masked after 'password:'
    df = _frame(spark, {"c": "user:a password:12345 end"})
    out = Desensitize("c", "const", content_pattern=r"[^ ]*", prefix_pattern="password:",
                      replacing_string="********").apply(df)
    assert _fields(out)[0] == {"c": "user:a password:******** end"}


def test_desensitize_md5(spark):
    import hashlib

    df = _frame(spark, {"c": "id=42&x=1"})
    out = Desensitize("c", "md5", content_pattern=r"[0-9]+", prefix_pattern="id=").apply(df)
    # reference emits UPPERCASE md5 hex (TestCastSensWordMD5 golden)
    want = "id=" + hashlib.md5(b"42").hexdigest().upper() + "&x=1"
    assert _fields(out)[0] == {"c": want}


def test_base64_md5(spark):
    import base64
    import hashlib

    df = _frame(spark, {"c": "hello"})
    assert _fields(Base64Encode("c", "e").apply(df))[0]["e"] == base64.b64encode(
        b"hello"
    ).decode()
    df2 = _frame(spark, {"c": "aGVsbG8="})
    assert _fields(Base64Decode("c", "d").apply(df2))[0]["d"] == "hello"
    assert _fields(Md5("c", "m").apply(df))[0]["m"] == hashlib.md5(b"hello").hexdigest()


def test_packjson(spark):
    df = _frame(spark, {"a": "1", "b": "2"})
    out = _fields(PackJson(["a", "b"], "packed").apply(df))[0]
    assert out["packed"] == '{"a":"1","b":"2"}'
    out2 = _fields(PackJson(["a", "b"], "packed", keep=False).apply(df))[0]
    assert set(out2.keys()) == {"packed"}


def test_kv_splitter(spark):
    df = _frame(spark, {"content": "class:main\tuser:root\tmsg:a:b:c"})
    out = _fields(KeyValueSplitter().apply(df))[0]
    # value keeps everything after the FIRST separator
    assert out == {"class": "main", "user": "root", "msg": "a:b:c"}


def test_kv_splitter_no_separator(spark):
    df = _frame(spark, {"content": "a:1\tnosep"})
    out = _fields(KeyValueSplitter().apply(df))[0]
    # 0-based occurrence counter (key_value_splitter.go:100,118)
    assert out == {"a": "1", "no_separator_key_0": "nosep"}


def test_anchor(spark):
    df = _frame(spark, {"content": "time [05 May] level [INFO] done"})
    out = _fields(Anchor("content", "level [", "]", "level").apply(df))[0]
    assert out["level"] == "INFO"


def test_fields_with_condition(spark):
    df = _frame(spark, {"level": "ERROR", "msg": "x"}, {"level": "INFO", "msg": "y"})
    op = FieldsWithCondition(
        cases=[
            {"when": {"level": ("equals", "ERROR")}, "add": {"alarm": "1"}},
            {"when": {"level": ("equals", "INFO")}, "drop": ["msg"]},
        ],
    )
    f = _fields(op.apply(df))
    assert f[0] == {"level": "ERROR", "msg": "x", "alarm": "1"}
    assert f[1] == {"level": "INFO"}


def test_fields_with_condition_drop_no_match(spark):
    df = _frame(spark, {"level": "DEBUG"})
    op = FieldsWithCondition(
        cases=[{"when": {"level": ("equals", "ERROR")}, "add": {"a": "1"}}],
        drop_if_not_match=True,
    )
    assert _fields(op.apply(df)) == {}


def test_dict_map_semantics(spark):
    # processor_dict_map_test.go semantics
    d = {"400": "client error", "500": "server error"}
    df = _frame(spark, {"status": "400"}, {"status": "200"}, {"other": "x"})
    # in-place overwrite on hit; dict-miss → untouched
    f = _fields(DictMap(d, "status").apply(df))
    assert f[0] == {"status": "client error"}
    assert f[1] == {"status": "200"}
    assert f[2] == {"other": "x"}
    # dest key + handle_missing: absent source key → Missing default
    f2 = _fields(DictMap(d, "status", dest_key="class", handle_missing=True, missing="?").apply(df))
    assert f2[0] == {"status": "400", "class": "client error"}
    assert f2[1] == {"status": "200"}  # dict miss: dest not written
    assert f2[2] == {"other": "x", "class": "?"}
    # fill mode keeps existing dest
    df3 = _frame(spark, {"status": "400", "class": "keepme"})
    f3 = _fields(DictMap(d, "status", dest_key="class", mode="fill").apply(df3))
    assert f3[0] == {"status": "400", "class": "keepme"}


def test_dict_map_rejects_oversize_and_bad_mode(spark):
    import pytest

    with pytest.raises(ValueError):
        DictMap({str(i): "x" for i in range(5)}, "k", max_dict_size=3)
    with pytest.raises(ValueError):
        DictMap({"a": "b"}, "k", mode="banana")


def test_kv_split_occurrence_counters(spark):
    """Anomaly prefixes use 0-based occurrence counters incremented per use
    (key_value_splitter.go:99-100,118,127), not pair positions."""
    df = _frame(spark, {"content": "a:1\tnosep1\tb:2\tnosep2\t:v1\t:v2"})
    out = _fields(KeyValueSplitter(delimiter="\t", separator=":").apply(df))[0]
    assert out == {
        "a": "1",
        "b": "2",
        "no_separator_key_0": "nosep1",
        "no_separator_key_1": "nosep2",
        "empty_key_0": "v1",
        "empty_key_1": "v2",
    }
