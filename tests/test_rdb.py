"""RDB incremental collection tests — ParseRows string-field contract and
the checkpoint advance (mysql.go:374-434, rdb.go:152-276)."""

from __future__ import annotations

from loongcollector_spark.operators.rdb import RdbIncremental


def _table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10, None),
            (2, "b", 20, "x"),
            (3, "c", 30, "y"),
            (4, "d", 40, None),
        ],
        "id long, name string, val long, note string",
    )


def test_collect_fields_and_null_render(spark):
    r = RdbIncremental(
        checkpoint_column="id", checkpoint_start="0",
        columns_hash={"val": "user_value"},
    )
    rows = sorted(
        (x["fields"] for x in r.collect(_table(spark)).collect()),
        key=lambda f: f["id"],
    )
    assert rows[0] == {"id": "1", "name": "a", "user_value": "10", "note": "null"}
    assert rows[1]["note"] == "x"
    assert len(rows) == 4


def test_checkpoint_filter_and_advance(spark):
    r = RdbIncremental(checkpoint_column="id", checkpoint_start="2")
    out = r.collect(_table(spark))
    assert sorted(f["fields"]["id"] for f in out.collect()) == ["3", "4"]
    assert r.next_checkpoint(out) == "4"
    # explicit checkpoint beats the start value; empty round → None
    out2 = r.collect(_table(spark), checkpoint="4")
    assert out2.count() == 0
    assert r.next_checkpoint(out2) is None


def test_max_sync_size_caps_in_checkpoint_order(spark):
    r = RdbIncremental(checkpoint_column="id", checkpoint_start="0", max_sync_size=2)
    out = r.collect(_table(spark))
    assert sorted(f["fields"]["id"] for f in out.collect()) == ["1", "2"]
    assert r.next_checkpoint(out) == "2"
