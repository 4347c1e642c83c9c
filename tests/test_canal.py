"""service_canal OnRow/addData semantics (plugins/input/canal/input_canal.go
OnRow :346-460, columnValueToString :299-343, addData PackValues :217-264)."""

from __future__ import annotations

import json

from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.canal import CanalRowEvents

COLUMNS = [
    {"name": "id", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "status", "type": "enum", "enumValues": ["active", "idle", "gone"]},
    {"name": "flags", "type": "set", "setValues": ["a", "b", "c"]},
]


def _ev(action, rows, **over):
    e = {
        "action": action,
        "db": "shop",
        "table": "orders",
        "gtid": "g:1",
        "filename": "mysql-bin.000001",
        "header": {"timestamp": 1663904182, "logPos": 404, "eventSize": 120,
                   "serverId": 7},
        "columns": COLUMNS,
        "rows": rows,
    }
    e.update(over)
    return json.dumps(e)


def _events(spark, payloads):
    return to_events(
        spark.createDataFrame(
            [(i, 100 + i, p) for i, p in enumerate(payloads)],
            "doc_id long, event_id long, content string",
        )
    )


def _fields(df):
    return [r["fields"] for r in df.orderBy("doc_id").collect()]


def test_insert_enum_set_and_unknown_col(spark):
    payload = _ev(
        "insert",
        [[{"i": 5}, {"s": "alice"}, {"i": 2}, {"i": 5}, {"s": "extra"}]],
    )
    out = _fields(CanalRowEvents().apply(_events(spark, [payload])))
    assert len(out) == 1
    f = out[0]
    assert f["_host_"] == "127.0.0.1:3306" and f["_db_"] == "shop"
    assert f["_table_"] == "orders" and f["_event_"] == "row_insert"
    assert f["_id_"] == "100"
    assert f["_gtid_"] == "g:1" and f["_offset_"] == "404"
    assert f["id"] == "5" and f["name"] == "alice"
    assert f["status"] == "idle"  # EnumValues[2-1]
    assert f["flags"] == "[a c]"  # bits {0,2} of 5, ascending order
    assert f["unknow_col_4"] == "extra"  # index past the column list


def test_enum_out_of_range_and_set_zero_and_nil(spark):
    payload = _ev("insert", [[None, {"bl": True}, {"i": 9}, {"i": 0}]])
    f = _fields(CanalRowEvents().apply(_events(spark, [payload])))[0]
    assert f["id"] == "<nil>"  # fmt.Sprint(nil)
    assert f["name"] == "true"
    assert f["status"] == "9"  # out of enum range → fmt.Sprint fallthrough
    assert f["flags"] == "[]"  # empty set → fmt.Sprint([]string{})


def test_update_pairs_and_odd_count_dropped(spark):
    two_pairs = _ev(
        "update",
        [
            [{"i": 1}, {"s": "old1"}, {"i": 1}, {"i": 1}],
            [{"i": 1}, {"s": "new1"}, {"i": 2}, {"i": 2}],
            [{"i": 2}, {"s": "old2"}, {"i": 3}, {"i": 3}],
            [{"i": 2}, {"s": "new2"}, {"i": 1}, {"i": 4}],
        ],
    )
    odd = _ev("update", [[{"i": 1}, {"s": "x"}, {"i": 1}, {"i": 1}]])
    out = _fields(CanalRowEvents().apply(_events(spark, [two_pairs, odd])))
    assert len(out) == 2  # 2 pairs; the odd-count event is dropped (:368-370)
    f1, f2 = out
    assert f1["_old_name"] == "old1" and f1["name"] == "new1"
    assert f1["_old_status"] == "active" and f1["status"] == "idle"
    assert f2["_old_name"] == "old2" and f2["name"] == "new2"
    assert f2["_old_flags"] == "[a b]" and f2["flags"] == "[c]"


def test_action_gates_and_event_meta(spark):
    rows = [[{"i": 1}, {"s": "x"}, {"i": 1}, {"i": 1}]]
    payloads = [_ev("insert", rows), _ev("delete", rows)]
    op = CanalRowEvents(enable_insert=False, enable_event_meta=True)
    out = _fields(op.apply(_events(spark, payloads)))
    assert len(out) == 1 and out[0]["_event_"] == "row_delete"
    assert out[0]["_event_time_"] == "1663904182"
    assert out[0]["_event_log_postion_"] == "404"  # reference's spelling
    assert out[0]["_event_size_"] == "120"
    assert out[0]["_event_server_id_"] == "7"


def test_pack_values(spark):
    upd = _ev(
        "update",
        [
            [{"i": 1}, {"s": "o"}, {"i": 1}, {"i": 1}],
            [{"i": 1}, {"s": "n"}, {"i": 2}, {"i": 2}],
        ],
    )
    ins = _ev("insert", [[{"i": 9}, {"s": "z"}, {"i": 3}, {"i": 7}]])
    out = _fields(CanalRowEvents(pack_values=True).apply(_events(spark, [upd, ins])))
    u, i = out
    assert set(u) == {"_host_", "_db_", "_table_", "_event_", "_id_", "_gtid_",
                      "_filename_", "_offset_", "old_data", "data"}
    assert json.loads(u["old_data"]) == {
        "_old_id": "1", "_old_name": "o", "_old_status": "active",
        "_old_flags": "[a]",
    }
    assert json.loads(u["data"]) == {
        "id": "1", "name": "n", "status": "idle", "flags": "[b]",
    }
    assert i["old_data"] == ""  # empty map marshals to "" (:240-243)
    assert json.loads(i["data"]) == {
        "id": "9", "name": "z", "status": "gone", "flags": "[a b c]",
    }


def test_garbage_payload_dropped(spark):
    out = CanalRowEvents().apply(_events(spark, ["nope", "{}"]))
    assert out.count() == 0
