"""MySQL binlog row-event conversion — service_canal's OnRow/OnDDL mapping.

Reference semantics (studied, not ported): plugins/input/canal/
input_canal.go — OnRow (:346-460: per-row-change events with ``_host_ _db_
_table_ _event_ _id_`` meta, GTID/event-meta gates, update pairs emitting
``_old_<col>`` + ``<col>``, index-overflow ``unknow_col_<j>`` names),
columnValueToString (:299-343: ENUM index → name, SET bitmask → Go
``fmt.Sprint([]string)``, byte/JSON passthrough, default ``fmt.Sprint``),
addData PackValues (:217-264: meta stays flat, ``_old_*`` marshals into
``old_data``, the rest into ``data`` — Go map JSON, sorted keys, empty map →
``""``), and OnDDL (:274-297).

Table model: the replication listener is agent transport (scope boundary);
the table-input analog takes one row event per input row as JSON in
``content``. Values carry their Go dynamic type as a one-key object —
``{"i":5}`` int64, ``{"f":1.5}`` float64, ``{"s":"x"}`` string/bytes,
``{"bl":true}`` bool, ``null`` nil — because columnValueToString dispatches
on the VALUE type as well as the column type. The update-pair fan-out and
string building are pure Column expressions (from_json → one explode), no
Python; at scale this is a narrow map over the ingest scan.

Unmodeled connection state (documented): the table-cache refresh on column
mismatch (:373-389, a live-MySQL RPC) — the index-bound mapping that remains
after a failed refresh is what this operator implements; ``_id_`` (the
checkpoint sequence counter) comes from a caller-supplied column.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS, Operator, fget
from .gofmt import go_g
from .skywalking import go_map_json

_VAL = "struct<i:long,f:double,s:string,bl:boolean>"
ROW_EVENT_SCHEMA = (
    "struct<action:string,db:string,table:string,gtid:string,filename:string,"
    "header:struct<timestamp:long,logPos:long,eventSize:long,serverId:long>,"
    "columns:array<struct<name:string,type:string,enumValues:array<string>,"
    f"setValues:array<string>>>,rows:array<array<{_VAL}>>>"
)

# canalMetaFields (input_canal.go:211-214)
CANAL_META_FIELDS = (
    "_db_", "_event_", "_gtid_", "_host_", "_id_",
    "_table_", "_filename_", "_offset_", "_event_time_",
    "_event_log_postion_", "_event_size_", "_event_server_id_",
)


def _go_sprint(v: Column) -> Column:
    """``fmt.Sprint(rowVal)`` over the typed value union: nil → "<nil>",
    int64/bool → decimal/true-false, float64 → %v ('g' shortest), string
    verbatim."""
    return (
        F.when(v.isNull(), F.lit("<nil>"))
        .when(v.getField("s").isNotNull(), v.getField("s"))
        .when(v.getField("bl").isNotNull(), v.getField("bl").cast("string"))
        .when(v.getField("i").isNotNull(), v.getField("i").cast("string"))
        .when(v.getField("f").isNotNull(), go_g(v.getField("f")))
        .otherwise(F.lit("<nil>"))
    )


def _set_string(val: Column, set_values: Column) -> Column:
    """SET bitmask → Go ``fmt.Sprint([]string)``: "[a c]" for bits {0,2}
    (input_canal.go:317-332 builds the names in ascending bit order)."""
    names = F.filter(
        F.transform(
            set_values,
            lambda name, b: F.when(
                # bit b of val (set widths are tiny, pow(2,b) is exact)
                val.bitwiseAND(F.pow(F.lit(2.0), b.cast("double")).cast("long")) != 0,
                name,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(F.lit("["), F.array_join(names, " "), F.lit("]"))


@dataclass
class CanalRowEvents(Operator):
    """Row-event JSON in ``source_key`` → one event per row change with the
    OnRow field mapping. ``id_col`` supplies ``_id_`` (the reference's
    checkpoint counter); ``host`` is the configured MySQL address."""

    source_key: str = "content"
    host: str = "127.0.0.1:3306"
    id_col: str = "event_id"
    enable_gtid: bool = True
    enable_event_meta: bool = False
    enable_insert: bool = True
    enable_update: bool = True
    enable_delete: bool = True
    pack_values: bool = False
    set_to_string: bool = True

    def apply(self, df: DataFrame) -> DataFrame:
        ev = F.from_json(fget(self.source_key), ROW_EVENT_SCHEMA)
        passthrough = [c for c in df.columns if c != FIELDS]
        base = (
            df.select(*passthrough, ev.alias("__e__"))
            .where(F.col("__e__").isNotNull() & F.col("__e__.rows").isNotNull())
        )
        e = F.col("__e__")
        action = F.coalesce(e.getField("action"), F.lit(""))
        enabled = []
        if self.enable_insert:
            enabled.append("insert")
        if self.enable_update:
            enabled.append("update")
        if self.enable_delete:
            enabled.append("delete")
        base = base.where(action.isin(enabled))

        cols = F.coalesce(
            e.getField("columns"),
            F.expr(
                "CAST(array() AS array<struct<name:string,type:string,"
                "enumValues:array<string>,setValues:array<string>>>)"
            ),
        )
        rows = e.getField("rows")
        ncols = F.size(cols)

        def col_value(idx: Column, v: Column) -> Column:
            """columnValueToString for column `idx` (0-based)."""
            c = F.element_at(cols, idx + 1)
            ctype = c.getField("type")
            iv = v.getField("i")
            enum_vals = c.getField("enumValues")
            enum_ok = (
                iv.isNotNull() & (iv > 0) & (iv <= F.size(F.coalesce(enum_vals, F.array())))
            )
            set_ok = iv.isNotNull() & (iv >= 0) & (
                iv
                < F.pow(
                    F.lit(2.0),
                    F.size(F.coalesce(c.getField("setValues"), F.array())).cast("double"),
                ).cast("long")
            )
            out = F.when(
                (ctype == "enum") & enum_ok,
                F.element_at(enum_vals, iv.cast("int")),
            )
            if self.set_to_string:
                out = out.when(
                    (ctype == "set") & set_ok, _set_string(iv, c.getField("setValues"))
                )
            return out.otherwise(_go_sprint(v))

        def row_entries(row: Column, prefix: str) -> Column:
            """One row image → (name, value) entries; index ≥ len(columns) →
            ``unknow_col_<j>`` via fmt.Sprint (:391-409)."""
            return F.transform(
                row,
                lambda v, j: F.struct(
                    F.when(
                        j < ncols,
                        F.concat(
                            F.lit(prefix), F.element_at(cols, j + 1).getField("name")
                        ),
                    )
                    .otherwise(
                        F.concat(
                            F.lit(prefix + "unknow_col_"), j.cast("string")
                        )
                    )
                    .alias("k"),
                    F.when(j < ncols, col_value(j, v))
                    .otherwise(_go_sprint(v))
                    .alias("v"),
                ),
            )

        meta_pairs: list[Column] = [
            F.lit("_host_"), F.lit(self.host),
            F.lit("_db_"), F.coalesce(e.getField("db"), F.lit("")),
            F.lit("_table_"), F.coalesce(e.getField("table"), F.lit("")),
            F.lit("_event_"), F.concat(F.lit("row_"), action),
            F.lit("_id_"), F.col(self.id_col).cast("string"),
        ]
        log_pos = F.coalesce(e.getField("header").getField("logPos"), F.lit(0))
        if self.enable_gtid:
            meta_pairs += [
                F.lit("_gtid_"), F.coalesce(e.getField("gtid"), F.lit("")),
                F.lit("_filename_"), F.coalesce(e.getField("filename"), F.lit("")),
                F.lit("_offset_"), log_pos.cast("string"),
            ]
        if self.enable_event_meta:
            hdr = e.getField("header")
            meta_pairs += [
                F.lit("_event_time_"),
                F.coalesce(hdr.getField("timestamp"), F.lit(0)).cast("string"),
                # the reference's field name carries this typo (:359)
                F.lit("_event_log_postion_"), log_pos.cast("string"),
                F.lit("_event_size_"),
                F.coalesce(hdr.getField("eventSize"), F.lit(0)).cast("string"),
                F.lit("_event_server_id_"),
                F.coalesce(hdr.getField("serverId"), F.lit(0)).cast("string"),
            ]
        meta = F.create_map(*meta_pairs)

        # update: rows paired (old, new) — one event per pair (:371-416);
        # insert/delete: one event per row image (:437-455)
        n_updates = (F.size(rows) / 2).cast("int")
        update_maps = F.when(n_updates > 0, F.transform(
            F.sequence(F.lit(0), n_updates - 1),
            lambda p: F.map_concat(
                meta,
                F.map_from_entries(
                    F.concat(
                        row_entries(F.element_at(rows, p * 2 + 1), "_old_"),
                        row_entries(F.element_at(rows, p * 2 + 2), ""),
                    )
                ),
            ),
        )).otherwise(F.expr("CAST(array() AS array<map<string,string>>)"))
        plain_maps = F.transform(
            rows, lambda r: F.map_concat(meta, F.map_from_entries(row_entries(r, "")))
        )
        out_maps = F.when(
            action == "update",
            F.when(F.size(rows) % 2 == 0, update_maps).otherwise(
                F.expr("CAST(array() AS array<map<string,string>>)")
            ),
        ).otherwise(plain_maps)

        exploded = base.select(
            *passthrough,
            F.coalesce(e.getField("header").getField("timestamp"), F.lit(0)).alias(
                "__ts__"
            ),
            F.explode(out_maps).alias("__v__"),
        )
        if not self.pack_values:
            return exploded.select(
                *passthrough, F.col("__ts__").alias("ts_sec"), F.col("__v__").alias(FIELDS)
            )

        # PackValues (:223-264): meta flat, _old_* → old_data, rest → data
        v = F.col("__v__")
        entries = F.map_entries(v)
        meta_arr = F.array(*[F.lit(m) for m in CANAL_META_FIELDS])
        is_meta = lambda x: F.array_contains(meta_arr, x.getField("key"))  # noqa: E731

        def ent_kv(x: Column) -> Column:
            return F.struct(x.getField("key").alias("k"), x.getField("value").alias("v"))

        old_entries = F.transform(
            F.filter(
                entries,
                lambda x: ~is_meta(x) & x.getField("key").startswith("_old_"),
            ),
            ent_kv,
        )
        new_entries = F.transform(
            F.filter(
                entries,
                lambda x: ~is_meta(x) & ~x.getField("key").startswith("_old_"),
            ),
            ent_kv,
        )

        def marshal(es: Column) -> Column:
            return F.when(F.size(es) == 0, F.lit("")).otherwise(go_map_json(es))

        packed = F.map_concat(
            F.map_from_entries(F.filter(entries, is_meta)),
            F.create_map(
                F.lit("old_data"), marshal(old_entries),
                F.lit("data"), marshal(new_entries),
            ),
        )
        return exploded.select(
            *passthrough, F.col("__ts__").alias("ts_sec"), packed.alias(FIELDS)
        )
