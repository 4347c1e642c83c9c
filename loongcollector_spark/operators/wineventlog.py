"""service_wineventlog — Windows event records → log fields.

Reference semantics (studied, not ported): plugins/input/input_wineventlog/ —
the Windows Event Log API subscription, bookmark checkpointing and the
beats ``win.Query`` XML construction are agent transport / external-library
machinery; the CONTENTFUL conversion is ``Record.ToEvent``
(eventlog/eventlog.go:67-112): the 6 unconditional identity fields, the
``addValue`` entries that drop zero values when IgnoreZeroValue is set
(:137-143 + isZero :145-163 — empty string / 0 / nil slice), the
``message`` Windows line-ending normalization, the user_* quartet gated on
a non-empty ``user_identifier``, and ``addPairs`` (:115-135): event_data /
user_data packed as a Go ``json.Marshal`` object (sorted keys, HTML
escaping ON) with empty / "Data" keys renumbered Data1, Data2, … in pair
order and user_data always carrying the trailing ``xml_name`` entry.

The EventID include / range / exclude filter is declared in the plugin
config (wineventlog.go:48-55: "4624", "4700-4800", "-4735"); the reference
delegates evaluation to the Windows API query — here it compiles to a
Column predicate with the documented semantics (an event passes when it
matches any include — or there are none — and matches no exclude).

Table model: one event record per row with typed columns; the conversion
is a single zero-shuffle projection (array fold for the Data renumbering,
``map_from_entries`` LAST_WIN for the Go map-assignment overwrites).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS, Operator
from .convert import json_quote, sorted_json_object

_PAIR_T = "array<struct<k:string,v:string>>"
_ACC_T = f"struct<es:{_PAIR_T},i:int>"


def _go_html_quote(c: Column) -> Column:
    """Go json.Marshal string with HTML escaping ON (the default Encoder):
    <, > and & become \\u003c/\\u003e/\\u0026 inside the quoted value."""
    q = json_quote(c)
    q = F.replace(q, F.lit("&"), F.lit("\\u0026"))
    q = F.replace(q, F.lit("<"), F.lit("\\u003c"))
    return F.replace(q, F.lit(">"), F.lit("\\u003e"))


def pairs_json(pairs: Column) -> Column:
    """addPairs (eventlog.go:115-135): rename empty/"Data" keys to
    Data1, Data2, … in pair order, overwrite duplicates map-style
    (last wins), render as a sorted-key JSON object."""
    init = F.expr(f"cast(struct(array(), 1) as {_ACC_T})")

    def step(acc: Column, p: Column) -> Column:
        k = p.getField("k")
        is_data = (k == "") | (k == "Data")
        key = F.when(is_data, F.concat(F.lit("Data"), acc.getField("i").cast("string"))).otherwise(k)
        ent = F.struct(key.alias("k"), p.getField("v").alias("v"))
        return F.struct(
            F.concat(acc.getField("es"), F.array(ent)).alias("es"),
            (acc.getField("i") + F.when(is_data, 1).otherwise(0)).alias("i"),
        )

    ents = F.aggregate(
        F.coalesce(pairs, F.expr(f"cast(array() as {_PAIR_T})")),
        init,
        step,
        lambda a: a.getField("es"),
    )
    # Go map assignment: duplicate keys keep the last value (session sets
    # mapKeyDedupPolicy=LAST_WIN)
    m = F.map_from_entries(ents)
    jents = F.transform(
        F.map_entries(m),
        lambda e: F.struct(
            e.getField("key").alias("k"), _go_html_quote(e.getField("value")).alias("v")
        ),
    )
    return sorted_json_object(jents)


def compile_event_id_filter(spec: str, event_id: Column) -> Column:
    """The EventID config filter (wineventlog.go:48-55): comma-separated
    single includes (4624), ranges (4700-4800) and excludes (-4735)."""
    includes: list[Column] = []
    excludes: list[Column] = []
    for tok in [t.strip() for t in spec.split(",") if t.strip()]:
        if tok.startswith("-"):
            excludes.append(event_id == int(tok[1:]))
        elif "-" in tok:
            lo, hi = tok.split("-", 1)
            includes.append(event_id.between(int(lo), int(hi)))
        else:
            includes.append(event_id == int(tok))
    cond = F.lit(True)
    if includes:
        inc = includes[0]
        for c in includes[1:]:
            inc = inc | c
        cond = cond & inc
    for c in excludes:
        cond = cond & ~c
    return cond


# (column name, output key, kind) — kinds: s=string, n=long, a=array<string>
_ADD_VALUES: list[tuple[str, str, str]] = [
    ("xml", "xml", "s"),
    ("provider_guid", "provider_guid", "s"),
    ("version", "version", "n"),
    ("level", "level", "s"),
    ("task", "task", "s"),
    ("opcode", "opcode", "s"),
    ("keywords", "keywords", "a"),
    ("message", "message", "s"),
    ("render_err", "message_error", "s"),
    ("activity_id", "activity_id", "s"),
    ("related_activity_id", "related_activity_id", "s"),
    ("process_id", "process_id", "n"),
    ("thread_id", "thread_id", "n"),
    ("processor_id", "processor_id", "n"),
    ("session_id", "session_id", "n"),
    ("kernel_time", "kernel_time", "n"),
    ("user_time", "user_time", "n"),
    ("processor_time", "processor_time", "n"),
]


@dataclass
class WinEventLogConverter(Operator):
    """Record.ToEvent as one fields-map projection. Input columns: the
    typed record fields named in ``_ADD_VALUES`` plus api/channel/
    provider_name/computer/record_id/eventid, user_identifier/user_name/
    user_domain/user_type, event_data/user_data (``array<struct<k,v>>``)
    and user_data_name. Missing optional columns are treated as absent
    (zero)."""

    ignore_zero: bool = True  # IgnoreZeroValue

    def apply(self, df: DataFrame) -> DataFrame:
        cols = set(df.columns)
        passthrough = [c for c in df.columns if c != FIELDS]

        def col_or(name: str, typ: str) -> Column:
            if name in cols:
                return F.col(name)
            return F.lit(None).cast(typ)

        def ent(key: str, v: Column) -> Column:
            return F.struct(F.lit(key).alias("k"), v.alias("v"))

        entries: list[Column] = [
            ent("type", F.coalesce(col_or("api", "string"), F.lit(""))),
            ent("log_name", F.coalesce(col_or("channel", "string"), F.lit(""))),
            ent("source_name", F.coalesce(col_or("provider_name", "string"), F.lit(""))),
            ent("computer_name", F.coalesce(col_or("computer", "string"), F.lit(""))),
            ent("record_number", F.coalesce(col_or("record_id", "long"), F.lit(0)).cast("string")),
            ent("event_id", F.coalesce(col_or("eventid", "long"), F.lit(0)).cast("string")),
        ]

        def add_value(key: str, v: Column, zero: Column, render: Column) -> Column:
            keep = F.lit(True) if not self.ignore_zero else ~zero
            return F.when(keep, F.struct(F.lit(key).alias("k"), render.alias("v")))

        maybe: list[Column] = []
        for col, key, kind in _ADD_VALUES:
            if kind == "s":
                v = F.coalesce(col_or(col, "string"), F.lit(""))
                if col == "message":
                    # sys.RemoveWindowsLineEndings
                    v = F.replace(v, F.lit("\r\n"), F.lit("\n"))
                maybe.append(add_value(key, v, v == "", v))
            elif kind == "n":
                v = F.coalesce(col_or(col, "long"), F.lit(0))
                maybe.append(add_value(key, v, v == 0, v.cast("string")))
            else:  # array — fmt.Sprint([]string) → "[a b]"; nil slice is zero
                v = col_or(col, "array<string>")
                render = F.concat(
                    F.lit("["), F.coalesce(F.array_join(v, " "), F.lit("")), F.lit("]")
                )
                maybe.append(add_value(key, v, v.isNull(), render))

        uid = F.coalesce(col_or("user_identifier", "string"), F.lit(""))
        has_user = uid != ""
        for col, key in [
            ("user_identifier", "user_identifier"),
            ("user_name", "user_name"),
            ("user_domain", "user_domain"),
            ("user_type", "user_type"),
        ]:
            v = F.coalesce(col_or(col, "string"), F.lit(""))
            keep = has_user & (F.lit(True) if not self.ignore_zero else (v != ""))
            maybe.append(F.when(keep, F.struct(F.lit(key).alias("k"), v.alias("v"))))

        user_pairs = F.concat(
            F.coalesce(col_or("user_data", _PAIR_T), F.expr(f"cast(array() as {_PAIR_T})")),
            F.array(
                F.struct(
                    F.lit("xml_name").alias("k"),
                    F.coalesce(col_or("user_data_name", "string"), F.lit("")).alias("v"),
                )
            ),
        )
        entries.append(ent("event_data", pairs_json(col_or("event_data", _PAIR_T))))
        entries.append(ent("user_data", pairs_json(user_pairs)))

        all_ents = F.concat(
            F.array(*entries),
            F.filter(F.array(*maybe), lambda e: e.isNotNull()),
        )
        return df.select(*passthrough, F.map_from_entries(all_ents).alias(FIELDS))
