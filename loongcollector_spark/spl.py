"""Mini SPL front-end — the reference's processor_spl embeds a closed-source
SPL engine executing pipe-syntax scripts like

    * | parse-regexp content, 'rx' as a, b | project-away content
      | where status = '500' | extend kb = bytes / 1024 | stats count() by a

(core/plugin/processor/ProcessorSPL.cpp:30-160; docs
docs/cn/plugins/processor/spl/processor-spl-native.md). Each SPL verb maps
1:1 onto the DataFrame API (SURVEY.md §2.4), so the "engine" here is a thin
parser + compiler to Column expressions — Catalyst does the planning the
closed engine does internally.

Supported verbs (the documented core set):
  ``*``                                 — source (the input frame)
  ``parse-regexp <key>, '<rx>' as a, b``— regex capture groups → fields
  ``parse-json <key>``                  — one-level JSON parse → fields
  ``parse-csv <key> as a, b, c``        — delimited parse → fields
  ``where <expr>``                      — row filter (SQL expression over fields)
  ``extend <name> = <expr>``            — computed field
  ``project a, b``                      — keep only listed fields
  ``project-away a, b``                 — drop listed fields
  ``project-rename new = old``          — rename a field
  ``stats <agg>(<arg>) [as n][, …] by k1, bin(ts, 5m) [as w]``
                                        — grouped aggregation (count/sum/avg/
                                          min/max), MULTIPLE aggregates per
                                          stage, and fixed-window time
                                          bucketing via ``bin(<epoch-sec
                                          field>, <N>[s|m|h|d])`` (the SLS
                                          SPL date-floor window-stats shape)
  ``parse-kv <key>, '<delim>', '<sep>'``— key/value split → fields
  ``sort by <field> [desc]``            — global sort (scale note: total order
                                          = single-range shuffle; use only on
                                          reduced/aggregated frames)
  ``limit <n>``                         — row limit
  ``dedup by k1, k2``                   — keep one row per field-value combo
  ``parse-apsara <key>``                — apsara log-line parse → fields
  ``lookup <table> on <key> [output a, b]`` — broadcast-join a dimension
                                          table (compile_spl(tables={...}))
                                          into fields; misses untouched
  ``pack-fields a, b as dest``          — pack listed fields into one JSON
                                          object string (processor_packjson
                                          semantics, sources consumed)

Fields live in the event ``fields`` map; ``where``/``extend`` expressions are
Spark SQL snippets in which bare field names are rewritten to map lookups.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .operators.base import FIELDS, fget, fremove
from .operators.common import ParserOptions
from .operators.parse import DelimiterParser, JsonParser, RegexParser

_IDENT = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\b")
_SQL_KEYWORDS = {
    "and", "or", "not", "is", "null", "true", "false", "like", "rlike", "in",
    "between", "case", "when", "then", "else", "end", "cast", "as", "int",
    "bigint", "double", "string", "concat", "substring", "length", "upper",
    "lower", "coalesce", "round", "abs",
}


def _rewrite_expr(expr: str) -> str:
    """Rewrite bare identifiers to fields-map lookups, leaving SQL keywords,
    functions and quoted strings alone."""
    out, i = [], 0
    for m in re.finditer(r"'[^']*'", expr):
        seg = expr[i : m.start()]
        out.append(_rewrite_segment(seg))
        out.append(m.group(0))
        i = m.end()
    out.append(_rewrite_segment(expr[i:]))
    return "".join(out)


def _rewrite_segment(seg: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name.lower() in _SQL_KEYWORDS:
            return name
        # function call (identifier followed by '('): leave any SQL function
        # untouched — only bare value identifiers become fields-map lookups
        j = m.end()
        while j < len(seg) and seg[j] in " \t":
            j += 1
        if j < len(seg) and seg[j] == "(":
            return name
        return f"element_at({FIELDS}, '{name}')"

    return _IDENT.sub(sub, seg)


def _split_pipes(script: str) -> list[str]:
    """Split on | outside single quotes."""
    parts, buf, in_q = [], [], False
    for c in script:
        if c == "'":
            in_q = not in_q
            buf.append(c)
        elif c == "|" and not in_q:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _parse_as_list(s: str) -> list[str]:
    return [x.strip() for x in s.split(",") if x.strip()]


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside parentheses/quotes (``bin(ts, 5m)`` is one
    item)."""
    parts, buf, depth, in_q = [], [], 0, False
    for c in s:
        if c == "'":
            in_q = not in_q
        elif not in_q:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                parts.append("".join(buf).strip())
                buf = []
                continue
        buf.append(c)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


_DUR_UNIT_S = {"": 1, "s": 1, "m": 60, "h": 3600, "d": 86400}


_AGG_FNS = {
    "count": lambda arg: F.count(F.lit(1)),
    "sum": lambda arg: F.sum(fget(arg).cast("double")),
    "avg": lambda arg: F.avg(fget(arg).cast("double")),
    "min": lambda arg: F.min(fget(arg).cast("double")),
    "max": lambda arg: F.max(fget(arg).cast("double")),
}


def compile_spl(script: str, tables: dict[str, DataFrame] | None = None):
    """SPL script → (DataFrame -> DataFrame). Raises ValueError on unknown
    verbs (the reference pipeline fails Init on an invalid script).
    ``tables`` supplies the dimension frames referenced by ``lookup``."""
    stages = _split_pipes(script)
    if not stages or stages[0] != "*":
        raise ValueError("SPL script must start with '*'")
    ops = []
    for stage in stages[1:]:
        verb, _, rest = stage.partition(" ")
        rest = rest.strip()
        if verb == "parse-regexp":
            m = re.match(r"(\w+)\s*,\s*'(.*)'\s+as\s+(.*)$", rest, re.S)
            if not m:
                raise ValueError(f"bad parse-regexp: {stage}")
            key, rx, keys = m.group(1), m.group(2), _parse_as_list(m.group(3))
            ops.append(
                RegexParser(rx, keys, ParserOptions(source_key=key, keep_fail=True)).apply
            )
        elif verb == "parse-json":
            ops.append(
                JsonParser(ParserOptions(source_key=rest, keep_fail=True)).apply
            )
        elif verb == "parse-csv":
            m = re.match(r"(\w+)\s+as\s+(.*)$", rest, re.S)
            if not m:
                raise ValueError(f"bad parse-csv: {stage}")
            key, keys = m.group(1), _parse_as_list(m.group(2))
            ops.append(
                DelimiterParser(
                    ",", keys, ParserOptions(source_key=key, keep_fail=True)
                ).apply
            )
        elif verb == "where":
            cond = _rewrite_expr(rest)
            ops.append(lambda df, c=cond: df.filter(F.expr(c)))
        elif verb == "extend":
            name, _, expr = rest.partition("=")
            name, expr = name.strip(), _rewrite_expr(expr.strip())
            ops.append(
                lambda df, n=name, e=expr: df.withColumn(
                    FIELDS,
                    F.map_concat(
                        F.col(FIELDS),
                        F.create_map(F.lit(n), F.expr(e).cast("string")),
                    ),
                )
            )
        elif verb == "project":
            keys = _parse_as_list(rest)
            ops.append(
                lambda df, ks=keys: df.withColumn(
                    FIELDS,
                    F.map_filter(
                        F.col(FIELDS),
                        lambda k, v: F.array_contains(
                            F.array(*[F.lit(x) for x in ks]), k
                        ),
                    ),
                )
            )
        elif verb == "project-away":
            keys = _parse_as_list(rest)
            ops.append(lambda df, ks=keys: df.withColumn(FIELDS, fremove(ks)))
        elif verb == "project-rename":
            new, _, old = rest.partition("=")
            new, old = new.strip(), old.strip()

            def _rename(df, n=new, o=old):
                val = fget(o)
                m = F.map_concat(
                    fremove([o]),
                    F.when(val.isNotNull(), F.create_map(F.lit(n), val)).otherwise(
                        F.expr("map()")
                    ),
                )
                return df.withColumn(FIELDS, m)

            ops.append(_rename)
        elif verb == "stats":
            # stats <agg>(<arg>) [as name][, ...] by <key | bin(key, 5m) [as name]>[, ...]
            m = re.match(r"(.*?)\s+by\s+(.*)$", rest)
            if not m:
                raise ValueError(f"bad stats: {stage}")
            agg_specs: list[tuple[str, str, str]] = []
            for a in _split_top_commas(m.group(1)):
                am = re.match(r"(\w+)\(\s*(\w*)\s*\)(?:\s+as\s+(\w+))?$", a)
                if not am or am.group(1) not in _AGG_FNS:
                    raise ValueError(f"bad aggregate in stats: {a!r}")
                fn, arg = am.group(1), am.group(2)
                agg_specs.append(
                    (fn, arg, am.group(3) or (f"{fn}_{arg}" if arg else fn))
                )
            key_specs: list[tuple[str, int, str]] = []  # (field, bucket_s, name)
            for k in _split_top_commas(m.group(2)):
                km = re.match(
                    r"bin\(\s*(\w+)\s*,\s*(\d+)\s*([smhd]?)\s*\)(?:\s+as\s+(\w+))?$", k
                )
                if km:
                    # time bucketing: epoch-second field floored to the
                    # window (the SLS SPL date-floor / fixed-window stats
                    # shape) — a plain grouping key, so Catalyst still plans
                    # the partial/final HashAggregate pair on one exchange
                    width = int(km.group(2)) * _DUR_UNIT_S[km.group(3)]
                    if width <= 0:
                        raise ValueError(f"bad bin width: {k!r}")
                    key_specs.append((km.group(1), width, km.group(4) or km.group(1)))
                elif re.match(r"\w+$", k):
                    key_specs.append((k, 0, k))
                else:
                    raise ValueError(f"bad stats key: {k!r}")

            def _stats(df, aggs=agg_specs, keys=key_specs):
                gcols = []
                for fld, width, name in keys:
                    c = fget(fld)
                    if width:
                        c = ((c.cast("bigint") / width).cast("bigint") * width)
                    gcols.append(c.alias(name))
                acols = [_AGG_FNS[f](a).alias(n) for f, a, n in aggs]
                return df.groupBy(*gcols).agg(*acols)

            ops.append(_stats)
        elif verb == "parse-kv":
            m = re.match(r"(\w+)\s*,\s*'([^']*)'\s*,\s*'([^']*)'$", rest)
            if not m:
                raise ValueError(f"bad parse-kv: {stage}")
            key, delim, sep2 = m.group(1), m.group(2), m.group(3)
            from .operators.transforms import KeyValueSplitter

            ops.append(
                KeyValueSplitter(
                    source_key=key, delimiter=delim, separator=sep2, keep_source=False
                ).apply
            )
        elif verb == "sort":
            m = re.match(r"by\s+(\w+)(\s+desc)?$", rest)
            if not m:
                raise ValueError(f"bad sort: {stage}")
            k, desc = m.group(1), bool(m.group(2))

            def _sort(df, key=k, d=desc):
                col = fget(key)
                return df.orderBy(col.desc() if d else col.asc())

            ops.append(_sort)
        elif verb == "limit":
            if not rest.isdigit():
                raise ValueError(f"bad limit: {stage}")
            ops.append(lambda df, n=int(rest): df.limit(n))
        elif verb == "dedup":
            m = re.match(r"by\s+(.*)$", rest)
            if not m:
                raise ValueError(f"bad dedup: {stage}")
            keys = _parse_as_list(m.group(1))

            def _dedup(df, ks=keys):
                from pyspark.sql import Window

                tagged = df.withColumn(
                    "__dedup_rn__",
                    F.row_number().over(
                        Window.partitionBy(*[fget(k) for k in ks]).orderBy(F.lit(1))
                    ),
                )
                return tagged.filter(F.col("__dedup_rn__") == 1).drop("__dedup_rn__")

            ops.append(_dedup)
        elif verb == "parse-apsara":
            from .operators.parse import ApsaraParser

            ops.append(
                ApsaraParser(ParserOptions(source_key=rest, keep_fail=True)).apply
            )
        elif verb == "lookup":
            m = re.match(r"(\w+)\s+on\s+(\w+)(?:\s+output\s+(.*))?$", rest)
            if not m:
                raise ValueError(f"bad lookup: {stage}")
            table, key = m.group(1), m.group(2)
            outs = _parse_as_list(m.group(3)) if m.group(3) else None
            if tables is None or table not in tables:
                raise ValueError(f"unknown lookup table: {table}")

            def _lookup(df, d=tables[table], k=key, sel=outs):
                # DictMap-shaped enrich: broadcast-hash-join the (small) dim,
                # stringified output columns merged into fields; lookup
                # misses leave the event untouched
                from pyspark.sql.functions import broadcast

                cols = sel or [c for c in d.columns if c != k]
                dim = d.select(
                    F.col(k).cast("string").alias("__lk__"),
                    *[F.col(c).cast("string").alias(f"__lv_{c}__") for c in cols],
                )
                joined = df.join(broadcast(dim), fget(k) == F.col("__lk__"), "left")
                args: list[F.Column] = []
                for c in cols:
                    args += [F.lit(c), F.col(f"__lv_{c}__")]
                add = F.map_filter(
                    F.create_map(*args), lambda _k, v: v.isNotNull()
                )
                return joined.withColumn(
                    FIELDS, F.map_concat(F.col(FIELDS), add)
                ).drop("__lk__", *[f"__lv_{c}__" for c in cols])

            ops.append(_lookup)
        elif verb == "pack-fields":
            # `pack-fields field1, field2 as dest` — pack the listed fields
            # into one JSON object string under dest and drop the sources
            # (the SPL surface of processor_packjson,
            # plugins/processor/packjson/processor_packjson.go:26-104; JSON
            # member order = the listed order, Keep=false)
            m = re.match(r"(.+?)\s+as\s+(\w+)$", rest)
            if not m:
                raise ValueError(f"bad pack-fields: {stage}")
            srcs, dest = _parse_as_list(m.group(1)), m.group(2)
            from .operators.transforms import PackJson

            ops.append(PackJson(srcs, dest, keep=False).apply)
        elif verb == "expand-values":
            # `expand-values field [as dest]` — fan one event out per element
            # of a JSON value (public SLS SPL verb surface): a JSON array
            # yields one event per element (scalars as their text), a JSON
            # object one event per member rendered as a single-pair object;
            # a non-JSON value passes through unchanged, a missing field
            # leaves the event untouched, an empty array drops the event.
            m = re.match(r"(\w+)(?:\s+as\s+(\w+))?$", rest)
            if not m:
                raise ValueError(f"bad expand-values: {stage}")
            src, dest = m.group(1), m.group(2) or m.group(1)

            def _expand(df, s=src, d=dest):
                val = fget(s)
                arr = F.from_json(val, "array<string>")
                obj = F.from_json(val, "map<string,string>")
                outs = (
                    F.when(val.startswith("[") & arr.isNotNull(), arr)
                    .when(
                        val.startswith("{") & obj.isNotNull(),
                        F.transform(
                            F.map_entries(obj),
                            lambda e: F.to_json(
                                F.create_map(e.getField("key"), e.getField("value"))
                            ),
                        ),
                    )
                    .otherwise(F.array(val))
                )
                exploded = df.withColumn("__xv__", F.explode(outs))
                add = F.map_filter(
                    F.create_map(F.lit(d), F.col("__xv__")),
                    lambda _k, v: v.isNotNull(),
                )
                return exploded.withColumn(
                    FIELDS, F.map_concat(F.map_filter(F.col(FIELDS), lambda k, _v: k != d), add)
                ).drop("__xv__")

            ops.append(_expand)
        else:
            raise ValueError(f"unknown SPL verb: {verb}")

    def run(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return run
