"""OTLP trace reshaping — processor_otel_trace (Format=json).

Reference: plugins/processor/otel/processor_otel_trace.go:31-155 delegating to
pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go:19-284: each span in
the OTLP payload becomes one log event with the fixed key set
(host, service, resource, otlp.name, otlp.version, traceID, spanID,
parentSpanID, kind, name, links, logs, traceState, start, end, duration,
attribute, statusCode, statusMessage).

Spark-first: ``from_json`` with the OTLP/JSON schema → three explodes
(resourceSpans → scopeSpans → spans) → field map projection. Pure Column
expressions.

Scope: Format=json (the OTLP/JSON wire text). Format=protobuf/protojson are
binary/proto wire decodes — out of scope like the other PB ingestion paths.
Divergences (documented): Go ``json.Marshal`` HTML-escapes ``<>&`` and
formats doubles with its own shortest-round-trip algorithm — attribute JSON
matches for string/int/bool values (sorted keys replicated); a zero/absent
end timestamp uses the reference's wall-clock fallback (nondeterministic
there too)."""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS, Operator
from .common import flet

_ATTR = (
    "array<struct<key:string,value:struct<stringValue:string,intValue:string,"
    "doubleValue:double,boolValue:boolean>>>"
)
_EVENT = f"struct<timeUnixNano:string,name:string,attributes:{_ATTR}>"
_LINK = f"struct<traceId:string,spanId:string,attributes:{_ATTR}>"
_SPAN = (
    "struct<traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:int,startTimeUnixNano:string,endTimeUnixNano:string,"
    f"traceState:string,attributes:{_ATTR},events:array<{_EVENT}>,"
    f"links:array<{_LINK}>,status:struct<code:int,message:string>>"
)
OTLP_TRACE_SCHEMA = (
    "struct<resourceSpans:array<struct<"
    f"resource:struct<attributes:{_ATTR}>,"
    "scopeSpans:array<struct<scope:struct<name:string,version:string>,"
    f"spans:array<{_SPAN}>>>>>>"
)

_KINDS = {1: "internal", 2: "server", 3: "client", 4: "producer", 5: "consumer"}


def _json_str(c: Column) -> Column:
    """JSON-escape + quote a string via to_json(array(x)) → strip brackets."""
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def _attr_value_json(v: Column) -> Column:
    """OTLP any-value → the JSON text Go's marshal of AsRaw() emits
    (OTLP/JSON carries int64 as a STRING; AsRaw turns it back into a bare
    number)."""
    return (
        F.when(v.getField("stringValue").isNotNull(), _json_str(v.getField("stringValue")))
        .when(v.getField("boolValue").isNotNull(), v.getField("boolValue").cast("string"))
        .when(v.getField("intValue").isNotNull(), v.getField("intValue"))
        .when(v.getField("doubleValue").isNotNull(), v.getField("doubleValue").cast("string"))
        .otherwise(F.lit("null"))
    )


def attrs_to_json(attrs: Column, exclude: tuple[str, ...] = ()) -> Column:
    """attributes array → ``{"k":v,...}`` with SORTED keys (Go map marshal
    order)."""
    base = F.coalesce(attrs, F.expr(f"CAST(array() AS {_ATTR})"))
    if exclude:
        ex = F.array(*[F.lit(e) for e in exclude])
        base = F.filter(base, lambda e: ~F.array_contains(ex, e.getField("key")))
    rendered = F.transform(
        F.array_sort(base),
        lambda e: F.concat(
            _json_str(e.getField("key")), F.lit(":"), _attr_value_json(e.getField("value"))
        ),
    )
    return F.concat(F.lit("{"), F.array_join(rendered, ","), F.lit("}"))


def _attr_get(attrs: Column, key: str) -> Column:
    hit = F.filter(
        F.coalesce(attrs, F.expr(f"CAST(array() AS {_ATTR})")),
        lambda e: e.getField("key") == key,
    )
    # try_element_at: absent key → NULL (ANSI element_at throws on empty)
    return F.try_element_at(hit, F.lit(1)).getField("value").getField("stringValue")


def _events_json(events: Column) -> Column:
    """eventsToString: [{"attribute":{...},"name":...,"time":ns}] sorted keys."""
    base = F.coalesce(events, F.expr(f"CAST(array() AS array<{_EVENT}>)"))
    rendered = F.transform(
        base,
        lambda e: F.concat(
            F.lit('{"attribute":'),
            attrs_to_json(e.getField("attributes")),
            F.lit(',"name":'),
            _json_str(F.coalesce(e.getField("name"), F.lit(""))),
            F.lit(',"time":'),
            F.coalesce(e.getField("timeUnixNano"), F.lit("0")),
            F.lit("}"),
        ),
    )
    return F.concat(F.lit("["), F.array_join(rendered, ","), F.lit("]"))


def _links_json(links: Column) -> Column:
    """spanLinksToString: [{"attribute":{...},"spanID":...,"traceID":...}]."""
    base = F.coalesce(links, F.expr(f"CAST(array() AS array<{_LINK}>)"))
    rendered = F.transform(
        base,
        lambda l: F.concat(
            F.lit('{"attribute":'),
            attrs_to_json(l.getField("attributes")),
            F.lit(',"spanID":'),
            _json_str(F.lower(F.coalesce(l.getField("spanId"), F.lit("")))),
            F.lit(',"traceID":'),
            _json_str(F.lower(F.coalesce(l.getField("traceId"), F.lit("")))),
            F.lit("}"),
        ),
    )
    return F.concat(F.lit("["), F.array_join(rendered, ","), F.lit("]"))


@dataclass
class OtelTraceParser(Operator):
    """fields[source_key] = OTLP/JSON trace payload → one event ROW per span
    with the reference's 18-key field map; undecodable payloads are dropped
    (processor_otel_trace.go:57-66 error path)."""

    source_key: str = "content"

    def apply(self, df: DataFrame) -> DataFrame:
        src = F.element_at(F.col(FIELDS), F.lit(self.source_key))
        parsed = F.from_json(src, OTLP_TRACE_SCHEMA)
        keep = [c for c in df.columns if c != FIELDS]
        rs = (
            df.withColumn("__rs__", parsed.getField("resourceSpans"))
            .filter(F.col("__rs__").isNotNull())
            .select(*keep, F.explode("__rs__").alias("__r__"))
        )
        ss = rs.select(
            *keep,
            F.col("__r__.resource.attributes").alias("__rattrs__"),
            F.explode("__r__.scopeSpans").alias("__s__"),
        )
        spans = ss.select(
            *keep,
            "__rattrs__",
            F.col("__s__.scope").alias("__scope__"),
            F.explode("__s__.spans").alias("__sp__"),
        )

        def build(row: Column) -> Column:
            rattrs = row.getField("rattrs")
            scope = row.getField("scope")
            sp = row.getField("sp")
            def us(ns: Column) -> Column:
                # ns values exceed double precision (1.6e18 > 2^53): divide in
                # decimal, not the default double division
                return F.floor(ns.cast("decimal(25,0)") / 1000).cast("long")

            start_ns = F.coalesce(
                sp.getField("startTimeUnixNano").try_cast("long"), F.lit(0)
            )
            start_us = us(start_ns)
            end_ns_raw = F.coalesce(
                sp.getField("endTimeUnixNano").try_cast("long"), F.lit(0)
            )
            # endTimeNano == 0 → wall clock (otlp_trace_parser.go:133-136)
            end_ns = F.when(
                end_ns_raw == 0, F.unix_micros(F.current_timestamp()) * 1000
            ).otherwise(end_ns_raw)
            end_us = us(end_ns)
            kind = sp.getField("kind")
            kind_str = F.lit("")
            for k, v in _KINDS.items():
                kind_str = F.when(kind == k, F.lit(v)).otherwise(kind_str)
            code = sp.getField("status").getField("code")
            status = (
                F.when(code == 2, "ERROR").when(code == 1, "OK").otherwise("UNSET")
            )
            pairs = [
                ("host", F.coalesce(_attr_get(rattrs, "host.name"), F.lit(""))),
                ("service", F.coalesce(_attr_get(rattrs, "service.name"), F.lit(""))),
                ("resource", attrs_to_json(rattrs, ("host.name", "service.name"))),
                ("otlp.name", F.coalesce(scope.getField("name"), F.lit(""))),
                ("otlp.version", F.coalesce(scope.getField("version"), F.lit(""))),
                ("traceID", F.lower(F.coalesce(sp.getField("traceId"), F.lit("")))),
                ("spanID", F.lower(F.coalesce(sp.getField("spanId"), F.lit("")))),
                ("parentSpanID", F.lower(F.coalesce(sp.getField("parentSpanId"), F.lit("")))),
                ("kind", kind_str),
                ("name", F.coalesce(sp.getField("name"), F.lit(""))),
                ("links", _links_json(sp.getField("links"))),
                ("logs", _events_json(sp.getField("events"))),
                ("traceState", F.coalesce(sp.getField("traceState"), F.lit(""))),
                ("start", start_us.cast("string")),
                ("end", end_us.cast("string")),
                ("duration", us(end_ns - start_ns).cast("string")),
                ("attribute", attrs_to_json(sp.getField("attributes"))),
                ("statusCode", status),
                ("statusMessage", F.coalesce(sp.getField("status").getField("message"), F.lit(""))),
            ]
            args: list[Column] = []
            for k, v in pairs:
                args += [F.lit(k), v]
            return F.create_map(*args)

        bound = F.struct(
            F.col("__rattrs__").alias("rattrs"),
            F.col("__scope__").alias("scope"),
            F.col("__sp__").alias("sp"),
        )
        return spans.select(*keep, flet(bound, build).alias(FIELDS))
