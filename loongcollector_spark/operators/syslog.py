"""Syslog line parsers — the parse stage of the reference's service_syslog
input (plugins/input/syslog/parser.go:84-208): RFC3164 (BSD), RFC5424, and an
``auto`` mode that tries 3164 then 5424 per line (parser.go:188-201).

The reference wraps two public grammars (jeromer/syslogparser rfc3164 and
influxdata/go-syslog rfc5424) and maps the parse result into event contents
(syslog.go:410-445): ``_program_``, ``_priority_``, ``_facility_``,
``_severity_``, ``_unixtimestamp_`` (nanoseconds), ``_hostname_``,
``_content_``, plus ``_structured_data_`` (JSON, Go map marshal = key-sorted),
``_message_id_``, ``_process_id_`` when present. Failed lines are dropped
(syslog.go:403) unless IgnoreParseFailure, in which case the raw line becomes
``_content_`` with priority/facility/severity = -1 (parser.go:42-52).

Spark mapping: one anchored-regex pass per protocol (let-bound via flet so the
matcher runs once per row per protocol), all Column expressions under
whole-stage codegen — no Python in the row path.

Documented subset / divergences:
- RFC3164 carries no year/zone; the reference stamps the agent's current year
  and local zone (parser_test.go:46). Deterministic here: the pinned ``year``
  config and the session timezone.
- On parse failure with ignore_parse_failure=True the reference stamps
  time.Now().UnixNano(); here the configurable ``default_ts_ns`` (0).
- ``_client_ip_`` / ``_ip_`` are socket-endpoint metadata of the listening
  agent — no analog for a table input, not emitted.
- RFC3164 tags must be colon-terminated (all reference goldens are); a
  space-terminated tag without ':' is out of scope.
- RFC5424 STRUCTURED-DATA with escaped ``\\"`` / ``\\]`` inside param values,
  and messages *starting* with '[' after a non-nil SD, are out of scope for
  the regex grammar (noted; the reference library handles them).
- Timestamp precision is microseconds (Spark timestamp) × 1000 → the ns field
  is µs-resolution, enough for RFC3339 millisecond fractions.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS, Operator
from .common import flet

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_SEP = "\x01"

_PRI_RX = r"<(\d{1,3})>"
# time.Stamp: "Jan _2 15:04:05" — day space- or zero-padded (goldens have
# "Oct 09", "Aug  2", "Aug 17")
_TS3164_RX = r"([A-Z][a-z]{2}) {1,2}(\d{1,2}) (\d{2}):(\d{2}):(\d{2})"
# tag up to ':' with optional [pid] stripped from program ("polkitd[457]:" →
# polkitd, "LOGSTASH[-]:" → LOGSTASH); one space after ':' consumed
_TAG_RX = r"([^:\[\s]+)(?:\[[^\]]*\])?: ?"
# <PRI>1 TS HOST APP PROCID MSGID SD [MSG]; '-' = nil. SD-element
# repetition capped at 128: java regex recurses once per group iteration,
# so an unbounded `(?:\[...\])+` would let a []-flood line StackOverflow
# the executor JVM (tests/test_adversarial.py); RFC lines have a handful.
_RX5424 = (
    _PRI_RX
    + r"1 (\S+) (\S+) (\S+) (\S+) (\S+) (-|(?:\[[^\]]*\]){1,128})(?: (.*))?"
)
_TS5424_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]XXX"

def _sd_json(sd: Column) -> Column:
    """Render RFC5424 STRUCTURED-DATA as the reference's JSON
    (json.Marshal of map[string]map[string]string → keys sorted at both
    levels, syslog.go:436-438)."""
    id_rx = F.lit(r"\[([^\] ]+)(?: [^\]]*)?\]")
    body_rx = F.lit(r"\[[^\] ]+((?: [^\]]*)?)\]")
    ids = F.regexp_extract_all(sd, id_rx, 1)
    bodies = F.regexp_extract_all(sd, body_rx, 1)
    elems = F.array_sort(
        F.zip_with(ids, bodies, lambda i, b: F.struct(i.alias("id"), b.alias("body")))
    )

    def render(e: Column) -> Column:
        body = e.getField("body")
        kv_rx = F.lit(r'(\S+)="([^"]*)"')
        ks = F.regexp_extract_all(body, kv_rx, 1)
        vs = F.regexp_extract_all(body, kv_rx, 2)
        pairs = F.array_sort(
            F.zip_with(ks, vs, lambda k, v: F.struct(k.alias("k"), v.alias("v")))
        )
        inner = F.concat_ws(
            ",",
            F.transform(
                pairs,
                lambda p: F.concat(
                    F.lit('"'), p.getField("k"), F.lit('":"'), p.getField("v"), F.lit('"')
                ),
            ),
        )
        return F.concat(F.lit('"'), e.getField("id"), F.lit('":{'), inner, F.lit("}"))

    return F.concat(F.lit("{"), F.concat_ws(",", F.transform(elems, render)), F.lit("}"))


def _result(ok, pri, host, prog, ts_ns, content, proc_id, msg_id, sd) -> Column:
    return F.struct(
        ok.alias("ok"),
        pri.cast("int").alias("priority"),
        host.cast("string").alias("hostname"),
        prog.cast("string").alias("program"),
        ts_ns.cast("long").alias("ts_ns"),
        content.cast("string").alias("content"),
        proc_id.cast("string").alias("proc_id"),
        msg_id.cast("string").alias("msg_id"),
        sd.cast("string").alias("sd"),
    )


@dataclass
class SyslogParser(Operator):
    """service_syslog parse stage over the event-frame ``fields[source_key]``.

    mode: "rfc3164" | "rfc5424" | "auto" (parser.go:203-208 registry).
    ignore_parse_failure: keep failed lines with _content_=raw and
        priority/facility/severity=-1 (parser.go:42-52 + 100-107); False drops
        them (syslog.go:403). The drop path evaluates the match twice (filter
        + projection) — default True is the single-pass hot path.
    hostname_override: the AddHostname analog (syslog.go:54): RFC3164 streams
        from /dev/log carry no hostname field; when set, the hostname token is
        not expected in the line and this value is stamped.
    year: RFC3164 lines carry no year; the reference uses the current year —
        pinned here for determinism.
    """

    mode: str = "auto"
    ignore_parse_failure: bool = True
    hostname_override: str | None = None
    year: int = 2024
    default_ts_ns: int = 0
    source_key: str = "content"

    def _parse_3164(self, src: Column) -> Column:
        host_part = "" if self.hostname_override is not None else r"(\S+) "
        rx = "^" + _PRI_RX + _TS3164_RX + " " + host_part + _TAG_RX + "(.*)$"
        n = 8 if self.hostname_override is not None else 9
        matched = src.rlike(rx)
        repl = _SEP.join(f"${i + 1}" for i in range(n))
        arr = F.split(F.regexp_replace(src, rx, repl), _SEP, -1)

        def build(a: Column) -> Column:
            def g(i: int) -> Column:
                return F.element_at(a, i)

            pri = g(1).cast("int")
            mon = F.array_position(
                F.array(*[F.lit(m) for m in _MONTHS]), g(2)
            ).cast("int")
            # try_to_timestamp: Feb 30 / month miss → null → line fails, like
            # time.Parse erroring in the reference library
            ts = F.try_to_timestamp(
                F.format_string(
                    "%04d-%02d-%02d %02d:%02d:%02d",
                    F.lit(self.year), mon, g(3).cast("int"),
                    g(4).cast("int"), g(5).cast("int"), g(6).cast("int"),
                )
            )
            if self.hostname_override is not None:
                host: Column = F.lit(self.hostname_override)
                tag_i, msg_i = 7, 8
            else:
                host = g(7)
                tag_i, msg_i = 8, 9
            ok = (pri <= 191) & (mon > 0) & ts.isNotNull()
            null = F.lit(None)
            return _result(
                ok, pri, host, g(tag_i), F.unix_micros(ts) * 1000, g(msg_i),
                null, null, null,
            )

        return F.when(matched, flet(arr, build))

    def _parse_5424(self, src: Column) -> Column:
        rx = "^" + _RX5424 + "$"
        matched = src.rlike(rx)
        repl = _SEP.join(f"${i + 1}" for i in range(8))
        arr = F.split(F.regexp_replace(src, rx, repl), _SEP, -1)

        def build(a: Column) -> Column:
            def g(i: int) -> Column:
                return F.element_at(a, i)

            def nil(c: Column) -> Column:
                return F.when(c != "-", c)

            pri = g(1).cast("int")
            ts_tok = g(2)
            ts = F.try_to_timestamp(ts_tok, F.lit(_TS5424_FMT))
            ok = (pri <= 191) & ((ts_tok == "-") | ts.isNotNull())
            ts_ns = F.when(ts_tok == "-", F.lit(self.default_ts_ns)).otherwise(
                F.unix_micros(ts) * 1000
            )
            sd = F.when(g(7) != "-", _sd_json(g(7)))
            return _result(
                ok, pri,
                F.coalesce(nil(g(3)), F.lit("")),   # nil hostname → "" default
                F.coalesce(nil(g(4)), F.lit("")),   # nil appname → "" program
                ts_ns,
                F.coalesce(g(8), F.lit("")),        # absent MSG → "" content
                nil(g(5)), nil(g(6)), sd,
            )

        return F.when(matched, flet(arr, build))

    def _branches(self, src: Column) -> list[Column]:
        if self.mode == "rfc3164":
            return [self._parse_3164(src)]
        if self.mode == "rfc5424":
            return [self._parse_5424(src)]
        if self.mode == "auto":
            return [self._parse_3164(src), self._parse_5424(src)]
        raise ValueError(f"unknown syslog mode {self.mode!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        src = F.element_at(F.col(FIELDS), F.lit(self.source_key))
        branches = self._branches(src)

        if not self.ignore_parse_failure:
            ok_any = None
            for b in self._branches(src):
                c = b.isNotNull() & b.getField("ok")
                ok_any = c if ok_any is None else (ok_any | c)
            df = df.filter(ok_any)

        # let-bind every branch once; the picker below references them 2×
        bound = F.struct(
            src.alias("src"),
            *[b.alias(f"b{i}") for i, b in enumerate(branches)],
        )

        def merge(bd: Column) -> Column:
            picked = None  # first protocol whose parse succeeded wins
            for i in range(len(branches) - 1, -1, -1):
                b = bd.getField(f"b{i}")
                c = b.isNotNull() & b.getField("ok")
                picked = F.when(c, b) if picked is None else F.when(c, b).otherwise(picked)
            failed = picked.isNull()
            pri = F.when(failed, F.lit(-1)).otherwise(picked.getField("priority"))
            fac = F.when(failed, F.lit(-1)).otherwise(
                F.floor(picked.getField("priority") / 8).cast("int")
            )
            sev = F.when(failed, F.lit(-1)).otherwise(picked.getField("priority") % 8)
            host = F.when(failed, F.lit(self.hostname_override or "")).otherwise(
                picked.getField("hostname")
            )
            prog = F.when(failed, F.lit("")).otherwise(picked.getField("program"))
            content = F.when(failed, bd.getField("src")).otherwise(
                picked.getField("content")
            )
            ts_ns = F.when(failed, F.lit(self.default_ts_ns).cast("long")).otherwise(
                picked.getField("ts_ns")
            )
            m = F.create_map(
                F.lit("_program_"), prog,
                F.lit("_priority_"), pri.cast("string"),
                F.lit("_facility_"), fac.cast("string"),
                F.lit("_severity_"), sev.cast("string"),
                F.lit("_unixtimestamp_"), ts_ns.cast("string"),
                F.lit("_hostname_"), host,
                F.lit("_content_"), content,
                # optional RFC5424-only keys; dropped when null (the reference
                # only AddContent-s them when present, syslog.go:436-445)
                F.lit("_process_id_"), F.when(~failed, picked.getField("proc_id")),
                F.lit("_message_id_"), F.when(~failed, picked.getField("msg_id")),
                F.lit("_structured_data_"), F.when(~failed, picked.getField("sd")),
            )
            return F.map_filter(m, lambda k, v: v.isNotNull())

        return df.withColumn(FIELDS, flet(bound, merge))
