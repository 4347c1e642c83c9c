"""Status-page scrapers — nginx stub_status and redis INFO bodies → metric fields.

Reference semantics (studied, not ported):

- plugins/input/nginx/input_nginx.go:114-190 — the HTTP fetch is agent
  transport; the CONTENTFUL part is the body parse (gatherURL: 'Active
  connections: N' → active, the 'server accepts handled requests' counter
  triple, the Reading/Writing/Waiting gauge line) and getTags (:175-190:
  _server_/_port_ from the scrape URL, default port by scheme). A body the
  bufio reader would fail on (missing lines/fields) yields no row — the
  reference returns an error and collects nothing for that URL.
- plugins/input/redis/input_redis.go:57-268 (metric_redis) — the TCP dial /
  AUTH handshake is agent transport; the CONTENTFUL part is
  gatherInfoOutput (:178-240): the INFO body line scan with section
  tracking, the hard break on any line containing 'ERR', the Server-section
  whitelist (lru_clock/uptime_in_seconds/redis_version only), the
  mem_allocator skip, the Tracking renames (uptime_in_seconds→uptime,
  connected_clients→clients, role→replication_role), the Keyspace
  'dbN:keys=K,expires=E,avg_ttl=T' fan-in (:245-268) with the
  total_db_{count,avg_ttl,keys,expires} roll-up, and the server/port
  (or unix socket) tag derivation from the configured URL (:85-174).

Table model: one scraped body per row in ``fields['content']`` plus the
scrape URL column; pure Column expressions (the redis scan is a single
F.aggregate fold over the split lines), zero shuffle."""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .base import FIELDS, Operator, fget
from .common import flet


def server_port_tags(url: Column) -> Column:
    """getTags: (host, port) from the scrape URL; explicit port wins, else
    80/443 by scheme, else ''. Returns struct<server,port>."""
    scheme = F.lower(F.substring_index(url, "://", 1))
    rest = F.substring_index(F.substring_index(url, "://", -1), "/", 1)
    has_port = F.locate(":", rest) > 0
    host = F.when(has_port, F.substring_index(rest, ":", 1)).otherwise(rest)
    port = F.when(has_port, F.substring_index(rest, ":", -1)).otherwise(
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .otherwise(F.lit(""))
    )
    return F.struct(host.alias("server"), port.alias("port"))


@dataclass
class NginxStatusParser(Operator):
    """stub_status body → the 7 counter/gauge fields + _server_/_port_
    tags. ``url_col`` carries the scrape URL (a top-level column)."""

    source_key: str = "content"
    url_col: str = "url"

    def apply(self, df: DataFrame) -> DataFrame:
        passthrough = [c for c in df.columns if c != FIELDS]

        def build(lines: Column) -> Column:
            l1 = F.element_at(lines, 1)
            counters = F.split(F.trim(F.coalesce(F.element_at(lines, 3), F.lit(""))), r"\s+")
            rww = F.split(F.trim(F.coalesce(F.element_at(lines, 4), F.lit(""))), r"\s+")
            ok = (
                (F.size(lines) >= 4)
                & (F.locate(":", l1) > 0)
                & (F.size(counters) >= 3)
                & (F.size(rww) >= 6)
            )
            return F.when(
                ok,
                F.create_map(
                    F.lit("active"), F.trim(F.substring_index(l1, ":", -1)),
                    F.lit("accepts"), F.element_at(counters, 1),
                    F.lit("handled"), F.element_at(counters, 2),
                    F.lit("requests"), F.element_at(counters, 3),
                    # 'Reading: R Writing: W Waiting: Q' → fields 2/4/6
                    F.lit("reading"), F.element_at(rww, 2),
                    F.lit("writing"), F.element_at(rww, 4),
                    F.lit("waiting"), F.element_at(rww, 6),
                ),
            )

        parsed = flet(F.split(fget(self.source_key), "\n"), build)
        tags = server_port_tags(F.col(self.url_col))
        return (
            df.select(*passthrough, parsed.alias("__m__"), tags.alias("__t__"))
            .where(F.col("__m__").isNotNull())
            .select(
                *passthrough,
                F.map_concat(
                    F.col("__m__"),
                    F.create_map(
                        F.lit("_server_"), F.col("__t__.server"),
                        F.lit("_port_"), F.col("__t__.port"),
                    ),
                ).alias(FIELDS),
            )
        )


_PAIR_T = "array<struct<k:string,v:string>>"


def redis_server_tags(url: Column) -> Column:
    """InputRedis.Collect address/tag derivation (input_redis.go:85-174):
    urls without a tcp:// or unix:// prefix get tcp:// prepended; tcp hosts
    without an explicit port get :6379; userinfo ([:password]@) is stripped.
    Returns struct<is_unix, server, port, socket> — tags are
    {server, port} for tcp and {socket: path} for unix sockets."""
    has_scheme = url.startswith("tcp://") | url.startswith("unix://")
    u = F.when(has_scheme, url).otherwise(F.concat(F.lit("tcp://"), url))
    is_unix = u.startswith("unix://")
    after = F.substring_index(u, "://", -1)
    # unix: url.Parse keeps the whole remainder as the path
    sock = after
    # tcp: strip userinfo, then anything after the first '/'
    hostport = F.substring_index(F.substring_index(after, "@", -1), "/", 1)
    has_port = F.locate(":", hostport) > 0
    host = F.when(has_port, F.substring_index(hostport, ":", 1)).otherwise(hostport)
    port = F.when(has_port, F.substring_index(hostport, ":", -1)).otherwise(F.lit("6379"))
    return F.struct(
        is_unix.alias("is_unix"),
        host.alias("server"),
        port.alias("port"),
        sock.alias("socket"),
    )


def _ws_trim(c: Column) -> Column:
    """strings.TrimSpace parity: F.trim only strips ASCII space."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


@dataclass
class RedisInfoParser(Operator):
    """metric_redis INFO body → metric fields + server/port (or socket) tags.

    gatherInfoOutput (input_redis.go:178-240) as ONE F.aggregate fold over
    the body's lines with accumulator struct<stop, sec, ps, keys, exp, ttl,
    dbs>: '# Section' headers update the section, any line containing 'ERR'
    stops the scan for good, 'name:value' lines pass the Server whitelist /
    mem_allocator skip, get the Tracking rename, and land as (k, v) pairs
    with map-assignment last-wins; Keyspace lines explode their
    'keys=K,expires=E,avg_ttl=T' parts into dbN_* fields while the totals
    accumulate (unparseable ints count 0, like the ignored ParseInt error).
    The finish step divides avg_ttl by the db count (Go int64 truncation)
    and appends the four total_db_* fields (:233-238)."""

    source_key: str = "content"
    url_col: str = "url"

    def apply(self, df: DataFrame) -> DataFrame:
        passthrough = [c for c in df.columns if c != FIELDS]
        empty_pairs = F.expr(f"cast(array() as {_PAIR_T})")
        zero = F.lit(0).cast("long")

        init = F.struct(
            F.lit(False).alias("stop"),
            F.lit("").alias("sec"),
            empty_pairs.alias("ps"),
            zero.alias("keys"),
            zero.alias("exp"),
            zero.alias("ttl"),
            zero.alias("dbs"),
        )

        def go_int(s: Column) -> Column:
            # strconv.ParseInt(s, 10, 64) with the error ignored → 0
            return F.when(s.rlike(r"^[+-]?[0-9]+$"), s.cast("long")).otherwise(zero)

        def merge(acc: Column, line: Column) -> Column:
            stop, sec, ps = acc.getField("stop"), acc.getField("sec"), acc.getField("ps")
            is_err = F.locate("ERR", line) > 0  # strings.Contains → hard break
            skip_line = (F.length(line) == 0) | (F.substring(line, 1, 1) == "#")
            hdr_update = (
                ~stop & ~is_err & (F.substring(line, 1, 1) == "#") & (F.length(line) > 2)
            )
            new_sec = F.when(hdr_update, line.substr(F.lit(3), F.length(line))).otherwise(sec)

            colon = F.locate(":", line)
            active = ~stop & ~is_err & ~skip_line & (colon > 0)
            name = line.substr(F.lit(1), colon - 1)
            val = _ws_trim(line.substr(colon + 1, F.length(line)))

            server_keep = name.isin("lru_clock", "uptime_in_seconds", "redis_version")
            skipped = ((sec == "Server") & ~server_keep) | (name == "mem_allocator")
            tracked = (
                F.when(name == "uptime_in_seconds", "uptime")
                .when(name == "connected_clients", "clients")
                .when(name == "role", "replication_role")
            )
            metric = F.coalesce(tracked, name)
            ks_branch = tracked.isNull() & (sec == "Keyspace")
            has_keys = F.locate("keys=", val) > 0

            valid_kv = F.filter(F.split(val, ","), lambda p: F.locate("=", p) > 0)
            ks_pairs = F.transform(
                valid_kv,
                lambda p: F.struct(
                    F.concat(name, F.lit("_"), F.substring_index(p, "=", 1)).alias("k"),
                    F.element_at(F.split(p, "="), 2).alias("v"),
                ),
            )

            def ks_total(key: str) -> Column:
                return F.aggregate(
                    valid_kv,
                    zero,
                    lambda a, p: a
                    + F.when(
                        F.substring_index(p, "=", 1) == key,
                        go_int(F.element_at(F.split(p, "="), 2)),
                    ).otherwise(zero),
                )

            normal_ok = active & ~skipped & ~ks_branch
            ks_ok = active & ~skipped & ks_branch & has_keys
            newpairs = (
                F.when(normal_ok, F.array(F.struct(metric.alias("k"), val.alias("v"))))
                .when(ks_ok, ks_pairs)
                .otherwise(empty_pairs)
            )
            # map-assignment overwrite: drop older pairs re-emitted this line
            kept = F.filter(
                ps, lambda p: ~F.exists(newpairs, lambda n: n.getField("k") == p.getField("k"))
            )
            bump = lambda f, d: (acc.getField(f) + F.when(ks_ok, d).otherwise(zero)).alias(f)  # noqa: E731
            return F.struct(
                (stop | is_err).alias("stop"),
                new_sec.alias("sec"),
                F.concat(kept, newpairs).alias("ps"),
                bump("keys", ks_total("keys")),
                bump("exp", ks_total("expires")),
                bump("ttl", ks_total("avg_ttl")),
                bump("dbs", F.lit(1).cast("long")),
            )

        def finish(acc: Column) -> Column:
            dbs, ttl = acc.getField("dbs"), acc.getField("ttl")
            avg = F.when(dbs > 0, (ttl / dbs).cast("long")).otherwise(ttl)
            totals = F.array(
                F.struct(F.lit("total_db_count").alias("k"), dbs.cast("string").alias("v")),
                F.struct(F.lit("total_db_avg_ttl").alias("k"), avg.cast("string").alias("v")),
                F.struct(F.lit("total_db_keys").alias("k"), acc.getField("keys").cast("string").alias("v")),
                F.struct(F.lit("total_db_expires").alias("k"), acc.getField("exp").cast("string").alias("v")),
            )
            kept = F.filter(
                acc.getField("ps"),
                lambda p: ~F.exists(totals, lambda t: t.getField("k") == p.getField("k")),
            )
            return F.map_from_entries(F.concat(kept, totals))

        # bufio.ScanLines: split on '\n', drop one trailing '\r'
        parsed = F.aggregate(F.split(fget(self.source_key), "\r?\n"), init, merge, finish)
        tags = redis_server_tags(F.col(self.url_col))
        tag_map = F.when(
            tags.getField("is_unix"),
            F.create_map(F.lit("socket"), tags.getField("socket")),
        ).otherwise(
            F.create_map(
                F.lit("server"), tags.getField("server"),
                F.lit("port"), tags.getField("port"),
            )
        )
        return (
            df.where(fget(self.source_key).isNotNull())
            .select(
                *passthrough,
                F.map_concat(parsed, tag_map).alias(FIELDS),
            )
        )
