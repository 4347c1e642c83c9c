"""metric_nginx_status — nginx stub_status page → metric fields.

Reference semantics (studied, not ported): plugins/input/nginx/
input_nginx.go:114-190 — the HTTP fetch is agent transport; the CONTENTFUL
part is the body parse (gatherURL: 'Active connections: N' → active, the
'server accepts handled requests' counter triple, the Reading/Writing/
Waiting gauge line) and getTags (:175-190: _server_/_port_ from the scrape
URL, default port by scheme). Table model: one status-page body per row in
``fields['content']`` plus the scrape URL; pure Column expressions, zero
shuffle. A body the bufio reader would fail on (missing lines/fields)
yields no row — the reference returns an error and collects nothing for
that URL."""

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
