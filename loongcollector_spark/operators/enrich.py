"""Lookup enrichment — the reference's only join-like operators, built as
broadcast hash joins (the dims are small by construction: dict files are capped
at MaxDictSize=1000, processor_dict_map.go:30-41).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from .base import FIELDS, Operator, fget


def read_dict_csv(path: str, max_size: int = 1000) -> dict[str, str]:
    """2-column CSV → dict (processor_dict_map.go readCsvFile:96-137; duplicate
    key with a different value is an error)."""
    out: dict[str, str] = {}
    with open(path, newline="") as f:
        for i, row in enumerate(csv.reader(f)):
            if i >= max_size:
                break
            if len(row) != 2:
                raise ValueError(f"illegal input: row {i + 1}'s length is not 2")
            if row[0] in out and out[row[0]] != row[1]:
                raise ValueError(f"hash crash: key {row[0]} redefined")
            out[row[0]] = row[1]
    if not out:
        raise ValueError(f"empty file: {path}")
    return out


@dataclass
class DictMap(Operator):
    """processor_dict_map (plugins/processor/dictmap/processor_dict_map.go:30-198):
    map fields[source_key] through a lookup dict into dest_key.

    - hit: dest gets mapped value; mode='fill' keeps a pre-existing dest,
      'overwrite' replaces it. When dest_key == source_key the source value is
      replaced in place.
    - miss: nothing happens unless handle_missing, then dest gets ``missing``.

    Implementation: the dict is tiny → a literal map-lookup expression (fully
    codegen, no shuffle, the degenerate broadcast join). For large dims use
    DictMapJoin below."""

    map_dict: Mapping[str, str]
    source_key: str
    dest_key: str | None = None
    handle_missing: bool = False
    missing: str = "Unknown"
    mode: str = "overwrite"  # 'fill' | 'overwrite'
    max_dict_size: int = 1000

    def __post_init__(self):
        if len(self.map_dict) > self.max_dict_size:
            raise ValueError(f"map size exceeds maximum length {self.max_dict_size}")
        if self.mode not in ("fill", "overwrite"):
            raise ValueError(f'invalid mode {self.mode}, use "fill" or "overwrite"')

    def apply(self, df: DataFrame) -> DataFrame:
        dest = self.dest_key or self.source_key
        in_place = dest == self.source_key
        args = []
        for k, v in self.map_dict.items():
            args += [F.lit(k), F.lit(v)]
        lookup = F.element_at(F.create_map(*args), fget(self.source_key)) if args else F.lit(None)

        src = fget(self.source_key)
        cur_dest = fget(dest)
        hit = src.isNotNull() & lookup.isNotNull()
        miss_fill = src.isNull() & F.lit(self.handle_missing)

        if in_place:
            new_val = F.when(hit, lookup).otherwise(
                F.when(miss_fill, F.lit(self.missing))
            )
        else:
            on_hit = (
                F.coalesce(cur_dest, lookup) if self.mode == "fill" else lookup
            )
            on_miss = (
                F.coalesce(cur_dest, F.lit(self.missing))
                if self.mode == "fill"
                else F.lit(self.missing)
            )
            new_val = F.when(hit, on_hit).otherwise(F.when(miss_fill, on_miss))

        merged = F.map_concat(
            F.col(FIELDS),
            F.when(new_val.isNotNull(), F.create_map(F.lit(dest), new_val)).otherwise(
                F.expr("map()")
            ),
        )
        return df.withColumn(FIELDS, merged)


@dataclass
class BroadcastLookup(Operator):
    """Generalized lookup enrich: broadcast-hash-join the event frame against a
    dim DataFrame on a top-level key column (the north-rule source/route_key
    lookup rides this). Left join; missing rows keep NULLs (caller coalesces)."""

    dim: DataFrame
    on: str
    select: list[str] | None = None  # dim columns to add (default: all non-key)

    def apply(self, df: DataFrame) -> DataFrame:
        cols = self.select or [c for c in self.dim.columns if c != self.on]
        dim = self.dim.select(self.on, *cols)
        return df.join(broadcast(dim), on=self.on, how="left")


def ip_range_lookup(
    df: DataFrame, ranges: DataFrame, ip_col: str, spark: SparkSession | None = None
) -> DataFrame:
    """processor_geoip analog (plugins/processor/geoip/processor_geoip.go:35-174):
    range join ip_int BETWEEN lo AND hi against a broadcast range table. The
    mmdb decode itself is out of scope (no geoip2 in-container); the Spark-side
    plumbing is the broadcast range join."""
    ip_int = (
        F.split(F.col(ip_col), r"\.").getItem(0).cast("long") * 16777216
        + F.split(F.col(ip_col), r"\.").getItem(1).cast("long") * 65536
        + F.split(F.col(ip_col), r"\.").getItem(2).cast("long") * 256
        + F.split(F.col(ip_col), r"\.").getItem(3).cast("long")
    )
    df = df.withColumn("__ip_int__", ip_int)
    joined = df.join(
        broadcast(ranges),
        (F.col("__ip_int__") >= ranges["lo"]) & (F.col("__ip_int__") <= ranges["hi"]),
        "left",
    )
    return joined.drop("__ip_int__", "lo", "hi")
