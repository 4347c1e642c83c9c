"""Convert a GeoLite2-CSV-style database into the broadcast range table the
geoip operator joins against.

The reference decodes a binary mmdb per event
(plugins/processor/geoip/processor_geoip.go:35-174, oschwald/geoip2-golang).
A per-row pointer-chasing mmdb walk is the wrong shape for Spark — the
equivalent relational asset is a (lo, hi) -> location RANGE TABLE, built once
from MaxMind's own public CSV export format and broadcast to every executor:

  blocks CSV:    network (CIDR), geoname_id, latitude, longitude
  locations CSV: geoname_id, country_iso_code, country_name,
                 subdivision_1_iso_code, subdivision_1_name, city_name

Usage:
  python tools/geoip_ingest.py <blocks.csv> <locations.csv> <out.parquet>

The output parquet has columns (lo, hi, city, province, province_code,
country, country_code, latitude, longitude) sorted by lo — ready for
loongcollector_spark.operators.enrich.GeoIpProcessor. This script is pure
pandas (a GeoLite2 city table is ~3M rows — driver-side is fine; at larger
scale run the same transform as a Spark job)."""

from __future__ import annotations

import ipaddress
import sys

import pandas as pd


def cidr_to_range(network: str) -> tuple[int, int]:
    net = ipaddress.ip_network(network, strict=False)
    return int(net.network_address), int(net.broadcast_address)


def build_range_table(blocks_csv: str, locations_csv: str) -> pd.DataFrame:
    blocks = pd.read_csv(blocks_csv, dtype={"network": str})
    locs = pd.read_csv(locations_csv)
    ranges = blocks["network"].map(cidr_to_range)
    blocks = blocks.assign(
        lo=[r[0] for r in ranges], hi=[r[1] for r in ranges]
    )
    merged = blocks.merge(locs, on="geoname_id", how="left")
    out = pd.DataFrame(
        {
            "lo": merged["lo"].astype("int64"),
            "hi": merged["hi"].astype("int64"),
            "city": merged.get("city_name", pd.Series(dtype=str)).fillna(""),
            "province": merged.get("subdivision_1_name", pd.Series(dtype=str)).fillna(""),
            "province_code": merged.get(
                "subdivision_1_iso_code", pd.Series(dtype=str)
            ).fillna(""),
            "country": merged.get("country_name", pd.Series(dtype=str)).fillna(""),
            "country_code": merged.get(
                "country_iso_code", pd.Series(dtype=str)
            ).fillna(""),
            "latitude": merged.get("latitude", pd.Series(dtype=float)).fillna(0.0),
            "longitude": merged.get("longitude", pd.Series(dtype=float)).fillna(0.0),
        }
    )
    return out.sort_values("lo").reset_index(drop=True)


def main() -> None:
    if len(sys.argv) != 4:
        print(__doc__)
        raise SystemExit(2)
    blocks, locations, out = sys.argv[1:4]
    df = build_range_table(blocks, locations)
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} ranges to {out}")


if __name__ == "__main__":
    main()
