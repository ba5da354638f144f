"""Geospatial column expressions — no geo library required.

The reference's geo surface (SURVEY §2.10 geo rows, J8/J9/A10):
haversine distances, point-in-polygon against the city boundary,
k-NN station ranking, H3 cell bucketing. Here: pure Catalyst column
math for distance and grid bucketing, and a higher-order-function
ray-casting point-in-polygon over a vertex array — all JVM-side, no
UDF, no Sedona dependency (swap in Sedona's ST_* at deployment if
available; the call sites keep the same shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in km between two lat/lon points."""
    to_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    la1, lo1, la2, lo2 = (F.radians(to_col(c)) for c in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = F.sin(dlat / 2) ** 2 + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(
    lat: Column | str, lon: Column | str, *, cells_per_degree: int = 100
) -> Column:
    """H3-style spatial bucketing on a regular lat/lon grid: one long
    key per cell. Equi-joinable — turns spatial joins into bucket
    joins (refine with exact distance inside the bucket)."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    lat_idx = F.floor((la + 90.0) * cells_per_degree).cast("long")
    lon_idx = F.floor((lo + 180.0) * cells_per_degree).cast("long")
    return lat_idx * F.lit(360 * cells_per_degree + 1) + lon_idx


def point_in_polygon(
    lat: Column | str, lon: Column | str, polygon: Column
) -> Column:
    """Ray-casting point-in-polygon, polygon as
    ``array<struct<x: double, y: double>>`` (x=lon, y=lat), closed or
    open ring. Pure higher-order-function math — the J8 spatial-join
    refine step without a geo library."""
    px = F.col(lon) if isinstance(lon, str) else lon
    py = F.col(lat) if isinstance(lat, str) else lat
    n = F.size(polygon)
    # Pair each vertex with its predecessor (wrapping), count edges
    # whose segment crosses the horizontal ray from the point.
    idx = F.sequence(F.lit(0), n - 1)
    crossings = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + _crosses(
            px,
            py,
            F.element_at(polygon, i + 1),
            F.element_at(polygon, F.when(i == 0, n).otherwise(i)),
        ).cast("int"),
    )
    return crossings % 2 == 1


def _crosses(px: Column, py: Column, v1: Column, v2: Column) -> Column:
    x1, y1 = v1["x"], v1["y"]
    x2, y2 = v2["x"], v2["y"]
    straddles = (y1 > py) != (y2 > py)
    x_at_y = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    return straddles & (px < x_at_y)


def geocode_addresses(
    df,
    addr_col: str,
    geocode_fn,
    *,
    rate_per_sec: float = 1.0,
    out_lat: str = "latitude",
    out_lon: str = "longitude",
):
    """Address → (lat, lon) via an injected geocoder, rate-limited
    per partition (SURVEY §2.10 geo row; reference: Nominatim at 1
    req/s, pipelines/utils/georeference/tasks.py:93-137).

    ``geocode_fn(address) -> (lat, lon) | None`` is the external call
    — injectable so tests run a fake and deployments plug Nominatim or
    a paid geocoder. Runs as mapInPandas with a time-based limiter per
    partition; with N partitions the aggregate rate is N × rate, so
    coalesce to 1 partition for a strict global limit (the reference's
    behavior), or shard API keys per partition. Failures yield NULL
    coordinates rather than failing the job; upstream dedup (A6) keeps
    the request count at distinct-address cardinality.
    """
    import time
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_lat, T.DoubleType(), True),
            T.StructField(out_lon, T.DoubleType(), True),
        ]
    )
    min_interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        last_call = 0.0
        for pdf in batches:
            lats, lons = [], []
            for addr in pdf[addr_col]:
                if min_interval:
                    wait = last_call + min_interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_call = time.monotonic()
                try:
                    hit = geocode_fn(addr) if addr is not None else None
                except Exception:  # noqa: BLE001 — NULL, not job failure
                    hit = None
                lats.append(hit[0] if hit else None)
                lons.append(hit[1] if hit else None)
            pdf = pdf.copy()
            pdf[out_lat] = pd.array(lats, dtype="float64")
            pdf[out_lon] = pd.array(lons, dtype="float64")
            yield pdf

    return df.mapInPandas(run, out_schema)
