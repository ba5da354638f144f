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


def rect_ring(x0, y0, x1, y1) -> Column:
    """Axis-aligned rectangle as a CCW ring
    ``array<struct<x,y>>`` (open — no repeated last vertex)."""
    to_col = lambda v: v if isinstance(v, Column) else F.lit(v)  # noqa: E731
    x0, y0, x1, y1 = map(to_col, (x0, y0, x1, y1))
    return F.array(
        F.struct(x0.alias("x"), y0.alias("y")),
        F.struct(x1.alias("x"), y0.alias("y")),
        F.struct(x1.alias("x"), y1.alias("y")),
        F.struct(x0.alias("x"), y1.alias("y")),
    )


def _bind_once(value: Column, body) -> Column:
    """Evaluate ``value`` exactly once and feed it to ``body`` as a
    lambda variable. Catalyst's interpreted HOF evaluation has no
    common-subexpression elimination, so an expression referenced k
    times is evaluated k times — catastrophic when ``value`` is itself
    an expensive HOF tree (a polygon clip referenced from every
    shoelace term turned O(n) area math into O(n·clip) per row; this
    binding is the fix that took j8b_best_overlap from ~28 ms/row to
    sub-ms)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def polygon_area(ring: Column) -> Column:
    """Shoelace area of a ring ``array<struct<x,y>>`` (open ring, any
    orientation — absolute value). Pure higher-order-function math,
    JVM-side, no UDF. The ring expression is bound once, so passing an
    expensive expression (e.g. a clip result) costs one evaluation."""

    def _area(r):
        n = F.size(r)

        def term(acc, i):
            cur = F.element_at(r, i + 1)
            nxt = F.element_at(r, F.when(i == n - 1, 1).otherwise(i + 2))
            return acc + (cur["x"] * nxt["y"] - nxt["x"] * cur["y"])

        return F.when(n < 3, F.lit(0.0)).otherwise(
            F.abs(F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0.0), term)) / 2
        )

    return _bind_once(ring, _area)


def _clip_half_plane(ring: Column, a: Column, b: Column) -> Column:
    """One Sutherland–Hodgman step: keep the part of ``ring`` on the
    left of the directed clip edge a→b (CCW clip polygon ⇒ left =
    inside). Emits 0–2 vertices per input edge, flattened back into a
    ring."""
    n = F.size(ring)

    def side(p):
        return (b["x"] - a["x"]) * (p["y"] - a["y"]) - (
            b["y"] - a["y"]
        ) * (p["x"] - a["x"])

    def emit(i):
        cur = F.element_at(ring, i + 1)
        prev = F.element_at(ring, F.when(i == 0, n).otherwise(i))
        sc, sp = side(cur), side(prev)
        cur_in, prev_in = sc >= 0, sp >= 0
        t = sp / (sp - sc)
        inter = F.struct(
            (prev["x"] + t * (cur["x"] - prev["x"])).alias("x"),
            (prev["y"] + t * (cur["y"] - prev["y"])).alias("y"),
        )
        empty = F.slice(ring, 1, 0)  # typed empty array
        return (
            F.when(cur_in & prev_in, F.array(cur))
            .when(cur_in & ~prev_in, F.array(inter, cur))
            .when(~cur_in & prev_in, F.array(inter))
            .otherwise(empty)
        )

    return F.when(n < 3, F.slice(ring, 1, 0)).otherwise(
        F.flatten(F.transform(F.sequence(F.lit(0), n - 1), emit))
    )


def polygon_clip(subject: Column, clip: Column) -> Column:
    """Sutherland–Hodgman polygon clipping: intersection of ``subject``
    (any simple polygon) with ``clip`` (must be CONVEX, CCW-wound).
    Both are open rings ``array<struct<x,y>>``. Entirely Catalyst
    column math — aggregate over the clip edges, each step a
    transform+flatten over the current ring. No UDF, no geo library;
    the W2 best-overlap ranking (reference
    pipelines/rj_escritorio/rain_dashboard/constants.py:116-125,
    ``ST_AREA(ST_INTERSECTION(...))``) runs on this."""
    def _clip_with(c):
        m = F.size(c)
        return F.aggregate(
            F.sequence(F.lit(0), m - 1),
            subject,
            lambda ring, j: _clip_half_plane(
                ring,
                F.element_at(c, j + 1),
                F.element_at(c, F.when(j == m - 1, 1).otherwise(j + 2)),
            ),
        )

    return _bind_once(clip, _clip_with)


def intersection_area(subject: Column, clip: Column) -> Column:
    """``ST_AREA(ST_INTERSECTION(subject, clip))`` for a convex CCW
    ``clip`` — planar (coordinate-unit²) area, matching the closed
    form for axis-aligned cases."""
    return polygon_area(polygon_clip(subject, clip))


def polygon_centroid(ring: Column) -> Column:
    """``ST_CENTROID`` for a simple polygon ring ``array<struct<x,y>>``
    (open ring, any orientation): the area-weighted centroid via the
    shoelace formula, as ``struct<x,y>``. Reference parity: the rain
    dashboard centers map tiles on ``ST_CENTROID(geometry)``
    (pipelines/rj_escritorio/rain_dashboard/constants.py:107-205).
    Degenerate rings (area 0 — collinear or <3 points) fall back to
    the vertex mean. Pure Catalyst HOF math; the ring is bound once
    (see ``_bind_once``)."""

    def _centroid(r):
        n = F.size(r)

        def cross_terms(acc, i):
            cur = F.element_at(r, i + 1)
            nxt = F.element_at(r, F.when(i == n - 1, 1).otherwise(i + 2))
            cross = cur["x"] * nxt["y"] - nxt["x"] * cur["y"]
            return F.struct(
                (acc["a"] + cross).alias("a"),
                (acc["cx"] + (cur["x"] + nxt["x"]) * cross).alias("cx"),
                (acc["cy"] + (cur["y"] + nxt["y"]) * cross).alias("cy"),
            )

        zero = F.struct(
            F.lit(0.0).alias("a"), F.lit(0.0).alias("cx"), F.lit(0.0).alias("cy")
        )
        acc = F.aggregate(F.sequence(F.lit(0), n - 1), zero, cross_terms)
        mean = F.struct(
            F.aggregate(r, F.lit(0.0), lambda s, p: s + p["x"]).alias("mx"),
            F.aggregate(r, F.lit(0.0), lambda s, p: s + p["y"]).alias("my"),
        )
        return F.when(
            (n < 3) | (F.abs(acc["a"]) < F.lit(1e-12)),
            F.struct(
                (mean["mx"] / n).cast("double").alias("x"),
                (mean["my"] / n).cast("double").alias("y"),
            ),
        ).otherwise(
            F.struct(
                (acc["cx"] / (3 * acc["a"])).alias("x"),
                (acc["cy"] / (3 * acc["a"])).alias("y"),
            )
        )

    return _bind_once(ring, _centroid)


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
