"""CRS reprojection for geo ingest — pure math, no geo libraries.

The reference converts every GeoDataFrame to EPSG:4326 and drops the
Z dimension before WKT interchange
(pipelines/utils/dump_datario/tasks.py:118-140). The practically
relevant source CRSs are UTM projections of near-WGS84 datums:
SIRGAS 2000 (Rio's official datum, EPSG:31965-31985) and WGS84 UTM
(EPSG:326xx/327xx). SIRGAS 2000 and WGS84 agree to centimeters, so
the datum shift is identity and the reprojection reduces to the
inverse Transverse Mercator projection, computed here with the
classic series expansions (Snyder, "Map Projections — A Working
Manual", USGS PP 1395, eqs. 8-9..8-25 / 3-26) on the GRS80
ellipsoid — accurate to well under a millimeter inside a UTM zone.

Anything more exotic (datum grids, Lambert, SAD69 with shifts) is out
of scope here: pass an explicit ``transformer`` callable to
``read_geojson`` instead.
"""

from __future__ import annotations

import math
from collections.abc import Callable

# GRS80 ellipsoid (SIRGAS 2000); WGS84's inverse flattening differs
# in the 9th significant digit — far below projection series error.
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_E0 = 500_000.0  # UTM false easting
_N0_SOUTH = 10_000_000.0  # UTM false northing, southern hemisphere

Transformer = Callable[[float, float], tuple[float, float]]


def _meridian_arc(phi: float) -> float:
    """Meridian arc length from the equator to latitude ``phi`` (rad)."""
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )


def utm_forward(
    lon: float, lat: float, zone: int, *, south: bool
) -> tuple[float, float]:
    """(lon, lat) degrees → UTM (easting, northing) meters."""
    phi = math.radians(lat)
    lam0 = math.radians(zone * 6 - 183)
    dlam = math.radians(lon) - lam0
    sin_phi, cos_phi, tan_phi = math.sin(phi), math.cos(phi), math.tan(phi)
    n = _A / math.sqrt(1 - _E2 * sin_phi**2)
    t = tan_phi**2
    c = _EP2 * cos_phi**2
    a_ = dlam * cos_phi
    m = _meridian_arc(phi)
    easting = _E0 + _K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    )
    northing = _K0 * (
        m
        + n
        * tan_phi
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    if south:
        northing += _N0_SOUTH
    return easting, northing


def utm_inverse(
    easting: float, northing: float, zone: int, *, south: bool
) -> tuple[float, float]:
    """UTM (easting, northing) meters → (lon, lat) degrees."""
    m = (northing - (_N0_SOUTH if south else 0.0)) / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
        + (151 * e1**3 / 96) * math.sin(6 * mu)
        + (1097 * e1**4 / 512) * math.sin(8 * mu)
    )
    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / math.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = (easting - _E0) / (n1 * _K0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2)
        * d**6
        / 720
    )
    lam = math.radians(zone * 6 - 183) + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2)
        * d**5
        / 120
    ) / cos1
    return math.degrees(lam), math.degrees(phi)


def _utm_zone_of_epsg(epsg: int) -> tuple[int, bool] | None:
    """(zone, south) for the UTM EPSG families we reproject natively."""
    if 32601 <= epsg <= 32660:  # WGS 84 / UTM north
        return epsg - 32600, False
    if 32701 <= epsg <= 32760:  # WGS 84 / UTM south
        return epsg - 32700, True
    if 31965 <= epsg <= 31976:  # SIRGAS 2000 / UTM north (11N-22N)
        return epsg - 31954, False
    if 31977 <= epsg <= 31985:  # SIRGAS 2000 / UTM south (17S-25S)
        return epsg - 31960, True
    return None


def epsg_transformer(epsg: int) -> Transformer | None:
    """(x, y) → (lon, lat) WGS84 transformer for ``epsg``; ``None``
    when the CRS already is geographic WGS84-equivalent (4326, 4674
    SIRGAS 2000 geographic). Raises for CRSs that need a real geodesy
    stack — callers inject their own transformer then."""
    if epsg in (4326, 4674):
        return None
    zs = _utm_zone_of_epsg(epsg)
    if zs is None:
        raise NotImplementedError(
            f"EPSG:{epsg} is not a supported UTM/WGS84-family CRS; "
            "pass transformer= explicitly (e.g. a pyproj.Transformer "
            "in the deployment image)"
        )
    zone, south = zs
    return lambda x, y: utm_inverse(x, y, zone, south=south)


def parse_geojson_crs(doc: dict) -> int | None:
    """EPSG code from a (legacy-spec) GeoJSON ``crs`` member;
    ``None`` when absent (RFC 7946 mandates WGS84)."""
    crs = doc.get("crs")
    if not crs:
        return None
    name = str((crs.get("properties") or {}).get("name", ""))
    # accepted spellings: 'EPSG:31983', 'urn:ogc:def:crs:EPSG::31983',
    # 'urn:ogc:def:crs:OGC:1.3:CRS84'
    if name.upper().endswith("CRS84"):
        return 4326
    for sep in ("::", ":"):
        tail = name.rsplit(sep, 1)[-1]
        if tail.isdigit():
            return int(tail)
    raise ValueError(f"unparseable GeoJSON crs name: {name!r}")


def transform_coords(coords, fn: Transformer):
    """Recursively apply ``fn`` to every [x, y, (z)] position of a
    GeoJSON coordinates array, dropping Z (3D→2D like the reference)."""
    if coords and isinstance(coords[0], (int, float)):
        lon, lat = fn(coords[0], coords[1])
        return [lon, lat]
    return [transform_coords(c, fn) for c in coords]
