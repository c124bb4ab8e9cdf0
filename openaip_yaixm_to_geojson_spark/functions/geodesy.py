"""Spherical geometry kernels (pure NumPy) for YAIXM boundary assembly.

These re-derive, from public formulas, the great-circle math the reference
delegates to @turf/turf (reference: src/airspace-converter.ts:638-771).
Nothing here depends on Spark: the same functions back the vectorized
pandas UDFs in ``operators/convert.py`` and the pytest golden-parity suite.

Float-pipeline parity notes (goldens pin coordinates to 1e-6,
reference tests/convertAirspaces.test.ts:5-11):

* Earth radius 6,371,008.8 m (turf ``earthRadius``).
* ``deg->rad`` first reduces the angle with a sign-preserving ``fmod 360``
  (turf ``degreesToRadians``); same for rad->deg with ``fmod 2*pi``.
* DMS coordinate strings round to 5 decimal places, half away from zero
  (observed contract of @openaip/coordinate-parser via the reference
  goldens, e.g. 513714N -> 51.62056).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np

EARTH_RADIUS_M = 6371008.8
EARTH_RADIUS_KM = EARTH_RADIUS_M / 1000.0
NM_TO_KM = 1.852
DEFAULT_GEOMETRY_DETAIL = 100


def _deg2rad(deg):
    """turf degreesToRadians: sign-preserving modulo 360, then scale."""
    return np.fmod(deg, 360.0) * (math.pi / 180.0)


def _rad2deg(rad):
    """turf radiansToDegrees: sign-preserving modulo 2*pi, then scale."""
    return np.fmod(rad, 2.0 * math.pi) * (180.0 / math.pi)


def parse_dms(coord: str) -> tuple[float, float]:
    """Compact DMS string ``'572153N 0015835W'`` -> ``(lon, lat)``.

    Grammar per reference REGEX_COORDINATES (src/airspace-converter.ts:33):
    6-digit lat + hemisphere, space, 7-digit lon + hemisphere. Decimal
    degrees are rounded to 5 dp, half away from zero (parser contract).
    """
    lat_s, lon_s = coord.split(" ")
    lat = int(lat_s[0:2]) + int(lat_s[2:4]) / 60.0 + int(lat_s[4:6]) / 3600.0
    lon = int(lon_s[0:3]) + int(lon_s[3:5]) / 60.0 + int(lon_s[5:7]) / 3600.0
    lat = math.floor(lat * 1e5 + 0.5) / 1e5
    lon = math.floor(lon * 1e5 + 0.5) / 1e5
    if lat_s[6] == "S":
        lat = -lat
    if lon_s[7] == "W":
        lon = -lon
    return lon, lat


def parse_radius_km(radius: str) -> float:
    """``'10 nm'`` / ``'2.5'`` -> kilometres (NM * 1.852).

    Reference: src/airspace-converter.ts:710-711, 758-759.
    """
    value = str(radius).split(" ")[0].strip()
    return float(value) * NM_TO_KM


def bearing(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Initial great-circle bearing in degrees (-180, 180]."""
    rlon1 = _deg2rad(lon1)
    rlon2 = _deg2rad(lon2)
    rlat1 = _deg2rad(lat1)
    rlat2 = _deg2rad(lat2)
    a = math.sin(rlon2 - rlon1) * math.cos(rlat2)
    b = math.cos(rlat1) * math.sin(rlat2) - math.sin(rlat1) * math.cos(rlat2) * math.cos(rlon2 - rlon1)
    return float(_rad2deg(math.atan2(a, b)))


def destination(lon: float, lat: float, dist_km: float, bearings_deg: np.ndarray) -> np.ndarray:
    """Great-circle destination points, vectorized over bearings.

    Returns an ``(n, 2)`` array of ``[lon, lat]`` in degrees.
    """
    bearings_deg = np.asarray(bearings_deg, dtype=np.float64)
    rlon = _deg2rad(lon)
    rlat = _deg2rad(lat)
    rbear = _deg2rad(bearings_deg)
    rdist = dist_km / EARTH_RADIUS_KM
    sin_lat2 = math.sin(rlat) * math.cos(rdist) + math.cos(rlat) * np.sin(rdist) * np.cos(rbear)
    lat2 = np.arcsin(sin_lat2)
    lon2 = rlon + np.arctan2(
        np.sin(rbear) * math.sin(rdist) * math.cos(rlat),
        math.cos(rdist) - math.sin(rlat) * np.sin(lat2),
    )
    return np.stack([_rad2deg(lon2), _rad2deg(lat2)], axis=1)


def circle_ring(center_lon: float, center_lat: float, radius_km: float, steps: int) -> np.ndarray:
    """Full-circle ring: ``steps`` vertices at bearings ``i * -360/steps``
    (first vertex due north) plus the closing copy of the first vertex.
    """
    bearings = np.arange(steps, dtype=np.float64) * (-360.0 / steps)
    coords = destination(center_lon, center_lat, radius_km, bearings)
    return np.vstack([coords, coords[:1]])


def _angle_to_360(angle: float) -> float:
    beta = math.fmod(angle, 360.0)
    if beta < 0:
        beta += 360.0
    return beta


def line_arc(
    center_lon: float,
    center_lat: float,
    radius_km: float,
    bearing1: float,
    bearing2: float,
    steps: int,
) -> np.ndarray:
    """Arc polyline swept clockwise (increasing bearing) from bearing1 to
    bearing2 at ``360/steps`` degree increments, endpoint appended when the
    final increment overshoots. Degenerate equal bearings -> full circle.
    """
    angle1 = _angle_to_360(bearing1)
    angle2 = _angle_to_360(bearing2)
    if angle1 == angle2:
        return circle_ring(center_lon, center_lat, radius_km, steps)
    start = angle1
    end = angle2 if angle1 < angle2 else angle2 + 360.0
    # `steps` samples span the swept angle itself, and the exact endpoint is
    # always appended afterwards — the reference goldens pin this sampling
    # (102 points for a 100-step arc), so mirror the float evaluation order
    # exactly instead of using arange/linspace.
    bearings = []
    alfa = start
    i = 0
    while alfa < end:
        bearings.append(alfa)
        i += 1
        alfa = start + (i * (end - start)) / steps
    bearings.append(end)
    return destination(center_lon, center_lat, radius_km, np.asarray(bearings))


def arc_coords(
    prev_coord: Sequence[float],
    direction: str,
    radius: str,
    centre: str,
    to: str,
    steps: int,
) -> np.ndarray:
    """YAIXM ``arc`` segment -> coordinate list.

    The arc starts at the previous segment's last coordinate (the fold's
    sequential dependency, reference src/airspace-converter.ts:641); a
    counter-clockwise arc swaps start/end, sweeps clockwise, and reverses
    the output (reference :704-722).
    """
    is_cw = direction == "cw"
    start = (float(prev_coord[0]), float(prev_coord[1]))
    end = parse_dms(to)
    if not is_cw:
        start, end = end, start
    center_lon, center_lat = parse_dms(centre)
    radius_km = parse_radius_km(radius)
    b1 = bearing(center_lon, center_lat, start[0], start[1])
    b2 = bearing(center_lon, center_lat, end[0], end[1])
    coords = line_arc(center_lon, center_lat, radius_km, b1, b2, steps)
    return coords if is_cw else coords[::-1]


def circle_coords(radius: str, centre: str, steps: int) -> np.ndarray:
    center_lon, center_lat = parse_dms(centre)
    return circle_ring(center_lon, center_lat, parse_radius_km(radius), steps)


def line_coords(points: Iterable[str]) -> np.ndarray:
    return np.asarray([parse_dms(p) for p in points], dtype=np.float64)


def ring_is_clockwise(ring: np.ndarray) -> bool:
    """Shoelace orientation test: sum (x2-x1)*(y2+y1) > 0 -> clockwise."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def close_ring(coords: np.ndarray) -> np.ndarray:
    """Append the first vertex when first != last (polygon auto-complete)."""
    if coords[0, 0] != coords[-1, 0] or coords[0, 1] != coords[-1, 1]:
        coords = np.vstack([coords, coords[:1]])
    return coords


def rewind_ccw(ring: np.ndarray) -> np.ndarray:
    """Right-hand rule: exterior ring counter-clockwise (RFC 7946)."""
    if ring_is_clockwise(ring):
        return ring[::-1].copy()
    return ring


def build_ring(boundary: Sequence[dict], steps: int = DEFAULT_GEOMETRY_DETAIL) -> np.ndarray:
    """Fold YAIXM boundary segments into one closed CCW polygon ring.

    ``boundary`` is a list of segment dicts, each with exactly one of the
    keys ``line`` (list of DMS strings), ``arc`` (dict with dir/radius/
    centre/to) or ``circle`` (dict with radius/centre). The fold appends
    each segment's coordinates to the running list; arcs anchor on the
    previous segment's last coordinate.
    """
    parts: list[np.ndarray] = []
    last: np.ndarray | None = None
    for segment in boundary:
        if segment.get("line") is not None:
            coords = line_coords(segment["line"])
        elif segment.get("arc") is not None:
            if last is None:
                raise ValueError("arc segment requires a previous coordinate pair")
            arc = segment["arc"]
            coords = arc_coords(last, arc["dir"], arc["radius"], arc["centre"], arc["to"], steps)
        elif segment.get("circle") is not None:
            circle = segment["circle"]
            coords = circle_coords(circle["radius"], circle["centre"], steps)
        else:
            raise ValueError(f"unsupported boundary segment: {segment!r}")
        parts.append(coords)
        last = coords[-1]
    ring = np.vstack(parts)
    ring = close_ring(ring)
    return rewind_ccw(ring)


# ---------------------------------------------------------------------------
# Point-in-polygon + distances (engine-side spatial kernels)
# ---------------------------------------------------------------------------


def points_in_ring_winding(lons: np.ndarray, lats: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Winding-number point-in-polygon over planar lon/lat, vectorized.

    Treats the densified ring as planar (the reference's polygons are
    planar lon/lat after densification). Returns a boolean mask; points
    exactly on an edge are implementation-defined (measure zero).
    """
    px = np.asarray(lons, dtype=np.float64)[:, None]
    py = np.asarray(lats, dtype=np.float64)[:, None]
    x1 = ring[:-1, 0][None, :]
    y1 = ring[:-1, 1][None, :]
    x2 = ring[1:, 0][None, :]
    y2 = ring[1:, 1][None, :]
    # cross product of edge vector with vector to the point
    side = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
    upward = (y1 <= py) & (y2 > py) & (side > 0)
    downward = (y1 > py) & (y2 <= py) & (side < 0)
    winding = upward.sum(axis=1).astype(np.int64) - downward.sum(axis=1).astype(np.int64)
    return winding != 0


def haversine_km(lon1, lat1, lon2, lat2):
    """Great-circle distance in km, vectorized (broadcasting inputs)."""
    rlat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    rlat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = rlat2 - rlat1
    dlon = np.radians(np.asarray(lon2, dtype=np.float64)) - np.radians(np.asarray(lon1, dtype=np.float64))
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def ring_area_m2(ring: np.ndarray) -> float:
    """Spherical ring area (m^2); used for largest-polygon selection only
    (reference getLargestPolygon, src/geojson-polygon.ts:110-132).
    """
    lons = np.radians(ring[:, 0])
    lats = np.radians(ring[:, 1])
    n = len(ring) - 1
    if n < 3:
        return 0.0
    lo = lons[:-1]
    la = lats[:-1]
    lo_next = np.roll(lo, -1)
    la_next = np.roll(la, -1)
    total = np.sum((lo_next - lo) * (2.0 + np.sin(la) + np.sin(la_next)))
    return abs(total * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def ring_self_intersections(ring: np.ndarray) -> np.ndarray:
    """Proper self-intersection points between non-adjacent edges ("kinks").

    O(E^2) vectorized segment-pair test — rings are O(100) points so this
    stays tiny; used by geometry validation (reference kinks scan,
    src/geojson-polygon.ts:62-73).
    """
    p = ring[:-1]
    q = ring[1:]
    n = len(p)
    if n < 3:
        return np.empty((0, 2))
    d = q - p
    i_idx, j_idx = np.triu_indices(n, k=2)
    # skip the wrap-around adjacency (first and last edge share a vertex)
    keep = ~((i_idx == 0) & (j_idx == n - 1))
    i_idx = i_idx[keep]
    j_idx = j_idx[keep]
    p1 = p[i_idx]
    d1 = d[i_idx]
    p2 = p[j_idx]
    d2 = d[j_idx]
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    diff = p2 - p1
    # over=: near-parallel edges give a subnormal denom and the divide can
    # overflow to +-inf — an intended sentinel (inf fails the strict (0,1)
    # interval test), not a numerical bug.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = (diff[:, 0] * d2[:, 1] - diff[:, 1] * d2[:, 0]) / denom
        u = (diff[:, 0] * d1[:, 1] - diff[:, 1] * d1[:, 0]) / denom
    hit = (denom != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    return p1[hit] + t[hit, None] * d1[hit]
