"""Polygon validation + fixing (pure NumPy), mirroring the reference's
geometry-fix semantics (reference: src/geojson-polygon.ts).

Pipeline (createFixedPolygon, src/geojson-polygon.ts:143-199):
exact-duplicate removal -> intermediate/backtrack point removal ->
split self-intersections into simple sub-rings -> right-hand-rule rewind ->
keep the largest-area polygon; bounding-box envelope as a last-resort
fallback. Only invoked when a ring is invalid (self-intersecting), exactly
like the reference (src/airspace-converter.ts:821-842).
"""

from __future__ import annotations

import math

import numpy as np

from .geodesy import (
    EARTH_RADIUS_KM,
    bearing,
    haversine_km,
    rewind_ccw,
    ring_area_m2,
    ring_self_intersections,
)


def ring_is_valid(ring: np.ndarray) -> bool:
    """Structurally sound (>=4 positions, closed, finite, in-range) and free
    of proper self-intersections (the reference's check-geojson + kinks scan,
    src/geojson-polygon.ts:48-57).
    """
    if ring.ndim != 2 or ring.shape[0] < 4 or ring.shape[1] != 2:
        return False
    if not np.isfinite(ring).all():
        return False
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        return False
    if np.abs(ring[:, 0]).max() > 180.0 or np.abs(ring[:, 1]).max() > 90.0:
        return False
    return len(ring_self_intersections(ring)) == 0


def remove_exact_duplicates(ring: np.ndarray) -> np.ndarray:
    """Drop coordinates at zero spherical distance from an already-kept one,
    then re-close (reference removeDuplicatePoints with buffer 0,
    src/geojson-polygon.ts:214-259). With buffer 0 only bit-equal points
    collapse, so a hash set on the float pair is equivalent.
    """
    seen: set[tuple[float, float]] = set()
    kept: list[np.ndarray] = []
    for coord in ring:
        key = (float(coord[0]), float(coord[1]))
        if key not in seen:
            seen.add(key)
            kept.append(coord)
    out = np.asarray(kept)
    return np.vstack([out, out[:1]])


def remove_duplicate_points(ring: np.ndarray, consume_duplicate_buffer: float = 0.0) -> np.ndarray:
    """removeDuplicatePoints with the meters buffer knob (reference
    src/geojson-polygon.ts:214-259): a coordinate is a duplicate when its
    haversine distance to ANY already-kept coordinate is <= buffer/1000 km.
    buffer 0 degenerates to the bit-equality fast path."""
    if consume_duplicate_buffer <= 0.0:
        return remove_exact_duplicates(ring)
    if len(ring) < 4:
        raise ValueError("Polygon must at least have four coordinates")
    min_km = float(consume_duplicate_buffer) / 1000.0
    kept: list[np.ndarray] = []
    for coord in ring:
        if kept:
            kept_arr = np.asarray(kept)
            dists = haversine_km(kept_arr[:, 0], kept_arr[:, 1], float(coord[0]), float(coord[1]))
            if bool((np.asarray(dists) <= min_km).any()):
                continue
        kept.append(coord)
    out = np.asarray(kept)
    if len(out) < 3:
        raise ValueError("The polygon dimensions are too small to create a polygon.")
    return np.vstack([out, out[:1]])


def remove_intermediate_points(ring: np.ndarray) -> np.ndarray:
    """Drop point i when some earlier consecutive pair (j, j+1) sees it at
    exactly opposite bearings (|b(i->j) - b(i->j+1)| == 180), i.e. the point
    lies on the segment between two earlier points — a backtrack artifact.
    Faithful to the reference's O(n^2) scan including its index guards
    (src/geojson-polygon.ts:265-327).
    """
    coords = ring
    n = len(coords)
    kept: list[np.ndarray] = [coords[0]]
    for i in range(1, n):
        ci = coords[i]
        drop = False
        for j in range(n - 1):
            if not (i > j and i > j + 1):
                continue
            ba = bearing(ci[0], ci[1], coords[j][0], coords[j][1])
            bb = bearing(ci[0], ci[1], coords[j + 1][0], coords[j + 1][1])
            if abs(ba - bb) == 180.0:
                drop = True
                break
        if not drop:
            kept.append(ci)
    out = np.asarray(kept)
    if out[0, 0] != out[-1, 0] or out[0, 1] != out[-1, 1]:
        out = np.vstack([out, out[:1]])
    return out


def _edge_intersections(ring: np.ndarray):
    """Proper crossings between non-adjacent edges of a closed ring.

    Returns a dict edge_index -> list of (t, point) sorted by t along the
    edge, where t is the fractional position of the crossing on that edge.
    """
    p = ring[:-1]
    q = ring[1:]
    n = len(p)
    d = q - p
    by_edge: dict[int, list[tuple[float, tuple[float, float]]]] = {}
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            denom = d[i, 0] * d[j, 1] - d[i, 1] * d[j, 0]
            if denom == 0:
                continue
            diff = p[j] - p[i]
            # near-parallel edges make |denom| tiny; the divides can overflow
            # to +-inf, which is an intended sentinel (an inf t/u fails the
            # strict (0,1) interval test below), not a numerical bug.
            with np.errstate(over="ignore", divide="ignore"):
                t = (diff[0] * d[j, 1] - diff[1] * d[j, 0]) / denom
                u = (diff[0] * d[i, 1] - diff[1] * d[i, 0]) / denom
            if 0.0 < t < 1.0 and 0.0 < u < 1.0:
                pt = (float(p[i, 0] + t * d[i, 0]), float(p[i, 1] + t * d[i, 1]))
                by_edge.setdefault(i, []).append((float(t), pt))
                by_edge.setdefault(j, []).append((float(u), pt))
    for lst in by_edge.values():
        lst.sort(key=lambda x: x[0])
    return by_edge


def unkink_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a self-intersecting closed ring into simple closed sub-rings.

    Intersection points are inserted into both crossing edges; walking the
    enhanced ring with a stack, every revisit of an intersection point pops
    one simple sub-ring (the loop between the two visits). Equivalent in
    result to turf unkinkPolygon for single-ring polygons.
    """
    by_edge = _edge_intersections(ring)
    if not by_edge:
        return [ring.copy()]
    enhanced: list[tuple[float, float]] = []
    n = len(ring) - 1
    for i in range(n):
        enhanced.append((float(ring[i, 0]), float(ring[i, 1])))
        for _, pt in by_edge.get(i, []):
            enhanced.append(pt)
    intersection_pts = {pt for lst in by_edge.values() for _, pt in lst}
    rings: list[np.ndarray] = []
    stack: list[tuple[float, float]] = []
    pos: dict[tuple[float, float], int] = {}
    last_pop: tuple[float, float] | None = None

    def emit(loop: list[tuple[float, float]]) -> None:
        # Emitted rings start at the most recently split-off intersection
        # vertex when it lies on the ring (matches the ring-start choice of
        # turf unkinkPolygon / simplepolygon, pinned by the ccw-arc golden).
        open_loop = loop[:-1]
        if last_pop is not None and last_pop in open_loop and open_loop[0] != last_pop:
            k = open_loop.index(last_pop)
            open_loop = open_loop[k:] + open_loop[:k]
        rings.append(np.asarray(open_loop + [open_loop[0]]))

    for vertex in enhanced:
        if vertex in pos:
            start = pos[vertex]
            loop = stack[start:] + [vertex]
            emit(loop)
            for v in stack[start + 1 :]:
                pos.pop(v, None)
            del stack[start + 1 :]
            last_pop = vertex
        else:
            pos[vertex] = len(stack)
            stack.append(vertex)
    stack.append(stack[0])
    emit(stack)
    return [r for r in rings if len(r) >= 4]


def envelope_ring(coords: np.ndarray) -> np.ndarray:
    """Bounding-box fallback ring (reference envelope fallback,
    src/geojson-polygon.ts:185-190): CCW from SW corner, closed."""
    min_lon, min_lat = float(np.min(coords[:, 0])), float(np.min(coords[:, 1]))
    max_lon, max_lat = float(np.max(coords[:, 0])), float(np.max(coords[:, 1]))
    return np.asarray(
        [
            [min_lon, min_lat],
            [max_lon, min_lat],
            [max_lon, max_lat],
            [min_lon, max_lat],
            [min_lon, min_lat],
        ]
    )


def fix_ring(ring: np.ndarray, consume_duplicate_buffer: float = 0.0) -> np.ndarray:
    """makeValid semantics (src/geojson-polygon.ts:78-87): return the ring
    untouched when already valid, else run the fix pipeline."""
    if ring_is_valid(ring):
        return ring
    return create_fixed_ring(ring, consume_duplicate_buffer)


def _largest(parts: list[np.ndarray]) -> np.ndarray:
    # keep the largest polygon; ties keep the later one (reference
    # getLargestPolygon uses >=, src/geojson-polygon.ts:125)
    best = parts[0]
    best_area = ring_area_m2(parts[0])
    for part in parts[1:]:
        area = ring_area_m2(part)
        if area >= best_area:
            best_area = area
            best = part
    return best


def create_fixed_ring(ring: np.ndarray, consume_duplicate_buffer: float = 0.0) -> np.ndarray:
    try:
        cleaned = remove_duplicate_points(ring, consume_duplicate_buffer)
        if len(cleaned) < 4:
            raise ValueError("too few distinct coordinates")
        cleaned = remove_intermediate_points(cleaned)
        # A single unkink pass can leave residual crossings on adversarial
        # inputs (float-perturbed intersection insertion); iterate the
        # split+largest selection until the survivor is simple, falling back
        # to the envelope like the reference's catch-all path.
        for _ in range(4):
            parts = [rewind_ccw(p) for p in unkink_ring(cleaned)]
            if not parts:
                raise ValueError("unkink produced no rings")
            best = _largest(parts)
            if ring_is_valid(best):
                return best
            if len(best) == len(cleaned) and (best == cleaned).all():
                break  # no progress
            cleaned = remove_exact_duplicates(best)
            if len(cleaned) < 4:
                break
        raise ValueError("could not produce a simple ring")
    except Exception:
        return envelope_ring(ring)
