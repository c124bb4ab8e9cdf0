"""GeoJSON tolerant comparison replicating the reference test matcher
(tests/convertAirspaces.test.ts:5-42): exact match on every non-coordinate
field including key COUNT, tolerant (1e-6) compare on coordinate arrays."""

from __future__ import annotations


def _is_coord_array(x) -> bool:
    return (
        isinstance(x, list)
        and len(x) > 0
        and isinstance(x[0], list)
        and len(x[0]) > 0
        and isinstance(x[0][0], (int, float))
    )


def geojson_matches(actual, expected, tolerance: float = 1e-6, path: str = "$") -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    errors: list[str] = []
    if _is_coord_array(actual) or _is_coord_array(expected):
        if not (_is_coord_array(actual) and _is_coord_array(expected)):
            return [f"{path}: coord-array vs non-coord-array"]
        if len(actual) != len(expected):
            return [f"{path}: ring length {len(actual)} != {len(expected)}"]
        for i, (a, e) in enumerate(zip(actual, expected)):
            if len(a) != len(e):
                errors.append(f"{path}[{i}]: position arity {len(a)} != {len(e)}")
                continue
            for j, (av, ev) in enumerate(zip(a, e)):
                if abs(av - ev) >= tolerance:
                    errors.append(f"{path}[{i}][{j}]: {av} != {ev}")
        return errors
    if isinstance(actual, dict) and isinstance(expected, dict):
        if len(actual) != len(expected):
            errors.append(
                f"{path}: key count {sorted(actual)} != {sorted(expected)}"
            )
            return errors
        for key in expected:
            if key not in actual:
                errors.append(f"{path}: missing key {key}")
                continue
            errors.extend(geojson_matches(actual[key], expected[key], tolerance, f"{path}.{key}"))
        return errors
    if isinstance(actual, list) and isinstance(expected, list):
        if len(actual) != len(expected):
            return [f"{path}: list length {len(actual)} != {len(expected)}"]
        for i, (a, e) in enumerate(zip(actual, expected)):
            errors.extend(geojson_matches(a, e, tolerance, f"{path}[{i}]"))
        return errors
    if isinstance(actual, bool) or isinstance(expected, bool):
        return [] if actual is expected else [f"{path}: {actual!r} != {expected!r}"]
    if isinstance(actual, (int, float)) and isinstance(expected, (int, float)):
        return [] if actual == expected else [f"{path}: {actual!r} != {expected!r}"]
    return [] if actual == expected else [f"{path}: {actual!r} != {expected!r}"]
