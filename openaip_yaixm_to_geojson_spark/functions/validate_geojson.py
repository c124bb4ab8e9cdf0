"""Structural GeoJSON output validation.

Re-implements the output contract the reference enforces with Ajv against
its JSON Schema (src/schemas/geojson-schema.json, embedded in
README.md:122-353): allowed type/class/activity enums, ceiling shape,
polygon = exactly one ring with >= 4 closed positions, lon/lat ranges.
Hand-written checks (no schema file copied); the reference behavior —
strict mode throws, lenient warns — lives in converter_api.py.
"""

from __future__ import annotations

ALLOWED_FEATURE_TYPES = {
    "CTA", "TMA", "CTR", "ATZ", "MATZ", "DANGER", "PROHIBITED", "RESTRICTED",
    "TMZ", "RMZ", "TRA", "GLIDING_SECTOR", "WARNING", "AERIAL_SPORTING_RECREATIONAL",
}
ALLOWED_FEATURE_CLASSES = {"A", "B", "C", "D", "E", "F", "G", "UNCLASSIFIED"}
ALLOWED_ACTIVITIES = {
    "NONE", "PARACHUTING", "AEROCLUB_AERIAL_WORK", "ULM", "HANG_GLIDING", "GLIDER_WINCH",
}
ALLOWED_UNITS = {"FT", "FL"}
ALLOWED_DATUMS = {"GND", "STD", "MSL"}


def _check_ceiling(ceiling, path: str, problems: list[str]) -> None:
    if not isinstance(ceiling, dict):
        problems.append(f"{path}: not an object")
        return
    if not isinstance(ceiling.get("value"), (int, float)):
        problems.append(f"{path}.value: not a number")
    if ceiling.get("unit") not in ALLOWED_UNITS:
        problems.append(f"{path}.unit: {ceiling.get('unit')!r}")
    if ceiling.get("referenceDatum") not in ALLOWED_DATUMS:
        problems.append(f"{path}.referenceDatum: {ceiling.get('referenceDatum')!r}")


def validate_feature_collection(geojson: dict) -> list[str]:
    """Returns a list of problems (empty == valid)."""
    problems: list[str] = []
    if geojson.get("type") != "FeatureCollection":
        problems.append("root.type != FeatureCollection")
        return problems
    for i, feature in enumerate(geojson.get("features", [])):
        path = f"features[{i}]"
        props = feature.get("properties", {})
        if feature.get("type") != "Feature":
            problems.append(f"{path}.type != Feature")
        if not props.get("name"):
            problems.append(f"{path}.name missing")
        if props.get("type") not in ALLOWED_FEATURE_TYPES:
            problems.append(f"{path}.type: {props.get('type')!r}")
        if props.get("class") not in ALLOWED_FEATURE_CLASSES:
            problems.append(f"{path}.class: {props.get('class')!r}")
        if props.get("activity") not in ALLOWED_ACTIVITIES:
            problems.append(f"{path}.activity: {props.get('activity')!r}")
        if not isinstance(props.get("activatedByNotam"), bool):
            problems.append(f"{path}.activatedByNotam: not a bool")
        _check_ceiling(props.get("upperCeiling"), f"{path}.upperCeiling", problems)
        _check_ceiling(props.get("lowerCeiling"), f"{path}.lowerCeiling", problems)
        geometry = feature.get("geometry", {})
        if geometry.get("type") != "Polygon":
            problems.append(f"{path}.geometry.type != Polygon")
            continue
        rings = geometry.get("coordinates", [])
        if len(rings) != 1:
            problems.append(f"{path}.geometry: expected exactly one ring, got {len(rings)}")
            continue
        ring = rings[0]
        if len(ring) < 4:
            problems.append(f"{path}.geometry: ring has {len(ring)} positions (< 4)")
        elif ring[0] != ring[-1]:
            problems.append(f"{path}.geometry: ring not closed")
        for pos in ring:
            if not (-180.0 <= pos[0] <= 180.0 and -90.0 <= pos[1] <= 90.0):
                problems.append(f"{path}.geometry: position out of range {pos}")
                break
    return problems
