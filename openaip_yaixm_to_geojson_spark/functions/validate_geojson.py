"""GeoJSON output validation (reference Ajv parity).

The reference compiles src/schemas/geojson-schema.json with Ajv2020
(airspace-converter.ts:146-166) and validates every conversion's output
FeatureCollection (:215-224). This module re-expresses that schema — it IS
the output spec, like the class/type mapping table — as a Python-built
draft 2020-12 document (OUTPUT_SCHEMA) and validates with the `jsonschema`
package when it is importable (tests assert OUTPUT_SCHEMA is semantically
identical to the reference file, annotations aside).

`validate_feature_collection` is the public entry: full JSON-Schema
validation when `jsonschema` exists, else the structural subset
(`validate_structural`) covering enums, required keys, ring arity/closure
and coordinate ranges. Both return a list of problem strings (empty ==
valid); strict-vs-warn behavior lives in converter_api.py.
"""

from __future__ import annotations

ALLOWED_FEATURE_TYPES = [
    "CTA", "TMA", "CTR", "ATZ", "DANGER", "PROHIBITED", "RESTRICTED",
    "WARNING", "AERIAL_SPORTING_RECREATIONAL", "RMZ", "TMZ", "TRA", "MATZ",
    "GLIDING_SECTOR",
]
ALLOWED_FEATURE_CLASSES = ["A", "B", "C", "D", "E", "F", "G", "UNCLASSIFIED"]
# schema enum (geojson-schema.json `activity`): includes AEROBATICS, NOT
# GLIDER_WINCH — the mapping table only ever emits NONE/PARACHUTING/
# AEROCLUB_AERIAL_WORK/ULM, so the extra enum members are headroom.
ALLOWED_ACTIVITIES = [
    "NONE", "PARACHUTING", "AEROBATICS", "AEROCLUB_AERIAL_WORK", "ULM",
    "HANG_GLIDING",
]
ALLOWED_UNITS = ["FT", "FL"]
ALLOWED_DATUMS = ["GND", "STD", "MSL"]


def _vertical_limit_schema() -> dict:
    return {
        "type": "object",
        "properties": {
            "value": {"type": "integer"},
            "unit": {"type": "string", "enum": list(ALLOWED_UNITS)},
            "referenceDatum": {"type": "string", "enum": list(ALLOWED_DATUMS)},
        },
        "required": ["value", "unit", "referenceDatum"],
        "additionalProperties": False,
    }


def _properties_schema() -> dict:
    return {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "type": {"type": "string", "enum": list(ALLOWED_FEATURE_TYPES)},
            "class": {"type": "string", "enum": list(ALLOWED_FEATURE_CLASSES)},
            "activity": {"type": "string", "enum": list(ALLOWED_ACTIVITIES)},
            "upperCeiling": {"$ref": "#/definitions/verticalLimit"},
            "lowerCeiling": {"$ref": "#/definitions/verticalLimit"},
            "groundService": {
                "type": "object",
                "properties": {
                    "callsign": {"type": "string"},
                    "frequency": {"type": "string"},
                },
                "required": ["callsign", "frequency"],
                "additionalProperties": False,
            },
            "activatedByNotam": {"type": "boolean"},
            "remarks": {"type": "string"},
        },
        "required": [
            "name", "type", "class", "upperCeiling", "lowerCeiling",
            "activatedByNotam", "activity",
        ],
        "additionalProperties": False,
    }


def _geometry_schema() -> dict:
    # draft 2020-12: prefixItems pins [lon, lat] ranges, items:false
    # forbids extra positions members; exactly one ring of >= 4 positions.
    position = {
        "type": "array",
        "items": False,
        "prefixItems": [
            {"type": "number", "minimum": -180, "maximum": 180},
            {"type": "number", "minimum": -90, "maximum": 90},
        ],
        "minItems": 2,
        "maxItems": 2,
    }
    return {
        "type": "object",
        "properties": {
            "type": {"type": "string", "enum": ["Polygon"]},
            "coordinates": {
                "type": "array",
                "items": {"type": "array", "items": position, "minItems": 4},
                "minItems": 1,
                "maxItems": 1,
            },
        },
        "required": ["type", "coordinates"],
        "additionalProperties": False,
    }


def build_output_schema() -> dict:
    """The reference's output JSON Schema re-expressed (annotation keywords
    — description/example/$id — omitted; they don't affect validation)."""
    return {
        "type": "object",
        "properties": {
            "type": {"type": "string", "enum": ["FeatureCollection"]},
            "features": {
                "type": "array",
                "items": {
                    "allOf": [
                        {
                            "type": "object",
                            "properties": {
                                "type": {"type": "string", "enum": ["Feature"]},
                                "properties": _properties_schema(),
                                "geometry": _geometry_schema(),
                            },
                            "required": ["type", "properties", "geometry"],
                            "additionalProperties": False,
                        }
                    ]
                },
            },
        },
        "required": ["type", "features"],
        "additionalProperties": False,
        "definitions": {"verticalLimit": _vertical_limit_schema()},
    }


OUTPUT_SCHEMA = build_output_schema()


def validate_with_json_schema(geojson: dict, schema: dict | None = None) -> list[str]:
    """Full draft 2020-12 validation (Ajv2020 parity). Raises ImportError
    when the jsonschema package is missing — use validate_feature_collection
    for the auto-fallback."""
    import jsonschema

    validator = jsonschema.Draft202012Validator(schema or OUTPUT_SCHEMA)
    return [
        f"{'/'.join(str(p) for p in err.absolute_path) or '(root)'}: {err.message}"
        for err in validator.iter_errors(geojson)
    ]


def validate_feature_collection(geojson: dict) -> list[str]:
    """Returns a list of problems (empty == valid): full JSON-Schema
    validation when `jsonschema` is importable, else the structural
    subset."""
    try:
        return validate_with_json_schema(geojson)
    except ImportError:
        return validate_structural(geojson)


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


def validate_structural(geojson: dict) -> list[str]:
    """Hand-rolled subset used when `jsonschema` is unavailable: enums,
    required keys, ring arity/closure, coordinate ranges. Deltas vs the
    full schema: no additionalProperties enforcement, value integrality
    not required, position arity unchecked."""
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
