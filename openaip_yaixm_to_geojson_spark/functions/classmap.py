"""Airspace class/type decision table as Spark column expressions.

Re-expresses the reference's mapClassAndType decision procedure
(reference: src/airspace-converter.ts:344-492) declaratively: the combo
tables live as plain data, compiled once into a `when/otherwise` chain so
the whole mapping stays inside whole-stage codegen (no UDF, no shuffle).
Unmappable combinations yield a non-null `map_error` column instead of
silently dropping rows — the engine's error channel mirrors the
reference's throw semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALLOWED_TYPES = ["CTA", "TMA", "CTR", "ATZ", "OTHER", "D", "P", "R", "D_OTHER"]
ALLOWED_LOCALTYPES = ["MATZ", "GLIDER", "GVS", "HIRTA", "LASER", "DZ", "NOATZ", "UL", "ILS", "RMZ", "TMZ"]
ALLOWED_CLASSES = ["A", "B", "C", "D", "E", "F", "G", "UNCLASSIFIED"]

# rules that override the declared type (reference :365-371); the FIRST
# matching entry of the row's `rules` array wins (Array.find semantics).
RULE_TYPES = ["TMZ", "TRA", "RMZ"]

# branch 1: type+class present -> type rename table (reference :376-409)
TYPE_RENAME = {
    "CTA": "CTA",
    "TMA": "TMA",
    "CTR": "CTR",
    "ATZ": "ATZ",
    "D": "DANGER",
    "P": "PROHIBITED",
    "R": "RESTRICTED",
    "TMZ": "TMZ",
    "RMZ": "RMZ",
    "TRA": "TRA",
}

# branch 2: (type|localtype) combos (reference :417-472)
# value: (mapped_type, mapped_class, activity or None)
COMBO_TABLE = {
    ("OTHER", "MATZ"): ("MATZ", "G", None),
    ("TRA", "GLIDER"): ("GLIDING_SECTOR", "UNCLASSIFIED", None),
    ("D_OTHER", "GLIDER"): ("GLIDING_SECTOR", "UNCLASSIFIED", None),
    ("D_OTHER", "GVS"): ("WARNING", "UNCLASSIFIED", None),
    ("D_OTHER", "HIRTA"): ("WARNING", "UNCLASSIFIED", None),
    ("D_OTHER", "LASER"): ("WARNING", "UNCLASSIFIED", None),
    ("OTHER", "ILS"): ("WARNING", "UNCLASSIFIED", None),
    ("D_OTHER", "DZ"): ("AERIAL_SPORTING_RECREATIONAL", "UNCLASSIFIED", "PARACHUTING"),
    ("OTHER", "GLIDER"): ("AERIAL_SPORTING_RECREATIONAL", "UNCLASSIFIED", "AEROCLUB_AERIAL_WORK"),
    ("OTHER", "NOATZ"): ("AERIAL_SPORTING_RECREATIONAL", "UNCLASSIFIED", "AEROCLUB_AERIAL_WORK"),
    ("OTHER", "UL"): ("AERIAL_SPORTING_RECREATIONAL", "UNCLASSIFIED", "ULM"),
    ("RMZ", "RMZ"): ("RMZ", "UNCLASSIFIED", None),
    ("OTHER", "RMZ"): ("RMZ", "UNCLASSIFIED", None),
    ("TMZ", "TMZ"): ("TMZ", "UNCLASSIFIED", None),
    ("OTHER", "TMZ"): ("TMZ", "UNCLASSIFIED", None),
}

# branch 3: type only (reference :473-487)
TYPE_ONLY = {
    "ATZ": ("ATZ", "G", None),
    "MATZ": ("MATZ", "G", None),
    "D": ("DANGER", "UNCLASSIFIED", None),
    "P": ("PROHIBITED", "UNCLASSIFIED", None),
    "R": ("RESTRICTED", "UNCLASSIFIED", None),
}


def effective_type(type_col: Column, rules_col: Column) -> Column:
    """Type after rule override: the first element of `rules` that is one of
    RULE_TYPES replaces the declared type."""
    override = F.array_compact(
        F.transform(
            F.coalesce(rules_col, F.array()),
            lambda r: F.when(r.isin(RULE_TYPES), r),
        )
    )
    return F.when(F.size(override) > 0, override[0]).otherwise(type_col)


def map_class_and_type(
    type_col: Column, localtype_col: Column, class_col: Column, rules_col: Column
) -> Column:
    """Returns struct(mapped_type, mapped_class, activity, map_error).

    `map_error` is non-null (and the mapped fields null) when the reference
    implementation would throw.
    """
    eff = effective_type(type_col, rules_col)

    guard_error = (
        F.when(
            ~type_col.isin(ALLOWED_TYPES),
            F.concat(F.lit("type value not allowed: "), F.coalesce(type_col, F.lit("null"))),
        )
        .when(
            localtype_col.isNotNull() & ~localtype_col.isin(ALLOWED_LOCALTYPES),
            F.concat(F.lit("localtype value not allowed: "), localtype_col),
        )
        .when(
            class_col.isNotNull() & ~class_col.isin(ALLOWED_CLASSES),
            F.concat(F.lit("class value not allowed: "), class_col),
        )
    )

    # branch 1: type + class (when-cascade over the rename table)
    rename = None
    for src, dst in TYPE_RENAME.items():
        cond = eff == src
        rename = F.when(cond, F.lit(dst)) if rename is None else rename.when(cond, F.lit(dst))
    rename = rename.otherwise(F.lit(None).cast("string"))

    branch1 = F.struct(
        rename.alias("mapped_type"),
        class_col.alias("mapped_class"),
        F.lit(None).cast("string").alias("activity"),
        F.when(rename.isNull(), F.concat(F.lit("no type mapping for: "), eff)).alias("map_error"),
    )

    # branch 2: type + localtype combo
    combo = None
    for (t, lt), (mt, mc, act) in COMBO_TABLE.items():
        cond = (eff == t) & (localtype_col == lt)
        value = F.struct(
            F.lit(mt).alias("mapped_type"),
            F.lit(mc).alias("mapped_class"),
            F.lit(act).cast("string").alias("activity"),
            F.lit(None).cast("string").alias("map_error"),
        )
        combo = F.when(cond, value) if combo is None else combo.when(cond, value)
    combo = combo.otherwise(
        F.struct(
            F.lit(None).cast("string").alias("mapped_type"),
            F.lit(None).cast("string").alias("mapped_class"),
            F.lit(None).cast("string").alias("activity"),
            F.concat(
                F.lit("no combo mapping for: "), eff, F.lit("|"), localtype_col
            ).alias("map_error"),
        )
    )

    # branch 3: type only
    type_only = None
    for t, (mt, mc, act) in TYPE_ONLY.items():
        cond = eff == t
        value = F.struct(
            F.lit(mt).alias("mapped_type"),
            F.lit(mc).alias("mapped_class"),
            F.lit(act).cast("string").alias("activity"),
            F.lit(None).cast("string").alias("map_error"),
        )
        type_only = F.when(cond, value) if type_only is None else type_only.when(cond, value)
    type_only = type_only.otherwise(
        F.struct(
            F.lit(None).cast("string").alias("mapped_type"),
            F.lit(None).cast("string").alias("mapped_class"),
            F.lit(None).cast("string").alias("activity"),
            F.concat(F.lit("no type-only mapping for: "), eff).alias("map_error"),
        )
    )

    mapped = (
        F.when(eff.isNotNull() & class_col.isNotNull(), branch1)
        .when(eff.isNotNull() & localtype_col.isNotNull(), combo)
        .when(eff.isNotNull(), type_only)
        .otherwise(
            F.struct(
                F.lit(None).cast("string").alias("mapped_type"),
                F.lit(None).cast("string").alias("mapped_class"),
                F.lit(None).cast("string").alias("activity"),
                F.lit("no mapping for null type").alias("map_error"),
            )
        )
    )

    return F.when(
        guard_error.isNotNull(),
        F.struct(
            F.lit(None).cast("string").alias("mapped_type"),
            F.lit(None).cast("string").alias("mapped_class"),
            F.lit(None).cast("string").alias("activity"),
            guard_error.alias("map_error"),
        ),
    ).otherwise(mapped)
