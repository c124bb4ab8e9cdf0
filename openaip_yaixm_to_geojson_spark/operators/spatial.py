"""Distributed spatial join: pages x airspace polygons.

Strategy (SURVEY.md §2 engine-only operators; no reference counterpart —
the reference is single-node, this is the north_rule's core operator):

1. **Cell encode** the point side with a pure column expression (codegen,
   no UDF on the fact table) at a configurable resolution.
2. **Cell cover** each polygon driver-side (polygons are the small side —
   thousands at most; the cover is exact rectangle/polygon intersection,
   so it is sound and tight).
3. **Equi-join** page cells against cover cells — broadcast when the cover
   is small (the common case), or a shuffle join with explicit salting of
   hot cells when the polygon side is too big to broadcast.
4. **Refine** candidates with a vectorized winding-number point-in-polygon
   pandas UDF (NumPy over Arrow batches, grouped by polygon id inside each
   batch).

At 10^12 rows the fact table sees: one projection, one codegen'd cell id,
one broadcast hash join (no shuffle), one Arrow hop for candidates only
(cover cells bound candidate count), then the aggregation of the caller's
choice. The only shuffle in the whole plan is whatever the caller
aggregates afterwards.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cellgrid
from ..functions.geodesy import points_in_ring_winding
from ..plans.localtable import literal_table

DEFAULT_JOIN_RES = 13  # ~0.044 deg cells: tight polygon covers, ~2x fewer false candidates than res 11 (bench-chosen)


def polygon_cover_df(
    spark: SparkSession, polygons: list[dict[str, Any]], res: int = DEFAULT_JOIN_RES
) -> DataFrame:
    """Small-side table: one row per (cover cell, polygon)."""
    rows = []
    for poly in polygons:
        for cell in cellgrid.cover(np.asarray(poly["ring"]), res):
            rows.append(
                {
                    "cell": cell,
                    "poly_id": int(poly["poly_id"]),
                    "airspace_name": poly["name"],
                    "airspace_type": poly["type"],
                    "airspace_class": poly["class"],
                }
            )
    schema = T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField("poly_id", T.IntegerType(), False),
            T.StructField("airspace_name", T.StringType(), False),
            T.StructField("airspace_type", T.StringType(), False),
            T.StructField("airspace_class", T.StringType(), False),
        ]
    )
    # literal relation, not createDataFrame: the cover is re-evaluated at
    # EVERY broadcast build and each evaluation of a parallelized pickle
    # RDD costs defaultParallelism Python tasks (~0.3-0.4 s on local[32])
    return literal_table(spark, rows, schema)


POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("airspace_name", T.StringType(), False),
        T.StructField("airspace_type", T.StringType(), False),
        T.StructField("airspace_class", T.StringType(), False),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType())), False),
    ]
)


def polygons_to_df(spark: SparkSession, polygons: list[dict[str, Any]]) -> DataFrame:
    """Fixture-style polygon dicts -> a polygons TABLE (the distributed
    representation; at production scale this comes straight from the
    converter output or a parquet/Iceberg polygons table, never a driver
    list)."""
    rows = [
        {
            "poly_id": int(p["poly_id"]),
            "airspace_name": p["name"],
            "airspace_type": p["type"],
            "airspace_class": p["class"],
            "ring": np.asarray(p["ring"], dtype=np.float64).tolist(),
        }
        for p in polygons
    ]
    return spark.createDataFrame(rows, schema=POLYGONS_SCHEMA)


def polygon_cover_distributed(polygons_df: DataFrame, res: int = DEFAULT_JOIN_RES) -> DataFrame:
    """Distributed cell cover: one pandas-UDF polyfill per polygon row +
    explode — no driver loop, so the polygon side can be millions of rows
    (VERDICT r1: the driver-side loop was the 100x scale-killer).

    Same exact rectangle/polygon intersection as cellgrid.cover, so the
    cover set is identical to the driver-side builder's."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover_cells(rings: pd.Series) -> pd.Series:
        # Arrow delivers array<array<double>> as an object array of arrays;
        # vstack rebuilds the (n, 2) ring matrix
        return pd.Series(
            [cellgrid.cover(np.vstack([np.asarray(pt, dtype=np.float64) for pt in ring]), res) for ring in rings]
        )

    return polygons_df.select(
        F.explode(cover_cells(F.col("ring"))).alias("cell"),
        "poly_id",
        "airspace_name",
        "airspace_type",
        "airspace_class",
    )


def make_pip_ring_udf():
    """Winding-number refine when the ring is a COLUMN (distributed polygon
    table) rather than a driver-held dict: one vectorized PIP call per
    polygon group inside each Arrow batch; the ring is decoded once per
    (batch, polygon), not per row."""

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, poly_id: pd.Series, ring: pd.Series) -> pd.Series:
        lon_np = lon.to_numpy(dtype=np.float64)
        lat_np = lat.to_numpy(dtype=np.float64)
        pid_np = poly_id.to_numpy()
        out = np.zeros(len(lon_np), dtype=bool)
        for pid in np.unique(pid_np):
            mask = pid_np == pid
            first = int(np.flatnonzero(mask)[0])
            ring_np = np.vstack([np.asarray(pt, dtype=np.float64) for pt in ring.iloc[first]])
            out[mask] = points_in_ring_winding(lon_np[mask], lat_np[mask], ring_np)
        return pd.Series(out)

    return pip


def pip_filter_with_ring(candidates: DataFrame) -> DataFrame:
    pip = make_pip_ring_udf()
    return candidates.where(pip(F.col("lon"), F.col("lat"), F.col("poly_id"), F.col("ring")))


def spatial_join_distributed(
    pages: DataFrame,
    polygons_df: DataFrame,
    res: int = DEFAULT_JOIN_RES,
    broadcast_polys: bool = True,
    salt: int | str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fully distributed spatial join: the polygon side is a TABLE end to
    end (cover via pandas-UDF polyfill + explode, PIP rings attached by a
    poly_id join), so nothing polygon-shaped ever materializes on the
    driver. Same rows as `spatial_join` (verified in tests).

    broadcast_polys=True broadcasts both the cover and the ring attach —
    right while polygons fit executor memory (up to ~10^5); set False for a
    shuffle join on `cell` / `poly_id` beyond that, with `salt` splintering
    hot cells exactly like the driver-list path (deterministic page-side
    salt from xxhash64(url), cover side exploded x salt; salt='auto'
    derives the factor from the cell histogram)."""
    cover = polygon_cover_distributed(polygons_df, res).select("cell", "poly_id")
    cells = pages.withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
    out_cols = ["url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"]
    out_cols += [c for c in keep_cols if c not in out_cols]

    if broadcast_polys:
        candidates = cells.join(F.broadcast(cover), "cell").join(F.broadcast(polygons_df), "poly_id")
        return pip_filter_with_ring(candidates).select(*out_cols)

    if salt == "auto":
        salt = choose_salt(pages, res)
    elif salt is not None and not isinstance(salt, int):
        raise TypeError(f"salt must be an int, None, or 'auto'; got {salt!r}")

    if salt and salt > 1:
        cells = cells.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(salt)).cast("int"))
        cover = cover.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        candidates = cells.repartition(F.col("cell"), F.col("_salt")).join(
            cover, ["cell", "_salt"]
        ).drop("_salt")
    else:
        candidates = cells.join(cover, "cell")
    candidates = candidates.join(polygons_df, "poly_id")
    return pip_filter_with_ring(candidates).select(*out_cols)


def make_pip_udf(spark: SparkSession, polygons: list[dict[str, Any]]):
    """Vectorized winding-number refine: (lon, lat, poly_id) -> bool.

    Rings are shipped via `SparkContext.broadcast` — one torrent transfer
    per executor, not a per-task closure copy — so the ring table can grow
    to millions of vertices without bloating task serialization.
    """
    rings = {int(p["poly_id"]): np.asarray(p["ring"], dtype=np.float64) for p in polygons}
    bc_rings = spark.sparkContext.broadcast(rings)

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, poly_id: pd.Series) -> pd.Series:
        ring_map = bc_rings.value
        lon_np = lon.to_numpy(dtype=np.float64)
        lat_np = lat.to_numpy(dtype=np.float64)
        pid_np = poly_id.to_numpy()
        out = np.zeros(len(lon_np), dtype=bool)
        # group the batch by polygon: one vectorized PIP call per polygon
        for pid in np.unique(pid_np):
            mask = pid_np == pid
            ring = ring_map.get(int(pid))
            if ring is None:
                continue
            out[mask] = points_in_ring_winding(lon_np[mask], lat_np[mask], ring)
        return pd.Series(out)

    return pip


def spatial_join(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    res: int = DEFAULT_JOIN_RES,
    broadcast: bool = True,
    salt: int | str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pages inside polygons. Returns (url, lat, lon, poly_id,
    airspace_name, airspace_type, airspace_class, *keep_cols).

    broadcast=True: map-side hash join, zero shuffle of the page side.
    broadcast=False: shuffle hash join on the cell key; `salt` explicitly
    splinters hot cells — the page side gets a deterministic salt from
    xxhash64(url) and the cover side is exploded x salt, so skewed cells
    spread over `salt` reducers (AQE skew-join stays on as backstop).
    salt="auto" derives the factor from the cell histogram (choose_salt) —
    deterministic for a given input at any parallelism.
    """
    spark = pages.sparkSession
    cover = polygon_cover_df(spark, polygons, res)
    cells = pages.withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))

    if broadcast:
        # salt is a shuffle-join concept; resolving 'auto' here would run a
        # full groupBy-count scan of the fact table for nothing.
        candidates = cells.join(F.broadcast(cover), "cell")
        pip = make_pip_udf(spark, polygons)
        out_cols = ["url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"]
        out_cols += [c for c in keep_cols if c not in out_cols]
        return candidates.where(pip(F.col("lon"), F.col("lat"), F.col("poly_id"))).select(*out_cols)

    if salt == "auto":
        salt = choose_salt(pages, res)
    elif salt is not None and not isinstance(salt, int):
        raise TypeError(f"salt must be an int, None, or 'auto'; got {salt!r}")

    if salt and salt > 1:
        cells = cells.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(salt)).cast("int"))
        cover_salted = cover.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        candidates = cells.repartition(F.col("cell"), F.col("_salt")).join(
            cover_salted, ["cell", "_salt"]
        ).drop("_salt")
    else:
        candidates = cells.join(cover, "cell")

    pip = make_pip_udf(spark, polygons)
    out_cols = ["url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"]
    out_cols += [c for c in keep_cols if c not in out_cols]
    return candidates.where(pip(F.col("lon"), F.col("lat"), F.col("poly_id"))).select(*out_cols)


def compact_cover_df(
    spark: SparkSession,
    polygons: list[dict[str, Any]],
    res_min: int = 10,
    res_max: int = DEFAULT_JOIN_RES,
) -> DataFrame:
    """Quadtree-compacted cover table: (cell, full, poly_id, airspace_*).
    `full` rows need no PIP refinement (their whole rectangle is inside)."""
    rows = []
    for poly in polygons:
        for cell, full in cellgrid.cover_compact(np.asarray(poly["ring"]), res_min, res_max):
            rows.append(
                {
                    "cell": cell,
                    "full": bool(full),
                    "poly_id": int(poly["poly_id"]),
                    "airspace_name": poly["name"],
                    "airspace_type": poly["type"],
                    "airspace_class": poly["class"],
                }
            )
    schema = T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField("full", T.BooleanType(), False),
            T.StructField("poly_id", T.IntegerType(), False),
            T.StructField("airspace_name", T.StringType(), False),
            T.StructField("airspace_type", T.StringType(), False),
            T.StructField("airspace_class", T.StringType(), False),
        ]
    )
    return literal_table(spark, rows, schema)


def spatial_join_compact(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    res_min: int = 10,
    res_max: int = DEFAULT_JOIN_RES,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Spatial join against a COMPACTED mixed-resolution cover.

    The point side probes one cell id per resolution level (explode x
    (res_max - res_min + 1) before the broadcast join); the cover's
    regions are disjoint so each point still matches a polygon at most
    once, and points landing in `full` cells skip the PIP UDF entirely —
    only boundary-cell candidates pay the Arrow hop. Same rows as
    spatial_join. Choose this over the uniform cover when polygon AREA
    (broadcast bytes) is the bottleneck — a 1.5-deg polygon's cover drops
    7.2x — NOT for wall time at small cover sizes: measured at 8M docs
    against one large polygon, the PIP-skip gain roughly cancels the
    (res_max - res_min + 1)x point-side probe fan-out (2.3s vs 2.2s)."""
    spark = pages.sparkSession
    cover = compact_cover_df(spark, polygons, res_min, res_max)
    levels = [
        cellgrid.cell_id_col(F.col("lon"), F.col("lat"), r) for r in range(res_min, res_max + 1)
    ]
    cells = pages.withColumn("cell", F.explode(F.array(*levels)))
    candidates = cells.join(F.broadcast(cover), "cell")
    pip = make_pip_udf(spark, polygons)
    out_cols = ["url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"]
    out_cols += [c for c in keep_cols if c not in out_cols]
    keep = F.col("full") | pip(F.col("lon"), F.col("lat"), F.col("poly_id"))
    return candidates.where(keep).select(*out_cols)


def compact_cover_distributed(
    polygons_df: DataFrame, res_min: int = 10, res_max: int = DEFAULT_JOIN_RES
) -> DataFrame:
    """Distributed quadtree-compacted cover: one pandas-UDF compaction per
    polygon row + explode — the polygons-TABLE twin of compact_cover_df, so
    the polygon side can be millions of rows. Identical (cell, full) set to
    cellgrid.cover_compact per polygon."""
    entry_type = T.ArrayType(
        T.StructType(
            [T.StructField("cell", T.LongType()), T.StructField("full", T.BooleanType())]
        )
    )

    @F.pandas_udf(entry_type)
    def compact_cells(rings: pd.Series) -> pd.Series:
        out = []
        for ring in rings:
            ring_np = np.vstack([np.asarray(pt, dtype=np.float64) for pt in ring])
            out.append(
                [
                    {"cell": int(cell), "full": bool(full)}
                    for cell, full in cellgrid.cover_compact(ring_np, res_min, res_max)
                ]
            )
        return pd.Series(out)

    return polygons_df.select(
        F.explode(compact_cells(F.col("ring"))).alias("_e"),
        "poly_id",
        "airspace_name",
        "airspace_type",
        "airspace_class",
    ).select(
        F.col("_e.cell").alias("cell"),
        F.col("_e.full").alias("full"),
        "poly_id",
        "airspace_name",
        "airspace_type",
        "airspace_class",
    )


def spatial_join_compact_table(
    pages: DataFrame,
    polygons_df: DataFrame,
    res_min: int = 10,
    res_max: int = DEFAULT_JOIN_RES,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """spatial_join_compact with the polygon side as a TABLE end to end:
    compacted cover via distributed pandas-UDF compaction + explode, PIP
    rings attached by a poly_id join — nothing polygon-shaped on the
    driver. `full`-cell candidates skip the PIP refine exactly like the
    driver-list variant; same rows as spatial_join."""
    cover = compact_cover_distributed(polygons_df, res_min, res_max).select(
        "cell", "full", "poly_id"
    )
    levels = [
        cellgrid.cell_id_col(F.col("lon"), F.col("lat"), r) for r in range(res_min, res_max + 1)
    ]
    cells = pages.withColumn("cell", F.explode(F.array(*levels)))
    candidates = cells.join(F.broadcast(cover), "cell").join(
        F.broadcast(polygons_df), "poly_id"
    )
    pip = make_pip_ring_udf()
    out_cols = ["url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"]
    out_cols += [c for c in keep_cols if c not in out_cols]
    keep = F.col("full") | pip(F.col("lon"), F.col("lat"), F.col("poly_id"), F.col("ring"))
    return candidates.where(keep).select(*out_cols)


def cell_histogram(pages: DataFrame, res: int = DEFAULT_JOIN_RES) -> DataFrame:
    """Per-cell page counts — the deterministic input for choosing a salt
    factor (hot cells = skew)."""
    return (
        pages.withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def choose_salt(pages: DataFrame, res: int = DEFAULT_JOIN_RES, rows_per_task: int = 2_000_000) -> int:
    """Deterministic salt factor: hottest cell count / target rows per task,
    clamped to [1, 64]. Same data -> same plan at any parallelism."""
    hottest = cell_histogram(pages, res).agg(F.max("n_pages")).first()[0] or 0
    return int(max(1, min(64, -(-hottest // rows_per_task))))


# ---------------------------------------------------------------------------
# polygon-polygon overlap join (airspace conflict pairs)
# ---------------------------------------------------------------------------
#
# Overlap predicate (shared FORMULATION with the SQL oracle — not merely
# equivalent semantics): pair (A, B) overlaps iff
#   (a) some ring vertex of A is inside B by the EVEN-ODD crossing test
#       written with the oracle's exact op order
#       (px < x1 + (x2 - x1) * (py - y1) / (y2 - y1)), or vice versa; or
#   (b) some edge of A PROPERLY crosses an edge of B: strict sign tests on
#       cross products (d1*d2 < 0 AND d3*d4 < 0) — no division at all.
# Every comparison is on doubles computed by the identical single-rounded
# IEEE sequence in NumPy and DuckDB, so even boundary-degenerate inputs
# (abutting sectors sharing edges/vertices — common in real airspace)
# produce the SAME verdict in both engines. Geometrically, pairs that only
# TOUCH (shared edge, disjoint interiors) may report either way — that is
# a property of float predicates, documented here, deterministic across
# engines; exactness on degenerate inputs would need rational arithmetic.
#
# Candidate completeness: if the predicate holds there is a witness point
# q on both polygons' closed regions (a vertex of one inside the other, or
# a crossing point), so cell(q) intersects both rings and both cell COVERS
# contain it — the cover self-join on `cell` never misses a true pair.


def _even_odd_inside_np(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity, op-for-op the SQL oracle's formula."""
    x1 = ring[:-1, 0][None, :]
    y1 = ring[:-1, 1][None, :]
    x2 = ring[1:, 0][None, :]
    y2 = ring[1:, 1][None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    straddle = (y1 > pyc) != (y2 > pyc)
    # the divide only matters where straddle (y2 != y1); elsewhere inf/nan
    # sentinels are masked out
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        xcross = x1 + (x2 - x1) * (pyc - y1) / (y2 - y1)
    cnt = (straddle & (pxc < xcross)).sum(axis=1)
    return (cnt % 2) == 1


def _proper_cross_np(A: np.ndarray, B: np.ndarray) -> bool:
    """Any strict edge crossing between rings A and B (sign tests only)."""
    ax1 = A[:-1, 0][:, None]
    ay1 = A[:-1, 1][:, None]
    ax2 = A[1:, 0][:, None]
    ay2 = A[1:, 1][:, None]
    bx1 = B[:-1, 0][None, :]
    by1 = B[:-1, 1][None, :]
    bx2 = B[1:, 0][None, :]
    by2 = B[1:, 1][None, :]
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def _rings_overlap_np(A: np.ndarray, B: np.ndarray) -> bool:
    if _even_odd_inside_np(A[:-1, 0], A[:-1, 1], B).any():
        return True
    if _even_odd_inside_np(B[:-1, 0], B[:-1, 1], A).any():
        return True
    return _proper_cross_np(A, B)


def _overlap_candidates(cover: DataFrame) -> DataFrame:
    """Distinct (poly_a < poly_b) pairs whose covers share a cell — the
    same equi-join shuffle shape as every other spatial candidate step."""
    a = cover.select(F.col("cell"), F.col("poly_id").alias("poly_a"))
    b = cover.select(F.col("cell"), F.col("poly_id").alias("poly_b"))
    return (
        a.join(b, "cell")
        .where(F.col("poly_a") < F.col("poly_b"))
        .select("poly_a", "poly_b")
        .distinct()
    )


def polygon_overlap_pairs(
    spark: SparkSession, polygons: list[dict[str, Any]], res: int = DEFAULT_JOIN_RES
) -> DataFrame:
    """(poly_a, poly_b) pairs of overlapping polygons, driver-list variant:
    candidates from the cover self-join, exact refine per pair with the
    rings held in the UDF closure (vectorized vertex-in + edge-cross per
    candidate — candidates are few, each test O(|A| * |B|) NumPy)."""
    rings = {int(p["poly_id"]): np.asarray(p["ring"], dtype=np.float64) for p in polygons}
    cover = polygon_cover_df(spark, polygons, res).select("cell", "poly_id")

    @F.pandas_udf(T.BooleanType())
    def overlaps(pa: pd.Series, pb: pd.Series) -> pd.Series:
        return pd.Series(
            [_rings_overlap_np(rings[int(x)], rings[int(y)]) for x, y in zip(pa, pb)]
        )

    return _overlap_candidates(cover).where(overlaps(F.col("poly_a"), F.col("poly_b")))


def polygon_overlap_pairs_table(polygons_df: DataFrame, res: int = DEFAULT_JOIN_RES) -> DataFrame:
    """Overlap pairs with the polygon side a TABLE end to end: distributed
    polyfill cover -> cover self-join candidates -> ring arrays attached by
    two equi-joins on poly_id -> mapInPandas exact refine. Nothing
    polygon-shaped touches the driver; ring payloads travel only on the
    (few) candidate pairs."""
    # the cover feeds BOTH sides of the candidate self-join; without a
    # materialization the pandas-UDF polyfill executes once per side
    # (plan-audited: two ArrowEvalPython stages) — the fan-out-reuse trap
    cover = (
        polygon_cover_distributed(polygons_df, res)
        .select("cell", "poly_id")
        .localCheckpoint()
    )
    cand = _overlap_candidates(cover)
    rings = polygons_df.select(F.col("poly_id").cast("int").alias("poly_id"), "ring")
    cand = (
        cand.join(rings.withColumnRenamed("poly_id", "poly_a").withColumnRenamed("ring", "ring_a"), "poly_a")
        .join(rings.withColumnRenamed("poly_id", "poly_b").withColumnRenamed("ring", "ring_b"), "poly_b")
    )

    out_schema = T.StructType(
        [
            T.StructField("poly_a", T.IntegerType()),
            T.StructField("poly_b", T.IntegerType()),
        ]
    )

    def refine(batches):
        for pdf in batches:
            keep = []
            for row in pdf.itertuples(index=False):
                A = np.vstack([np.asarray(pt, dtype=np.float64) for pt in row.ring_a])
                B = np.vstack([np.asarray(pt, dtype=np.float64) for pt in row.ring_b])
                keep.append(_rings_overlap_np(A, B))
            yield pdf.loc[keep, ["poly_a", "poly_b"]]

    return cand.mapInPandas(refine, schema=out_schema)


def ring_decimate(polygons_df: DataFrame, tol_area_deg2: float = 1e-6) -> DataFrame:
    """One-pass vertex decimation for tile rendering (single Visvalingam
    sweep): interior vertex i survives iff the triangle it spans with its
    neighbours has area > tol — densified arc/circle chains (tiny, nearly
    collinear triangles) collapse to sparse outlines while true corners
    stay. Endpoints always survive, so closure is preserved.

    Expressed entirely as array expressions over the ring COLUMN (filter
    over an index sequence + element_at — the ring is a materialized input
    column, so per-element access is attribute lookup, not expression
    re-inlining). Zero shuffles; the explode is narrow. The area test is
    sub/mul/abs/compare — single-rounded IEEE ops, so kept coordinates
    hash-gate bit-for-bit against the DuckDB twin.

    Output: (poly_id, vertex_idx, x, y) of surviving vertices with their
    ORIGINAL 1-based index (consumers re-assemble rings by sorting)."""
    ring = F.col("ring")
    n = F.size(ring)

    def keep_vertex(i):
        pm = F.element_at(ring, i - 1)
        p = F.element_at(ring, i)
        pp = F.element_at(ring, i + 1)
        cross = (p[0] - pm[0]) * (pp[1] - p[1]) - (p[1] - pm[1]) * (pp[0] - p[0])
        return F.abs(cross) > F.lit(2.0 * tol_area_deg2)

    interior = F.filter(F.sequence(F.lit(2), n - 1), keep_vertex)
    # the n >= 1 guard matters: Spark's sequence(1, 0) counts DOWN to
    # [1, 0] (the documented _word_ngrams_col trap) and element_at(ring, 0)
    # then throws under ANSI — an empty ring must yield zero rows, like
    # the oracle's generate_series(1, 0) = []
    keep = (
        F.when(n >= 3, F.concat(F.array(F.lit(1)), interior, F.array(n)))
        .when(n >= 1, F.sequence(F.lit(1), n))
        .otherwise(F.array().cast("array<int>"))
    )
    return (
        polygons_df.select("poly_id", "ring", keep.alias("keep"))
        .select("poly_id", "ring", F.explode("keep").alias("vertex_idx"))
        .select(
            F.col("poly_id").cast("int").alias("poly_id"),
            F.col("vertex_idx").cast("int").alias("vertex_idx"),
            F.element_at(ring, F.col("vertex_idx"))[0].alias("x"),
            F.element_at(ring, F.col("vertex_idx"))[1].alias("y"),
        )
    )


def polygon_area_orientation(polygons_df: DataFrame) -> DataFrame:
    """(poly_id, area_deg2, is_ccw): planar shoelace area and winding
    orientation of each ring, computed entirely in Catalyst expressions
    over the ring COLUMN (zip_with cross terms -> 0.0-seeded left-fold
    double sum — the determinism rule every ARRAY fold follows, so the
    DOUBLE hash-gates bit-for-bit against the oracle's list_reduce).

    Planar (degree^2) by design: the spherical area kernel
    (geodesy.ring_area_m2) is trig-based and libm sin() is not
    bit-reproducible across engines — it stays golden-pinned instead.
    Orientation is the useful analytic here (GeoJSON exterior rings are
    CCW); area ratios at airspace scales track the planar value closely.
    Zero shuffles: one projection over the polygons table."""
    ring = F.col("ring")
    n = F.size(ring) - 1
    head = F.slice(ring, 1, n)
    tail = F.slice(ring, 2, n)
    terms = F.zip_with(head, tail, lambda p, q: p[0] * q[1] - q[0] * p[1])
    signed2 = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    staged = polygons_df.select(
        F.col("poly_id").cast("int").alias("poly_id"), signed2.alias("_s2")
    )
    return staged.select(
        "poly_id",
        (F.abs(F.col("_s2")) / F.lit(2.0)).alias("area_deg2"),
        (F.col("_s2") > F.lit(0.0)).alias("is_ccw"),
    )


# ---------------------------------------------------------------------------
# grid-density clustering (DBSCAN-style core cells + connected components)
# ---------------------------------------------------------------------------


def geo_cluster_cells(
    pages: DataFrame, res: int = 7, min_pts: int = 2, max_iters: int = 200
) -> DataFrame:
    """(cell, cluster_id, n_points): DBSCAN-flavored density clustering on
    the cell grid — cells holding >= min_pts pages are dense; dense cells
    that are 8-neighbors merge into one cluster labeled by the minimum
    member cell id.

    Scale shape: the corpus collapses to per-cell counts in one map-side-
    partial groupBy; everything after runs on the DENSE-CELL set, which is
    bounded by the grid (2^res * 2^(res-1) cells), not the corpus. The
    8-neighbor edge join matches on DECODED (x, y) coordinates — never on
    id +/- offset arithmetic, which aliases across row boundaries at grid
    edges — and world wrap is deliberately absent (planar contract shared
    with knn_points). Components come from dedup.duplicate_clusters
    (min-label hop propagation, rounds ~ component diameter — fine here
    because the node set is grid-bounded and each round is a tiny join;
    its non-convergence RAISE contract applies)."""
    from .dedup import duplicate_clusters

    cells = (
        pages.select(cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    # dense feeds the edge self-join (twice) and the final join: materialize
    dense = cells.where(F.col("n_points") >= min_pts).localCheckpoint()
    shift = cellgrid._SHIFT
    xy = dense.select(
        "cell",
        (F.col("cell") % shift).alias("x"),
        F.expr(f"(cell div {shift}) % {shift}").alias("y"),
    )
    offs = literal_table(
        pages.sparkSession,
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx int, dy int",
    )
    a = xy.crossJoin(F.broadcast(offs)).select(
        F.col("cell").alias("key_a"), (F.col("x") + F.col("dx")).alias("nx"),
        (F.col("y") + F.col("dy")).alias("ny"),
    )
    b = xy.select(F.col("cell").alias("key_b"), F.col("x").alias("nx"), F.col("y").alias("ny"))
    pairs = (
        a.join(b, ["nx", "ny"]).where(F.col("key_a") < F.col("key_b")).select("key_a", "key_b")
    )
    labels = duplicate_clusters(
        pairs, documents=dense.select(F.col("cell")), key_col="cell", max_iters=max_iters
    )
    return dense.join(labels, dense.cell == labels.key).select(
        "cell", "cluster_id", "n_points"
    )


def polygon_centroid(polygons_df: DataFrame) -> DataFrame:
    """(poly_id, centroid_lon, centroid_lat, area_deg2): planar polygon
    centroid via the shoelace moment formula — Cx = sum((x_i + x_j) *
    cross_ij) / (3 * sum(cross_ij)) — entirely Catalyst expressions over
    the ring COLUMN. Same determinism contract as
    polygon_area_orientation: every sum is a 0.0-seeded left fold, each
    remaining op (add inside the term, one multiply, one divide) is
    single-rounded IEEE in an op order shared with the SQL twin, so the
    DOUBLEs hash-gate. Degenerate zero-area rings yield NULL centroids.
    Zero shuffles — one staged projection over the polygons table."""
    ring = F.col("ring")
    n = F.size(ring) - 1
    head = F.slice(ring, 1, n)
    tail = F.slice(ring, 2, n)
    cross = lambda p, q: p[0] * q[1] - q[0] * p[1]  # noqa: E731
    staged = polygons_df.select(
        F.col("poly_id").cast("int").alias("poly_id"),
        F.aggregate(F.zip_with(head, tail, cross), F.lit(0.0), lambda a, t: a + t).alias("_s2"),
        F.aggregate(
            F.zip_with(head, tail, lambda p, q: (p[0] + q[0]) * cross(p, q)),
            F.lit(0.0),
            lambda a, t: a + t,
        ).alias("_sx"),
        F.aggregate(
            F.zip_with(head, tail, lambda p, q: (p[1] + q[1]) * cross(p, q)),
            F.lit(0.0),
            lambda a, t: a + t,
        ).alias("_sy"),
    )
    nonzero = F.col("_s2") != F.lit(0.0)
    return staged.select(
        "poly_id",
        F.when(nonzero, F.col("_sx") / (F.lit(3.0) * F.col("_s2"))).alias("centroid_lon"),
        F.when(nonzero, F.col("_sy") / (F.lit(3.0) * F.col("_s2"))).alias("centroid_lat"),
        (F.abs(F.col("_s2")) / F.lit(2.0)).alias("area_deg2"),
    )


def airspace_density(join_out: DataFrame, polygons_df: DataFrame) -> DataFrame:
    """Document density per airspace: spatial-join hit counts normalized
    by the planar shoelace area — (poly_id, doc_count, area_deg2,
    docs_per_deg2). Polygons with no hits keep a zero count; degenerate
    zero-area rings yield NULL density. ONE single-rounded division on
    top of the exact count and the fold-derived area, so it hash-gates.

    Scale shape: the fact side collapses to poly-level counts in one
    map-side-partial aggregation; the area projection and the final join
    run at polygon-table scale."""
    counts = join_out.groupBy("poly_id").agg(F.count(F.lit(1)).alias("doc_count"))
    areas = polygon_area_orientation(polygons_df).select("poly_id", "area_deg2")
    return areas.join(counts, "poly_id", "left").select(
        "poly_id",
        F.coalesce("doc_count", F.lit(0)).cast("bigint").alias("doc_count"),
        "area_deg2",
        F.when(
            F.col("area_deg2") > F.lit(0.0),
            F.coalesce("doc_count", F.lit(0)).cast("double") / F.col("area_deg2"),
        ).alias("docs_per_deg2"),
    )


def _ring_contains_np(outer: np.ndarray, inner: np.ndarray) -> bool:
    """outer contains inner iff EVERY inner vertex passes the even-odd
    inside test against outer AND no edge properly crosses — the same
    float-predicate contract as _rings_overlap_np (identical single-rounded
    IEEE sequences in NumPy and the SQL oracle; rings that merely TOUCH may
    verdict either way, deterministically and identically in both engines)."""
    if not _even_odd_inside_np(inner[:-1, 0], inner[:-1, 1], outer).all():
        return False
    return not _proper_cross_np(outer, inner)


def polygon_contains_pairs(
    spark: SparkSession, polygons: list[dict[str, Any]], res: int = DEFAULT_JOIN_RES
) -> DataFrame:
    """(outer_poly, inner_poly) DIRECTED nesting pairs — which airspaces sit
    wholly inside others (a CTR inside its TMA, danger areas inside a CTA).

    Candidate completeness is STRONGER than overlap's: if outer contains
    inner, every cover cell of inner holds a point of inner ⊆ outer, so it
    intersects outer and is in outer's cover too — the cover self-join can
    never miss a true nesting. Refine is vectorized per pair (vertex-in
    O(|inner|x|outer|) + cross tests), pairs are few."""
    rings = {int(p["poly_id"]): np.asarray(p["ring"], dtype=np.float64) for p in polygons}
    cover = polygon_cover_df(spark, polygons, res).select("cell", "poly_id")
    a = cover.select(F.col("cell"), F.col("poly_id").alias("outer_poly"))
    b = cover.select(F.col("cell"), F.col("poly_id").alias("inner_poly"))
    cand = (
        a.join(b, "cell")
        .where(F.col("outer_poly") != F.col("inner_poly"))
        .select("outer_poly", "inner_poly")
        .distinct()
    )

    @F.pandas_udf(T.BooleanType())
    def contains(po: pd.Series, pi: pd.Series) -> pd.Series:
        return pd.Series(
            [_ring_contains_np(rings[int(x)], rings[int(y)]) for x, y in zip(po, pi)]
        )

    return cand.where(contains(F.col("outer_poly"), F.col("inner_poly")))


def salt_plan(
    pages: DataFrame, res: int = DEFAULT_JOIN_RES, rows_per_task: int = 2_000_000
) -> DataFrame:
    """The skew-handling DERIVATION as a queryable one-row plan:
    (hottest_cell, hottest_rows, salt) with salt = ceil(hottest_rows /
    rows_per_task) clamped to [1, 64] — what choose_salt computes, exposed
    as a DataFrame so the driver gate certifies the derivation the salted
    join runs on. Ties on the hottest count break to the smaller cell id.
    One map-side-partial aggregation to #cells rows, then a 1-row min-by."""
    hist = cell_histogram(pages, res)
    # hottest cell as a 1-row min-by over the negated count (ties -> the
    # smaller cell id, deterministic)
    top = hist.agg(
        F.min(F.struct((-F.col("n_pages")).alias("neg"), F.col("cell"))).alias("_b")
    ).select(
        F.col("_b.cell").alias("hottest_cell"),
        (-F.col("_b.neg")).alias("hottest_rows"),
    )
    salt = F.least(
        F.lit(64).cast("bigint"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"(hottest_rows + {rows_per_task - 1}) div {rows_per_task}"),
        ),
    )
    return top.select("hottest_cell", "hottest_rows", salt.alias("salt"))


def page_zorder(pages: DataFrame, res: int = 12) -> DataFrame:
    """(url, zkey): Z-order / Morton clustering key at `res` bits per axis
    — the storage-layout key for 2D-local writes (a z-sorted or
    z-range-partitioned table prunes on BOTH lon and lat with one sort
    key, where the row-major cell id preserves locality only along x).
    Pure integer arithmetic shared with the oracle; codegen, zero
    shuffles. Pair with range_partition_plan over zkey for balanced
    z-clustered output files."""
    size = cellgrid.cell_size_deg(res)
    x = F.floor((F.col("lon") + F.lit(180.0)) / F.lit(size)).cast("bigint")
    y = F.floor((F.col("lat") + F.lit(90.0)) / F.lit(size)).cast("bigint")
    return pages.select("url", x.alias("zx"), y.alias("zy")).select(
        "url", F.expr(cellgrid.morton_terms("zx", "zy", res, "div")).cast("bigint").alias("zkey")
    )
