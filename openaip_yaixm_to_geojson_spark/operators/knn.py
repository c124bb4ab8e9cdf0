"""kNN: nearest airspace per page via cell-ring expansion.

Engine-only operator (no reference counterpart; mandated by the north
rule). Two distance metrics, both plain arithmetic so the DuckDB oracle
reproduces them bit-for-bit (trig-free):

* VERTEX distance (`knn_*`): squared planar degree distance to the nearest
  polygon ring vertex — tight on densified arc/circle rings, but `line:`
  boundary segments are NOT densified, so a page near the midpoint of a
  long straight edge can get an overstated distance (r3 VERDICT item).
* EDGE distance (`knn_edge_*`): exact squared point-to-segment distance
  (projection clamped to [0,1], every op a single-rounded IEEE double in a
  fixed order shared by the Spark expression, the NumPy fallback and the
  SQL oracle) — what "nearest airspace" users expect.

Implementations:

* `knn_ring_expansion` / `knn_edge_ring_expansion` — the scale path. Index
  points (ring vertices, or segment sample points carrying their segment's
  endpoints) are bucketed by grid cell; each round joins still-unmatched
  pages against the index expanded to a Chebyshev window, takes the best
  candidate (for edges: the EXACT segment distance — sampling only drives
  candidate generation, never the reported distance), and finalizes pages
  whose best distance beats anything an unseen ring could hold. Each round
  is one broadcast/shuffle join + one aggregation on the shrinking
  unmatched set.

* `knn_bruteforce` / `knn_edge_bruteforce` — vectorized NumPy baselines
  (points x index rows per Arrow batch). Oracle cross-check + tail
  fallback + tiny-input fast path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cellgrid
from ..plans.localtable import literal_table

KNN_RES = 9  # ~0.7 deg cells for the vertex index
OUT_COLS = ("url", "lat", "lon", "poly_id", "dist_sq")
# vertex-index rows (vertices x window offsets) past this are shuffle-joined
# on `cell` instead of broadcast: building + shipping a multi-hundred-MB
# broadcast relation costs more than shuffling the (shrunken) pending side
# (measured ~20% on the wide round at bench scale)
BROADCAST_INDEX_MAX_ROWS = 500_000
# brute-force fallback: vertices scanned per inner chunk so each Arrow batch
# allocates O(batch_rows x chunk) instead of O(batch_rows x all_vertices)
BRUTEFORCE_CHUNK = 4096


def _vertex_arrays(polygons: list[dict[str, Any]]):
    pids, vx, vy = [], [], []
    for poly in polygons:
        ring = np.asarray(poly["ring"], dtype=np.float64)[:-1]  # closing dup excluded
        pids.append(np.full(len(ring), int(poly["poly_id"]), dtype=np.int64))
        vx.append(ring[:, 0])
        vy.append(ring[:, 1])
    return np.concatenate(pids), np.concatenate(vx), np.concatenate(vy)


def knn_bruteforce(pages: DataFrame, polygons: list[dict[str, Any]]) -> DataFrame:
    """(url, nearest poly_id, dist_sq) by exact scan over all vertices —
    vectorized per Arrow batch; ties break to the smaller poly_id."""
    pids, vx, vy = _vertex_arrays(polygons)
    order = np.lexsort((pids,))  # stable: ties resolved to smallest poly_id
    pids, vx, vy = pids[order], vx[order], vy[order]

    result_type = T.StructType(
        [
            T.StructField("poly_id", T.IntegerType()),
            T.StructField("dist_sq", T.DoubleType()),
        ]
    )

    @F.pandas_udf(result_type)
    def nearest(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lon_np = lon.to_numpy(dtype=np.float64)[:, None]
        lat_np = lat.to_numpy(dtype=np.float64)[:, None]
        n = len(lon_np)
        # scan vertices in pid-sorted chunks: per-batch memory stays
        # O(batch_rows x BRUTEFORCE_CHUNK) however many vertices exist.
        # argmin's first-occurrence rule on the pid-sorted array + the
        # strict `<` merge give the smallest-poly_id tie-break (matches the
        # SQL oracle's row_number ordered by dist_sq, poly_id).
        best = np.full(n, np.inf)
        best_pid = np.full(n, -1, dtype=np.int64)
        for s in range(0, len(vx), BRUTEFORCE_CHUNK):
            cx, cy, cp = vx[s : s + BRUTEFORCE_CHUNK], vy[s : s + BRUTEFORCE_CHUNK], pids[s : s + BRUTEFORCE_CHUNK]
            dx = lon_np - cx[None, :]
            dy = lat_np - cy[None, :]
            d2 = dx * dx + dy * dy
            idx = d2.argmin(axis=1)
            dmin = d2[np.arange(n), idx]
            take = dmin < best
            best[take] = dmin[take]
            best_pid[take] = cp[idx[take]]
        return pd.DataFrame({"poly_id": best_pid.astype("int32"), "dist_sq": best})

    return pages.select(
        "url", "lat", "lon", nearest(F.col("lon"), F.col("lat")).alias("_nn")
    ).select("url", "lat", "lon", F.col("_nn.poly_id").alias("poly_id"), F.col("_nn.dist_sq").alias("dist_sq"))


def vertex_index_df(spark: SparkSession, polygons: list[dict[str, Any]], res: int = KNN_RES) -> DataFrame:
    """Polygon vertices indexed by grid cell (the small broadcast side)."""
    pids, vx, vy = _vertex_arrays(polygons)
    cells = cellgrid.encode_np(vx, vy, res)
    pdf = pd.DataFrame({"vcell": cells, "poly_id": pids.astype("int32"), "vlon": vx, "vlat": vy})
    # Explicit schema: without it the inferred dtype of poly_id depends on
    # spark.sql.execution.arrow.pyspark.enabled (arrow keeps int32, the
    # non-arrow fallback widens to bigint), and _topk_distinct_pid's fold
    # zero literal hard-codes poly_id:int — a vanilla default session would
    # raise DATATYPE_MISMATCH.ARRAY_FUNCTION_DIFF_TYPES (round-5 driver red).
    return spark.createDataFrame(pdf, "vcell bigint, poly_id int, vlon double, vlat double")


def vertex_index_from_table(polygons_df: DataFrame, res: int = KNN_RES) -> DataFrame:
    """Distributed vertex index from a polygons TABLE: explode the ring
    column (closing duplicate dropped), encode cells with the codegen cell
    expression — no UDF, no driver materialization, so the polygon side can
    be millions of rows (the same scale fix spatial_join_distributed made
    for the cover)."""
    pts = polygons_df.select(
        F.col("poly_id").cast("int").alias("poly_id"),
        F.explode(F.slice(F.col("ring"), F.lit(1), F.size(F.col("ring")) - 1)).alias("pt"),
    ).select(
        "poly_id",
        F.col("pt")[0].alias("vlon"),
        F.col("pt")[1].alias("vlat"),
    )
    return pts.select(
        cellgrid.cell_id_col(F.col("vlon"), F.col("vlat"), res).alias("vcell"),
        "poly_id",
        "vlon",
        "vlat",
    )


def knn_bruteforce_distributed(pages: DataFrame, vindex: DataFrame) -> DataFrame:
    """Exact nearest-vertex scan with the vertex side as a TABLE: broadcast
    the (small) page tail against every vertex partition, then one min-by
    aggregation. Used as the ring-expansion fallback when polygons are a
    DataFrame; O(tail x vertices) work data-parallel over the vertex set."""
    tail = pages.select("url", "lat", "lon")
    d2 = (F.col("lon") - F.col("vlon")) * (F.col("lon") - F.col("vlon")) + (
        F.col("lat") - F.col("vlat")
    ) * (F.col("lat") - F.col("vlat"))
    return (
        vindex.crossJoin(F.broadcast(tail))
        .select("url", "lat", "lon", "poly_id", d2.alias("d2"))
        .groupBy("url")
        .agg(
            F.first("lat").alias("lat"),
            F.first("lon").alias("lon"),
            F.min(F.struct(F.col("d2"), F.col("poly_id"))).alias("_b"),
        )
        .select(
            "url",
            "lat",
            "lon",
            F.col("_b.poly_id").alias("poly_id"),
            F.col("_b.d2").alias("dist_sq"),
        )
    )


# fast-path gates: below these, the exact vectorized scan beats the
# expansion loop's 2+ driver barriers. The page-count probe uses
# limit(N+1).count() — a CollectLimit that early-exits after N+1 rows, so
# the gate costs O(threshold) regardless of table size (a full count()
# here would add a whole-table job at 100 TB).
SMALL_INPUT_ROWS = 100_000
SMALL_INDEX_VERTICES = 10_000


def knn_ring_expansion(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> DataFrame:
    """(url, poly_id, dist_sq) via iterative cell-ring expansion.

    Round r joins still-unfinalized pages against the vertex index over the
    Chebyshev ring WINDOW [lo_r, hi_r] (the index side explodes across the
    window's offsets — the page side stays one row per page with a plain
    equi-join). Pages finalize once the guarantee (hi_r * size)^2 >= best
    dist_sq holds (an unseen vertex in ring > hi_r is at least hi_r * size
    away). Pages with nothing inside the last window fall back to the exact
    vectorized scan.

    Window schedule: every driver round is a full barrier (join + agg +
    checkpoint), so fewer/wider windows win whenever the expanded index
    stays joinable — the default ((0,1),(2,15)) measured ~1.5x faster than
    four geometric windows at bench scale with identical output. For very
    dense vertex sets, more geometric windows bound per-round candidate
    fan-out; past BROADCAST_INDEX_MAX_ROWS the wide round shuffle-joins
    instead of broadcasting either way.
    """
    spark = pages.sparkSession
    n_vertices = sum(len(p["ring"]) - 1 for p in polygons)

    # tiny-input fast path: same rows (knn_bruteforce shares the tie-break
    # contract and is gate-verified against the same oracle), no loop
    # barriers. Set small_input_rows=0 to force the expansion path.
    if small_input_rows and n_vertices <= SMALL_INDEX_VERTICES:
        probe = pages.select("url").limit(small_input_rows + 1).count()
        if probe <= small_input_rows:
            return knn_bruteforce(pages.select("url", "lat", "lon"), polygons).select(*OUT_COLS)

    vindex = vertex_index_df(spark, polygons, res)

    def fallback(tail: DataFrame) -> DataFrame:
        return knn_bruteforce(tail.select("url", "lat", "lon"), polygons).select(*OUT_COLS)

    return _expansion_loop(pages, vindex, n_vertices, res, windows, fallback)


def knn_ring_expansion_table(
    pages: DataFrame,
    polygons_df: DataFrame,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """Ring-expansion kNN with the polygon side as a TABLE end to end: the
    vertex index is built by a distributed explode + codegen cell encode
    (vertex_index_from_table) and the exact-fallback tail scans the vertex
    TABLE (knn_bruteforce_distributed) — nothing polygon-shaped touches the
    driver, so the polygon side scales to millions of rows. Same rows as
    `knn_ring_expansion` (tie-break and guarantee logic shared)."""
    # coalesce before checkpointing: the vertex index inherits the polygons
    # table's partitioning, which can be far wider than the index warrants
    # (a 64-part polygons scan would otherwise spawn 64 near-empty tasks in
    # EVERY expansion round); capping at defaultParallelism keeps rounds at
    # cluster width without a shuffle
    vindex = (
        vertex_index_from_table(polygons_df, res)
        .coalesce(pages.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n_vertices = vindex.count()  # tiny job on the (small) vertex table

    # same tiny-input fast path as the driver-list variant
    if n_vertices <= SMALL_INDEX_VERTICES:
        probe = pages.select("url").limit(SMALL_INPUT_ROWS + 1).count()
        if probe <= SMALL_INPUT_ROWS:
            return knn_bruteforce_distributed(pages, vindex).select(*OUT_COLS)

    def fallback(tail: DataFrame) -> DataFrame:
        return knn_bruteforce_distributed(tail, vindex).select(*OUT_COLS)

    return _expansion_loop(pages, vindex, n_vertices, res, windows, fallback)


def _expansion_loop(
    pages: DataFrame,
    vindex: DataFrame,
    n_vertices: int,
    res: int,
    windows: tuple[tuple[int, int], ...],
    fallback,
    payload_cols: tuple[str, ...] = ("vlon", "vlat"),
    d2_expr: Column | None = None,
    bound_margin: float = 0.0,
) -> DataFrame:
    """Shared ring-expansion driver loop (see knn_ring_expansion docstring):
    vindex is (vcell, poly_id, *payload_cols) from either the driver-list
    or the distributed table builder; `fallback(tail)` performs the exact
    scan for pages unresolved past the last window.

    `d2_expr` computes the candidate distance from (lon, lat, payload) —
    default is squared distance to the (vlon, vlat) index point itself.
    `bound_margin` (in cell units) relaxes the finalization guarantee for
    indexes whose rows SAMPLE an extended object: with segment samples at
    Euclidean spacing <= cell_size, an unseen segment (no sample inside
    Chebyshev ring hi) can still pass within (hi - 1/2) * cell_size of the
    page — every segment point is within spacing/2 of some sample — so the
    guarantee becomes dist_sq <= ((hi - margin) * size)^2 with margin 0.5."""
    spark = pages.sparkSession
    size = cellgrid.cell_size_deg(res)
    if d2_expr is None:
        d2_expr = (F.col("lon") - F.col("vlon")) * (F.col("lon") - F.col("vlon")) + (
            F.col("lat") - F.col("vlat")
        ) * (F.col("lat") - F.col("vlat"))

    pending = (
        pages.select("url", "lat", "lon")
        .withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
        .withColumn("poly_id", F.lit(None).cast("int"))
        .withColumn("dist_sq", F.lit(None).cast("double"))
    )
    finalized: list[DataFrame] = []

    for lo, hi in windows:
        # Expand the SMALL side: every vertex is registered under each cell
        # in the window's Chebyshev annulus, so the page side stays one row
        # per page with a plain equi-join (no fact-side explode). Window
        # (8,15) x ~1k vertices is still well under broadcast thresholds;
        # beyond broadcast scale this becomes a shuffle join on cell.
        offsets = [
            (dx, dy)
            for dx in range(-hi, hi + 1)
            for dy in range(-hi, hi + 1)
            if lo <= max(abs(dx), abs(dy)) <= hi
        ]
        off_df = literal_table(
            spark, [(dy * cellgrid._SHIFT + dx,) for dx, dy in offsets], "off bigint"
        )
        vwin = vindex.crossJoin(off_df).select(
            (F.col("vcell") + F.col("off")).alias("cell"), "poly_id", *payload_cols
        )
        # expanded index = vertices x |window annulus|; broadcast only while
        # that stays genuinely small, else shuffle-join on the cell key
        if n_vertices * len(offsets) <= BROADCAST_INDEX_MAX_ROWS:
            vwin = F.broadcast(vwin)
        cand = (
            pending.select("url", "lat", "lon", "cell")
            .join(vwin, "cell")
            .withColumn("d2", d2_expr)
            .groupBy("url")
            .agg(F.min(F.struct(F.col("d2"), F.col("poly_id"))).alias("_b"))
            .select("url", F.col("_b.poly_id").alias("c_pid"), F.col("_b.d2").alias("c_d2"))
        )
        cand_better = F.col("c_d2").isNotNull() & (
            F.col("dist_sq").isNull()
            | (F.col("c_d2") < F.col("dist_sq"))
            | ((F.col("c_d2") == F.col("dist_sq")) & (F.col("c_pid") < F.col("poly_id")))
        )
        merged = pending.join(cand, "url", "left").select(
            "url",
            "lat",
            "lon",
            "cell",
            F.when(cand_better, F.col("c_pid")).otherwise(F.col("poly_id")).alias("poly_id"),
            F.when(cand_better, F.col("c_d2")).otherwise(F.col("dist_sq")).alias("dist_sq"),
        )
        # finalize once nothing in an unseen ring (>= hi+1) can be closer:
        # any indexed point there is at least hi*size away in Chebyshev
        # terms (minus the sampling margin for extended objects).
        bound = float(((hi - bound_margin) * size) * ((hi - bound_margin) * size))
        guarantee = F.col("dist_sq").isNotNull() & (F.col("dist_sq") <= F.lit(bound))
        # normalize to the output schema here: the loop frames carry a
        # `cell` column that the brute-force fallback frame does not.
        finalized.append(merged.where(guarantee).select(*OUT_COLS))
        pending = merged.where(~guarantee | F.col("dist_sq").isNull()).localCheckpoint()
        if pending.isEmpty():
            pending = None
            break

    if pending is not None and not pending.isEmpty():
        # pages with nothing within max_rounds rings: exact fallback scan
        finalized.append(fallback(pending))

    out = finalized[0]
    for df in finalized[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# edge-exact kNN: point-to-SEGMENT distance (r3 VERDICT item 2)
# ---------------------------------------------------------------------------
#
# Shared formulation — the EXACT same op order in the Spark expression, the
# NumPy kernels and the SQL oracle, so every intermediate is a single-rounded
# IEEE double and results hash-compare bit-for-bit:
#   dx = bx - ax; dy = by - ay; px = lon - ax; py = lat - ay
#   dot = px * dx + py * dy;    len2 = dx * dx + dy * dy
#   t = 0 if dot <= 0 else (1 if dot >= len2 else dot / len2)
#   ex = px - t * dx; ey = py - t * dy;  d2 = ex * ex + ey * ey
# A degenerate segment (a == b) has len2 = 0 and dot = 0, so t = 0 and d2
# falls back to the vertex distance — no division ever sees a zero.


def seg_d2_expr() -> Column:
    """Squared point-to-segment distance as a codegen expression over
    columns (lon, lat, ax, ay, bx, by)."""
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    px = F.col("lon") - F.col("ax")
    py = F.col("lat") - F.col("ay")
    dot = px * dx + py * dy
    len2 = dx * dx + dy * dy
    t = (
        F.when(dot <= F.lit(0.0), F.lit(0.0))
        .when(dot >= len2, F.lit(1.0))
        .otherwise(dot / len2)
    )
    ex = px - t * dx
    ey = py - t * dy
    return ex * ex + ey * ey


def _segment_arrays(polygons: list[dict[str, Any]]):
    """(pid, ax, ay, bx, by) NumPy arrays for every ring segment, sorted by
    poly_id (stable) so chunked argmin tie-breaks to the smallest pid."""
    pids, ax, ay, bx, by = [], [], [], [], []
    for poly in polygons:
        ring = np.asarray(poly["ring"], dtype=np.float64)
        pids.append(np.full(len(ring) - 1, int(poly["poly_id"]), dtype=np.int64))
        ax.append(ring[:-1, 0])
        ay.append(ring[:-1, 1])
        bx.append(ring[1:, 0])
        by.append(ring[1:, 1])
    pids = np.concatenate(pids)
    order = np.lexsort((pids,))
    return (
        pids[order],
        np.concatenate(ax)[order],
        np.concatenate(ay)[order],
        np.concatenate(bx)[order],
        np.concatenate(by)[order],
    )


def _seg_d2_np(lon, lat, ax, ay, bx, by):
    """NumPy twin of seg_d2_expr — identical op order, elementwise IEEE."""
    dx = bx - ax
    dy = by - ay
    px = lon - ax
    py = lat - ay
    dot = px * dx + py * dy
    len2 = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(dot <= 0.0, 0.0, np.where(dot >= len2, 1.0, dot / len2))
    ex = px - t * dx
    ey = py - t * dy
    return ex * ex + ey * ey


def knn_edge_bruteforce(pages: DataFrame, polygons: list[dict[str, Any]]) -> DataFrame:
    """(url, nearest poly_id, dist_sq) by exact scan over all SEGMENTS —
    vectorized per Arrow batch; ties break to the smaller poly_id."""
    pids, ax, ay, bx, by = _segment_arrays(polygons)

    result_type = T.StructType(
        [
            T.StructField("poly_id", T.IntegerType()),
            T.StructField("dist_sq", T.DoubleType()),
        ]
    )

    @F.pandas_udf(result_type)
    def nearest(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lon_np = lon.to_numpy(dtype=np.float64)[:, None]
        lat_np = lat.to_numpy(dtype=np.float64)[:, None]
        n = len(lon_np)
        best = np.full(n, np.inf)
        best_pid = np.full(n, -1, dtype=np.int64)
        for s in range(0, len(ax), BRUTEFORCE_CHUNK):
            d2 = _seg_d2_np(
                lon_np,
                lat_np,
                ax[None, s : s + BRUTEFORCE_CHUNK],
                ay[None, s : s + BRUTEFORCE_CHUNK],
                bx[None, s : s + BRUTEFORCE_CHUNK],
                by[None, s : s + BRUTEFORCE_CHUNK],
            )
            idx = d2.argmin(axis=1)
            dmin = d2[np.arange(n), idx]
            take = dmin < best
            best[take] = dmin[take]
            best_pid[take] = pids[s : s + BRUTEFORCE_CHUNK][idx[take]]
        return pd.DataFrame({"poly_id": best_pid.astype("int32"), "dist_sq": best})

    return pages.select(
        "url", "lat", "lon", nearest(F.col("lon"), F.col("lat")).alias("_nn")
    ).select(
        "url",
        "lat",
        "lon",
        F.col("_nn.poly_id").alias("poly_id"),
        F.col("_nn.dist_sq").alias("dist_sq"),
    )


def segment_index_df(
    spark: SparkSession, polygons: list[dict[str, Any]], res: int = KNN_RES
) -> DataFrame:
    """Segments indexed by the cells of sample points at Euclidean spacing
    <= cell_size (the broadcast side). Sampling only drives candidate
    generation — the reported distance is always the exact segment
    distance — so the ceil() here needs no cross-engine determinism."""
    import math

    size = cellgrid.cell_size_deg(res)
    pids, ax, ay, bx, by = _segment_arrays(polygons)
    rows_cell, rows = [], []
    for i in range(len(pids)):
        seg_len = math.hypot(bx[i] - ax[i], by[i] - ay[i])
        n_samples = max(1, int(math.ceil(seg_len / size)))
        seen = set()
        for j in range(n_samples + 1):
            t = j / n_samples
            cell = int(
                cellgrid.encode_np(
                    np.array([ax[i] + t * (bx[i] - ax[i])]),
                    np.array([ay[i] + t * (by[i] - ay[i])]),
                    res,
                )[0]
            )
            if cell not in seen:
                seen.add(cell)
                rows.append((cell, int(pids[i]), float(ax[i]), float(ay[i]), float(bx[i]), float(by[i])))
    pdf = pd.DataFrame(rows, columns=["vcell", "poly_id", "ax", "ay", "bx", "by"])
    pdf["poly_id"] = pdf["poly_id"].astype("int32")
    # Explicit schema for the same arrow-off dtype-widening reason as
    # vertex_index_df: poly_id must stay int to match _BEST_T's fold zero.
    return spark.createDataFrame(
        pdf, "vcell bigint, poly_id int, ax double, ay double, bx double, by double"
    )


def segment_index_from_table(polygons_df: DataFrame, res: int = KNN_RES) -> DataFrame:
    """Distributed segment index from a polygons TABLE: consecutive ring
    points zipped into segments, sample offsets exploded with sequence(),
    cells via the codegen cell expression — no UDF, no driver
    materialization (the same scale shape as vertex_index_from_table)."""
    ring = F.col("ring")
    segs = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda a, b: F.struct(
            a[0].alias("ax"), a[1].alias("ay"), b[0].alias("bx"), b[1].alias("by")
        ),
    )
    size = cellgrid.cell_size_deg(res)
    seg_df = polygons_df.select(
        F.col("poly_id").cast("int").alias("poly_id"), F.explode(segs).alias("s")
    ).select("poly_id", "s.ax", "s.ay", "s.bx", "s.by")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    n_samples = F.greatest(
        F.lit(1), F.ceil(F.sqrt(dx * dx + dy * dy) / F.lit(size)).cast("int")
    )
    sampled = seg_df.select(
        "poly_id",
        "ax",
        "ay",
        "bx",
        "by",
        F.explode(F.sequence(F.lit(0), n_samples)).alias("j"),
        n_samples.alias("n"),
    )
    t = F.col("j").cast("double") / F.col("n").cast("double")
    sx = F.col("ax") + t * (F.col("bx") - F.col("ax"))
    sy = F.col("ay") + t * (F.col("by") - F.col("ay"))
    return sampled.select(
        cellgrid.cell_id_col(sx, sy, res).alias("vcell"),
        "poly_id",
        "ax",
        "ay",
        "bx",
        "by",
    ).dropDuplicates(["vcell", "poly_id", "ax", "ay", "bx", "by"])


def knn_edge_bruteforce_distributed(pages: DataFrame, segs: DataFrame) -> DataFrame:
    """Exact nearest-segment scan with the segment side as a TABLE:
    broadcast the (small) page tail against every segment partition, then
    one min-by aggregation — the edge twin of knn_bruteforce_distributed."""
    tail = pages.select("url", "lat", "lon")
    return (
        segs.crossJoin(F.broadcast(tail))
        .select("url", "lat", "lon", "poly_id", seg_d2_expr().alias("d2"))
        .groupBy("url")
        .agg(
            F.first("lat").alias("lat"),
            F.first("lon").alias("lon"),
            F.min(F.struct(F.col("d2"), F.col("poly_id"))).alias("_b"),
        )
        .select(
            "url",
            "lat",
            "lon",
            F.col("_b.poly_id").alias("poly_id"),
            F.col("_b.d2").alias("dist_sq"),
        )
    )


_SEG_PAYLOAD = ("ax", "ay", "bx", "by")


def knn_edge_ring_expansion(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> DataFrame:
    """(url, poly_id, dist_sq) with EXACT point-to-segment distance via the
    shared ring-expansion loop over a sampled segment index (see module
    docstring; bound_margin=0.5 accounts for the <= cell_size sampling)."""
    spark = pages.sparkSession
    n_segments = sum(len(p["ring"]) - 1 for p in polygons)

    if small_input_rows and n_segments <= SMALL_INDEX_VERTICES:
        probe = pages.select("url").limit(small_input_rows + 1).count()
        if probe <= small_input_rows:
            return knn_edge_bruteforce(pages.select("url", "lat", "lon"), polygons).select(*OUT_COLS)

    sindex = segment_index_df(spark, polygons, res)
    n_index = sindex.count()

    def fallback(tail: DataFrame) -> DataFrame:
        return knn_edge_bruteforce(tail.select("url", "lat", "lon"), polygons).select(*OUT_COLS)

    return _expansion_loop(
        pages,
        sindex,
        n_index,
        res,
        windows,
        fallback,
        payload_cols=_SEG_PAYLOAD,
        d2_expr=seg_d2_expr(),
        bound_margin=0.5,
    )


def knn_edge_ring_expansion_table(
    pages: DataFrame,
    polygons_df: DataFrame,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """Edge-exact kNN with the polygon side as a TABLE end to end: segment
    index built by distributed zip/explode + codegen cell encode, tail scan
    over the segment TABLE — nothing polygon-shaped on the driver. Same
    rows as knn_edge_ring_expansion (distance + tie-break contract shared)."""
    sindex = (
        segment_index_from_table(polygons_df, res)
        .coalesce(pages.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n_index = sindex.count()

    if n_index <= SMALL_INDEX_VERTICES:
        probe = pages.select("url").limit(SMALL_INPUT_ROWS + 1).count()
        if probe <= SMALL_INPUT_ROWS:
            return knn_edge_bruteforce_distributed(pages, sindex).select(*OUT_COLS)

    def fallback(tail: DataFrame) -> DataFrame:
        return knn_edge_bruteforce_distributed(tail, sindex).select(*OUT_COLS)

    return _expansion_loop(
        pages,
        sindex,
        n_index,
        res,
        windows,
        fallback,
        payload_cols=_SEG_PAYLOAD,
        d2_expr=seg_d2_expr(),
        bound_margin=0.5,
    )


# ---------------------------------------------------------------------------
# point-point kNN: the k nearest OTHER pages for each sampled query page
# ---------------------------------------------------------------------------

KNN_POINTS_RES = 6  # ~5.6 deg cells — sized for geotag density, tunable


def knn_points(
    pages: DataFrame,
    k: int = 8,
    query_mod: int = 7,
    res: int = KNN_POINTS_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """(url, rnk, neighbor, dist_sq): the k nearest OTHER pages for each
    deterministically md5-sampled query page, planar squared-degree
    distance, ties broken by neighbor url. The similarity-search shape the
    polygon kNN family lacks: a point-point self kNN join.

    Scale shape — the INDEX side is the whole corpus, so unlike the
    polygon kNN the Chebyshev annulus is exploded on the QUERY side
    (sampled, small): queries x |annulus| equi-join the corpus on its cell
    key, broadcast while that stays small and a plain shuffle join past
    BROADCAST_INDEX_MAX_ROWS. Per-round state is one top-k struct array
    per query (slice(array_sort(concat))) — window annuli are disjoint so
    a neighbor is scored exactly once. A query finalizes once it holds k
    candidates with kth distance STRICTLY under (hi * cell_size)^2 — any
    unseen point sits in a cell with Chebyshev distance > hi, hence at
    Euclidean distance >= hi * cell_size, and the strict inequality keeps
    an exactly-on-the-bound unseen point from stealing the kth slot via
    the url tie-break. Queries unresolved past the last window fall back
    to an exact scan (they are few: empty neighborhoods).

    The planar-degree metric is the operator's contract (no wraparound:
    longitudes 179.9 and -179.9 are far apart BY DEFINITION here, in both
    engines), which is also why cell-id arithmetic at grid edges is safe:
    aliased off-grid ids either match nothing or contribute far candidates
    that lose the top-k."""
    spark = pages.sparkSession
    size = cellgrid.cell_size_deg(res)
    best_t = "array<struct<d2:double,nid:string>>"
    points = (
        pages.select(
            F.col("url").alias("nid"), F.col("lon").alias("plon"), F.col("lat").alias("plat")
        )
        .withColumn("pcell", cellgrid.cell_id_col(F.col("plon"), F.col("plat"), res))
        .localCheckpoint()  # one consumer per round + fallback (fan-out audit)
    )
    qhash = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("bigint")
    pending = (
        pages.where(qhash % F.lit(query_mod) == 0)
        .select("url", "lat", "lon")
        .withColumn("qcell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
        .withColumn("best", F.expr(f"CAST(array() AS {best_t})"))
        .localCheckpoint()
    )
    d2 = (F.col("plon") - F.col("lon")) * (F.col("plon") - F.col("lon")) + (
        F.col("plat") - F.col("lat")
    ) * (F.col("plat") - F.col("lat"))
    finalized: list[DataFrame] = []

    def explode_best(df: DataFrame) -> DataFrame:
        return df.select("url", F.posexplode("best")).select(
            "url",
            (F.col("pos") + 1).cast("int").alias("rnk"),
            F.col("col.nid").alias("neighbor"),
            F.col("col.d2").alias("dist_sq"),
        )

    for lo, hi in windows:
        n_pending = pending.count()
        offsets = [
            (dx, dy)
            for dx in range(-hi, hi + 1)
            for dy in range(-hi, hi + 1)
            if lo <= max(abs(dx), abs(dy)) <= hi
        ]
        off_df = literal_table(
            spark, [(dy * cellgrid._SHIFT + dx,) for dx, dy in offsets], "off bigint"
        )
        qx = (
            pending.select("url", "lat", "lon", "qcell")
            .crossJoin(off_df)
            .select("url", "lat", "lon", (F.col("qcell") + F.col("off")).alias("pcell"))
        )
        if n_pending * len(offsets) <= BROADCAST_INDEX_MAX_ROWS:
            qx = F.broadcast(qx)
        cand = (
            points.join(qx, "pcell")
            .where(F.col("nid") != F.col("url"))
            .withColumn("d2", d2)
            .groupBy("url")
            .agg(
                F.slice(
                    F.array_sort(F.collect_list(F.struct(F.col("d2"), F.col("nid")))), 1, k
                ).alias("cbest")
            )
        )
        merged = pending.join(cand, "url", "left").select(
            "url",
            "lat",
            "lon",
            "qcell",
            F.slice(
                F.array_sort(
                    F.concat(F.col("best"), F.coalesce(F.col("cbest"), F.expr(f"CAST(array() AS {best_t})")))
                ),
                1,
                k,
            ).alias("best"),
        )
        bound = float((hi * size) * (hi * size))
        guarantee = (F.size("best") >= k) & (F.element_at("best", k)["d2"] < F.lit(bound))
        finalized.append(explode_best(merged.where(guarantee)))
        pending = merged.where(~guarantee).localCheckpoint()
        if pending.isEmpty():
            pending = None
            break

    if pending is not None and not pending.isEmpty():
        # exact scan for the stragglers: all points, same top-k contract
        tail = (
            points.crossJoin(F.broadcast(pending.select("url", "lat", "lon")))
            .where(F.col("nid") != F.col("url"))
            .withColumn("d2", d2)
            .groupBy("url")
            .agg(
                F.slice(
                    F.array_sort(F.collect_list(F.struct(F.col("d2"), F.col("nid")))), 1, k
                ).alias("best")
            )
        )
        finalized.append(explode_best(tail))

    out = finalized[0]
    for df in finalized[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# k > 1 polygon kNN (r4 VERDICT item 3): k nearest DISTINCT airspaces
# ---------------------------------------------------------------------------

KNN_K_OUT_COLS = ("url", "rnk", "poly_id", "dist_sq")
_BEST_T = "array<struct<d2:double,poly_id:int>>"


def _explode_best_k(df: DataFrame) -> DataFrame:
    return df.select("url", F.posexplode("best")).select(
        "url",
        (F.col("pos") + 1).cast("int").alias("rnk"),
        F.col("col.poly_id").alias("poly_id"),
        F.col("col.d2").alias("dist_sq"),
    )


def _topk_distinct_pid(best_col: str, cand_col: str, k: int):
    """Merge two (d2, poly_id) struct arrays into the k smallest entries
    with DISTINCT poly_ids, keyed by (d2, poly_id) ascending. The dedup is
    an aggregate() fold over the sorted concat — the fold state `acc` is
    lambda-local, so nothing outer re-evaluates per element (the HOF
    re-inline trap), and the fold caps acc at k so work per row is O(k^2)
    on arrays of at most 2k entries."""
    return F.expr(
        f"aggregate(array_sort(concat({best_col}, coalesce({cand_col}, "
        f"cast(array() as {_BEST_T})))), cast(array() as {_BEST_T}), "
        f"(acc, x) -> CASE WHEN size(acc) >= {k} "
        f"OR exists(acc, y -> y.poly_id = x.poly_id) "
        f"THEN acc ELSE array_append(acc, x) END)"
    )


def _bruteforce_k(tail: DataFrame, vindex: DataFrame, d2_expr: Column, k: int) -> DataFrame:
    """Exact k-nearest-polygon scan for the expansion stragglers: broadcast
    the (small) tail against every index partition, reduce to the per
    (url, poly_id) MIN first — a polygon's many index rows must never
    occupy more than one top-k slot — then one per-url top-k."""
    t = tail.select("url", "lat", "lon")
    return (
        vindex.crossJoin(F.broadcast(t))
        .withColumn("d2", d2_expr)
        .groupBy("url", "poly_id")
        .agg(F.min("d2").alias("d2"))
        .groupBy("url")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct(F.col("d2"), F.col("poly_id")))), 1, k
            ).alias("best")
        )
    )


def _expansion_loop_k(
    pages: DataFrame,
    vindex: DataFrame,
    n_index: int,
    res: int,
    windows: tuple[tuple[int, int], ...],
    k: int,
    payload_cols: tuple[str, ...] = ("vlon", "vlat"),
    d2_expr: Column | None = None,
    bound_margin: float = 0.0,
) -> DataFrame:
    """Ring-expansion generalized from nearest-1 to the k nearest DISTINCT
    polygons per page (url, rnk, poly_id, dist_sq), rnk 1..k by (dist_sq,
    poly_id).

    The single-best guarantee generalizes to the K-TH best: a page
    finalizes once it holds k distinct polygons whose k-th distance is
    STRICTLY under ((hi - margin) * cell_size)^2 — any index point in an
    unseen ring (Chebyshev > hi) is at least (hi - margin) * size away
    (margin 0.5 for sampled-segment indexes, see _expansion_loop), so no
    unseen point can enter the top k OR improve any reported polygon's
    distance; strict < keeps an exactly-on-the-bound unseen polygon from
    stealing the k-th slot via the poly_id tie-break.

    Per round, candidates reduce to the per-(url, poly_id) MIN before the
    per-url top-k (a polygon's many vertices must fill one slot, not k),
    and the carried state merges by min-per-poly_id (a later ring can
    re-surface an already-held polygon; the sorted-fold dedup keeps the
    smaller key). Truncating each round's candidates to k is lossless: a
    dropped entry is (d2, pid)-dominated by k distinct kept polygons whose
    merged keys only ever improve.

    Scale shape matches _expansion_loop: the index side explodes across
    the window annulus (pages never explode), broadcast while small,
    shuffle-join past BROADCAST_INDEX_MAX_ROWS; per-page state is one
    <= k struct array; each round barriers on a localCheckpoint of the
    shrinking pending set."""
    spark = pages.sparkSession
    size = cellgrid.cell_size_deg(res)
    if d2_expr is None:
        d2_expr = (F.col("lon") - F.col("vlon")) * (F.col("lon") - F.col("vlon")) + (
            F.col("lat") - F.col("vlat")
        ) * (F.col("lat") - F.col("vlat"))

    pending = (
        pages.select("url", "lat", "lon")
        .withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
        .withColumn("best", F.expr(f"cast(array() as {_BEST_T})"))
    )
    finalized: list[DataFrame] = []

    for lo, hi in windows:
        offsets = [
            (dx, dy)
            for dx in range(-hi, hi + 1)
            for dy in range(-hi, hi + 1)
            if lo <= max(abs(dx), abs(dy)) <= hi
        ]
        off_df = literal_table(
            spark, [(dy * cellgrid._SHIFT + dx,) for dx, dy in offsets], "off bigint"
        )
        vwin = vindex.crossJoin(off_df).select(
            (F.col("vcell") + F.col("off")).alias("cell"), "poly_id", *payload_cols
        )
        if n_index * len(offsets) <= BROADCAST_INDEX_MAX_ROWS:
            vwin = F.broadcast(vwin)
        cand = (
            pending.select("url", "lat", "lon", "cell")
            .join(vwin, "cell")
            .withColumn("d2", d2_expr)
            .groupBy("url", "poly_id")
            .agg(F.min("d2").alias("d2"))
            .groupBy("url")
            .agg(
                F.slice(
                    F.array_sort(F.collect_list(F.struct(F.col("d2"), F.col("poly_id")))),
                    1,
                    k,
                ).alias("cbest")
            )
        )
        merged = pending.join(cand, "url", "left").select(
            "url",
            "lat",
            "lon",
            "cell",
            _topk_distinct_pid("best", "cbest", k).alias("best"),
        )
        bound = float(((hi - bound_margin) * size) * ((hi - bound_margin) * size))
        guarantee = (F.size("best") >= k) & (
            F.element_at("best", k)["d2"] < F.lit(bound)
        )
        finalized.append(_explode_best_k(merged.where(guarantee)))
        pending = merged.where(~guarantee).localCheckpoint()
        if pending.isEmpty():
            pending = None
            break

    if pending is not None and not pending.isEmpty():
        finalized.append(_explode_best_k(_bruteforce_k(pending, vindex, d2_expr, k)))

    out = finalized[0]
    for df in finalized[1:]:
        out = out.unionByName(df)
    return out


def knn_k(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    k: int = 3,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """k nearest airspaces per page by VERTEX distance (url, rnk, poly_id,
    dist_sq) — knn_ring_expansion generalized to k > 1."""
    spark = pages.sparkSession
    vindex = vertex_index_df(spark, polygons, res)
    n_vertices = sum(len(p["ring"]) - 1 for p in polygons)
    return _expansion_loop_k(pages, vindex, n_vertices, res, windows, k)


def knn_edge_k(
    pages: DataFrame,
    polygons: list[dict[str, Any]],
    k: int = 3,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """k nearest airspaces per page by EXACT point-to-segment distance —
    knn_edge_ring_expansion generalized to k > 1 (sampling drives
    candidates only; reported distances are the exact clamped projection;
    bound_margin 0.5 covers the <= cell_size sample spacing)."""
    spark = pages.sparkSession
    sindex = segment_index_df(spark, polygons, res)
    n_index = sindex.count()
    return _expansion_loop_k(
        pages,
        sindex,
        n_index,
        res,
        windows,
        k,
        payload_cols=_SEG_PAYLOAD,
        d2_expr=seg_d2_expr(),
        bound_margin=0.5,
    )


def knn_table_k(
    pages: DataFrame,
    polygons_df: DataFrame,
    k: int = 3,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """knn_k with the polygon side as a TABLE end to end (distributed
    vertex index, nothing polygon-shaped on the driver — the 100-TB
    shape). The index feeds every round plus the fallback, so it is
    checkpointed once (fan-out audit rule)."""
    vindex = (
        vertex_index_from_table(polygons_df, res)
        .coalesce(pages.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n_vertices = vindex.count()
    return _expansion_loop_k(pages, vindex, n_vertices, res, windows, k)


def knn_edge_table_k(
    pages: DataFrame,
    polygons_df: DataFrame,
    k: int = 3,
    res: int = KNN_RES,
    windows: tuple[tuple[int, int], ...] = ((0, 1), (2, 15)),
) -> DataFrame:
    """knn_edge_k with the polygon side as a TABLE end to end (distributed
    zip/explode segment index — nothing polygon-shaped on the driver).
    Checkpointed once: the index feeds every round plus the fallback."""
    sindex = (
        segment_index_from_table(polygons_df, res)
        .coalesce(pages.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n_index = sindex.count()
    return _expansion_loop_k(
        pages,
        sindex,
        n_index,
        res,
        windows,
        k,
        payload_cols=_SEG_PAYLOAD,
        d2_expr=seg_d2_expr(),
        bound_margin=0.5,
    )
