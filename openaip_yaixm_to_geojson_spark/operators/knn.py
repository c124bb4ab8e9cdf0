"""kNN: nearest airspace per page via cell-ring expansion.

Engine-only operator (no reference counterpart; mandated by the north
rule). Distance metric: squared planar degree distance from the page point
to the nearest polygon RING VERTEX — plain arithmetic so the DuckDB oracle
reproduces it bit-for-bit (trig-free; the densified rings make vertex
distance a tight proxy for boundary distance).

Two implementations:

* `knn_ring_expansion` — the scale path. Polygon vertices are indexed by
  grid cell; each round k joins still-unmatched pages against the vertex
  index expanded to Chebyshev disk k. A match at ring k only proves an
  upper bound d; the loop keeps expanding until (k-1) * cell_size >
  sqrt(d) for every pending page (a cell at ring k cannot hold anything
  closer than (k-1) * cell_size), then takes min_by. Each round is one
  broadcast join + one aggregation on the shrinking unmatched set.

* `knn_bruteforce` — vectorized NumPy baseline (points x vertices per
  Arrow batch). Used as the oracle cross-check and for tiny polygon sets.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cellgrid

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
    return spark.createDataFrame(pdf)


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
) -> DataFrame:
    """Shared ring-expansion driver loop (see knn_ring_expansion docstring):
    vindex is (vcell, poly_id, vlon, vlat) from either the driver-list or
    the distributed table builder; `fallback(tail)` performs the exact scan
    for pages unresolved past the last window."""
    spark = pages.sparkSession
    size = cellgrid.cell_size_deg(res)

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
        off_df = spark.createDataFrame(
            [(dy * cellgrid._SHIFT + dx,) for dx, dy in offsets], "off bigint"
        )
        vwin = vindex.crossJoin(off_df).select(
            (F.col("vcell") + F.col("off")).alias("cell"), "poly_id", "vlon", "vlat"
        )
        # expanded index = vertices x |window annulus|; broadcast only while
        # that stays genuinely small, else shuffle-join on the cell key
        if n_vertices * len(offsets) <= BROADCAST_INDEX_MAX_ROWS:
            vwin = F.broadcast(vwin)
        cand = (
            pending.select("url", "lat", "lon", "cell")
            .join(vwin, "cell")
            .withColumn(
                "d2",
                (F.col("lon") - F.col("vlon")) * (F.col("lon") - F.col("vlon"))
                + (F.col("lat") - F.col("vlat")) * (F.col("lat") - F.col("vlat")),
            )
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
        # any point there is at least hi*size away in Chebyshev terms.
        bound = float((hi * size) * (hi * size))
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
