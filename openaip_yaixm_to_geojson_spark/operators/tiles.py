"""Raster <-> vector tile aggregation.

Engine-only operator (north rule): per-tile document counts and airspace
class rollups. A "tile" is a grid cell at a chosen resolution — the raster
side of the raster<->vector pairing; the airspace polygons are the vector
side. All aggregation is plain groupBy/rollup (map-side partial aggregation
+ one shuffle on the tile key, AQE-coalesced).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cellgrid

DEFAULT_TILE_RES = 8  # ~1.4 degree tiles


def with_tile(df: DataFrame, res: int = DEFAULT_TILE_RES, lon: str = "lon", lat: str = "lat") -> DataFrame:
    return df.withColumn("tile_id", cellgrid.cell_id_col(F.col(lon), F.col(lat), res))


def tile_doc_counts(pages: DataFrame, res: int = DEFAULT_TILE_RES) -> DataFrame:
    """Raster aggregation of the document point cloud: docs per tile plus
    language diversity."""
    return (
        with_tile(pages, res)
        .groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


def tile_class_rollup(join_out: DataFrame, res: int = DEFAULT_TILE_RES) -> DataFrame:
    """Rollup over (tile, airspace class): doc counts at tile x class,
    tile subtotal, and grand total (grouping-sets semantics identical in
    Spark and ANSI SQL ROLLUP)."""
    return (
        with_tile(join_out, res)
        .rollup("tile_id", "airspace_class")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.count_distinct("url").alias("n_docs"),
        )
    )


def parent_tile_col(tile: F.Column, levels: int = 1) -> F.Column:
    """Parent cell id `levels` resolutions up, by pure integer arithmetic on
    the packed (res, y, x) id — the hierarchical-grid analogue of
    h3_to_parent. _SHIFT is 2^29, so unpacking is exact shift/mask bigint
    ops (ids approach 2^63; float division would round)."""
    mask = F.lit(cellgrid._SHIFT - 1)
    shift = F.lit(cellgrid._SHIFT)
    x = tile.bitwiseAND(mask)
    y = F.shiftright(tile, 29).bitwiseAND(mask)
    res = F.shiftright(tile, 58)
    return ((res - levels) * shift + F.shiftright(y, levels)) * shift + F.shiftright(x, levels)


def tile_zoom_rollup(tiles: DataFrame, levels: int = 1) -> DataFrame:
    """Re-aggregate an EXISTING per-tile table to a coarser zoom without
    rescanning the fact table: children map to parents by id arithmetic
    (2^levels x 2^levels children per parent), then one small shuffle on
    the parent key. This is how zoom pyramids are built at 100 TB — the
    fact scan happens once at the finest res, every coarser level costs
    only a tiles-sized aggregation."""
    return (
        tiles.withColumn("tile_id", parent_tile_col(F.col("tile_id"), levels))
        .groupBy("tile_id")
        .agg(
            F.sum("doc_count").alias("doc_count"),
            F.sum("total_chars").alias("total_chars"),
        )
    )


def polygon_raster(spark: SparkSession, polygons: list[dict[str, Any]], res: int = DEFAULT_TILE_RES) -> DataFrame:
    """Vector -> raster: rasterize polygons onto the tile grid (one row per
    covering tile per polygon). The inverse direction (raster -> vector) is
    the spatial join assigning point tiles back to polygons."""
    rows = []
    for poly in polygons:
        for cell in cellgrid.cover(np.asarray(poly["ring"]), res):
            rows.append(
                {
                    "tile_id": cell,
                    "poly_id": int(poly["poly_id"]),
                    "airspace_class": poly["class"],
                }
            )
    return spark.createDataFrame(rows, "tile_id bigint, poly_id int, airspace_class string")


def polygon_raster_table(polygons_df: DataFrame, res: int = DEFAULT_TILE_RES) -> DataFrame:
    """polygon_raster with the polygon side as a TABLE: rasterization runs
    through the distributed polyfill (pandas-UDF cover + explode), so
    millions of polygons rasterize data-parallel with no driver loop."""
    from .spatial import polygon_cover_distributed

    return polygon_cover_distributed(polygons_df, res).select(
        F.col("cell").alias("tile_id"), "poly_id", "airspace_class"
    )
