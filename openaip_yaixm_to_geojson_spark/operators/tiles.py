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
