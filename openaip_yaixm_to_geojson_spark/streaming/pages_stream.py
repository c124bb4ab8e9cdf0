"""Structured Streaming ingestion for the pages pipeline.

The reference is strictly batch (SURVEY.md §2: no streaming, no watermarks)
— resumability there comes from checkpointing. The engine adds a streaming
ingestion path as a first-class source: the spatial join is stateless
(cell encode + broadcast cover join + PIP refine), so the exact same
operators run on a readStream DataFrame; per-tile counts become a
watermarked windowed aggregation that tolerates late WARC timestamps.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cellgrid
from ..operators.spatial import DEFAULT_JOIN_RES, make_pip_udf, polygon_cover_df
from ..operators.tiles import DEFAULT_TILE_RES

PAGES_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of page batches (parquet drops into input_dir)."""
    return spark.readStream.schema(PAGES_STREAM_SCHEMA).parquet(input_dir)


def stream_spatial_join(
    pages_stream: DataFrame, polygons: list[dict[str, Any]], res: int = DEFAULT_JOIN_RES
) -> DataFrame:
    """Stateless streaming spatial join: identical operator composition to
    the batch path (cell equi-join against the broadcast cover + vectorized
    PIP refine)."""
    spark = pages_stream.sparkSession
    cover = polygon_cover_df(spark, polygons, res)
    cells = pages_stream.withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
    pip = make_pip_udf(spark, polygons)
    return (
        cells.join(F.broadcast(cover), "cell")
        .where(pip(F.col("lon"), F.col("lat"), F.col("poly_id")))
        .select("url", "warc_ts", "poly_id", "airspace_name", "airspace_class", "lat", "lon")
    )


def stream_tile_counts(
    joined: DataFrame,
    tile_res: int = DEFAULT_TILE_RES,
    watermark: str = "1 hour",
    window_size: str = "1 day",
) -> DataFrame:
    """Watermarked per-window, per-tile document counts (late WARC records
    beyond the watermark are dropped, on-time ones merge into their
    window's state)."""
    return (
        joined.withWatermark("warc_ts", watermark)
        .withColumn("tile_id", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), tile_res))
        .groupBy(F.window("warc_ts", window_size).alias("w"), F.col("tile_id"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .select(F.col("w.start").alias("window_start"), "tile_id", "doc_count")
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"):
    """Drain everything currently available and stop (deterministic test /
    backfill trigger); the checkpoint makes re-runs incremental."""
    query = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
