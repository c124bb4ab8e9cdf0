"""Bucketed, co-located spatial joins (both-sides-huge regime).

The broadcast cover join handles the common case (polygon side fits in
memory). When BOTH sides are huge — 10^12 pages against millions of
polygons whose cover no longer broadcasts — pre-bucketing both tables on
the cell key lets Spark sort-merge join them with ZERO exchanges: each
bucket pair joins locally. This module writes/reads bucketed tables via
the session catalog and exposes the co-located join; the test suite
asserts the join plan contains no Exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cellgrid
from ..operators.spatial import (
    DEFAULT_JOIN_RES,
    make_pip_udf,
    polygon_cover_distributed,
    polygons_to_df,
)


def write_bucketed(df: DataFrame, table: str, bucket_col: str = "cell", n_buckets: int = 16) -> None:
    """Persist a table bucketed+sorted on the join key (Iceberg-style
    layout substitute: catalog-managed parquet with bucket metadata).

    Drops any previous incarnation first: with the default in-memory
    catalog a table directory can survive from an earlier session without
    a catalog entry, and saveAsTable refuses such orphan locations. The
    location to clear is the catalog's reported one when the table is
    registered; only for true orphans (directory with no catalog entry) is
    it derived from the warehouse dir, with the uri scheme stripped via
    urlparse (never str.replace, which would mangle 'file:' mid-path), and
    only file-scheme locations are ever rmtree'd."""
    import shutil
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession

    def _local_path(uri: str) -> str | None:
        parsed = urlparse(uri)
        if parsed.scheme in ("", "file"):
            return unquote(parsed.path) or uri
        return None

    location = None
    if spark.catalog.tableExists(table):
        rows = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .where(F.col("col_name") == "Location")
            .collect()
        )
        if rows:
            location = _local_path(rows[0]["data_type"])
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh_path = _local_path(warehouse)
        if wh_path is not None:
            location = os.path.join(wh_path, table.lower())
    if location is not None and os.path.exists(location):
        shutil.rmtree(location, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_pages(spark: SparkSession, pages: DataFrame, table: str = "pages_bucketed",
                   res: int = DEFAULT_JOIN_RES, n_buckets: int = 16) -> DataFrame:
    cells = pages.withColumn("cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res))
    write_bucketed(cells, table, "cell", n_buckets)
    return spark.table(table)


def bucketed_cover(spark: SparkSession, polygons, table: str = "cover_bucketed",
                   res: int = DEFAULT_JOIN_RES, n_buckets: int = 16) -> DataFrame:
    """Cover table built through the DISTRIBUTED polyfill (pandas-UDF cover
    + explode), so the polygon side never loops on the driver; `polygons`
    may be a fixture-style list (converted to a table) or a polygons
    DataFrame already."""
    polys_df = polygons if isinstance(polygons, DataFrame) else polygons_to_df(spark, polygons)
    cover = polygon_cover_distributed(polys_df, res)
    write_bucketed(cover, table, "cell", n_buckets)
    return spark.table(table)


def colocated_spatial_join(spark: SparkSession, pages_table: str, cover_table: str, polygons) -> DataFrame:
    """Shuffle-free spatial join over two tables bucketed on `cell`:
    sort-merge join uses the bucket layout directly (no Exchange), then the
    usual vectorized PIP refine."""
    pages = spark.table(pages_table)
    cover = spark.table(cover_table)
    candidates = pages.join(cover.hint("merge"), "cell")
    pip = make_pip_udf(spark, polygons)
    return candidates.where(pip(F.col("lon"), F.col("lat"), F.col("poly_id"))).select(
        "url", "lat", "lon", "poly_id", "airspace_name", "airspace_type", "airspace_class"
    )
