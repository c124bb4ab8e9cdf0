"""The full engine pipeline as checkpointed, resumable stages.

pages -> page_cells -> join_out -> knn_out -> tiles, each stage written
through plans/checkpoint.StageRunner (parquet + per-file lineage manifest).
Killing the job between stages and re-running resumes from the last
complete stage — downstream recomputes, upstream is read back; content
hashes prove byte-stability across resumes (north-rule resumability).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators.knn import knn_ring_expansion
from ..operators.spatial import DEFAULT_JOIN_RES, spatial_join
from ..operators.tiles import (
    DEFAULT_TILE_RES,
    tile_class_rollup,
    tile_doc_counts,
    tile_zoom_rollup,
)
from ..sources.pages import pages_from_documents
from .checkpoint import StageRunner


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    polygons: list[dict[str, Any]] | None = None,
    join_res: int = DEFAULT_JOIN_RES,
    tile_res: int = DEFAULT_TILE_RES,
    stop_after: str | None = None,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline. `stop_after` simulates a mid-job
    kill for resumability tests. Returns the stage DataFrames."""
    if polygons is None:
        from ..functions.convert_local import fixture_polygons

        polygons = fixture_polygons()

    runner = StageRunner(spark, checkpoint_dir)
    out: dict[str, DataFrame] = {}

    def build_pages() -> DataFrame:
        from pyspark.sql import functions as F

        from ..functions.cellgrid import cell_id_col

        # partition the stored pages by a coarse cell prefix so regional
        # queries get partition pruning from the parquet layout for free
        pages = pages_from_documents(spark, sf_dir)
        return pages.withColumn("cell_r5", cell_id_col(F.col("lon"), F.col("lat"), 5))

    out["pages"] = runner.run("pages", build_pages, partition_by=("cell_r5",))
    if stop_after == "pages":
        return out

    out["join_out"] = runner.run(
        "join_out",
        lambda: spatial_join(out["pages"], polygons, res=join_res, keep_cols=("text", "lang")),
    )
    if stop_after == "join_out":
        return out

    out["knn_out"] = runner.run(
        "knn_out", lambda: knn_ring_expansion(out["pages"], polygons)
    )
    if stop_after == "knn_out":
        return out

    out["tiles"] = runner.run(
        "tiles", lambda: tile_class_rollup(out["join_out"], tile_res)
    )
    out["tile_counts"] = runner.run(
        "tile_counts", lambda: tile_doc_counts(out["pages"], tile_res)
    )
    # zoom pyramid: built from the TILE stage, not the fact table — each
    # coarser level costs a tiles-sized aggregation (the 100-TB shape)
    out["tile_counts_z2"] = runner.run(
        "tile_counts_z2",
        lambda: tile_zoom_rollup(out["tile_counts"].drop("n_langs"), levels=2),
    )
    return out
