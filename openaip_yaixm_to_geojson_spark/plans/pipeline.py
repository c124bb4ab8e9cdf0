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


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    quality_min: float = 0.7,
    sample_fraction: float = 0.5,
    stop_after: str | None = None,
) -> dict[str, DataFrame]:
    """The training-data twin of run_pipeline: documents -> analyze
    (langid/quality/tokens/fingerprint) -> exact dedup (fingerprint
    survivor rows) -> corpus (quality floor + deterministic sample) ->
    per-language stats, every stage a checkpointed parquet table with
    per-partition lineage, resumable mid-job. Quality fields are flattened
    to plain columns at the storage boundary (columnar-friendly, and the
    lineage hash canonicalizes primitives).

    Text passes through byte-identical: only FILTERS and projections touch
    rows after the analyze stage (the input_hint invariant holds through
    every stored stage)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.text import analyze_documents, sample_hash_col

    runner = StageRunner(spark, checkpoint_dir)
    out: dict[str, DataFrame] = {}

    def build_analyzed() -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = analyze_documents(docs)
        return a.select(
            *docs.columns,
            "lang_pred",
            F.col("quality.quality_score").alias("quality_score"),
            F.col("quality.mean_word_len").alias("mean_word_len"),
            "n_tokens_ws",
            "n_tokens_bpe",
            "fingerprint",
        )

    out["analyzed"] = runner.run("analyzed", build_analyzed)
    if stop_after == "analyzed":
        return out

    def build_deduped() -> DataFrame:
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        return (
            out["analyzed"]
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    out["deduped"] = runner.run("deduped", build_deduped)
    if stop_after == "deduped":
        return out

    threshold = int(round(sample_fraction * 1_000_000))
    out["corpus"] = runner.run(
        "corpus",
        lambda: out["deduped"]
        .where(F.col("quality_score") >= quality_min)
        .where(sample_hash_col(F.col("doc_id")) < threshold),
    )

    out["corpus_stats"] = runner.run(
        "corpus_stats",
        lambda: out["corpus"]
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens_ws").alias("total_tokens_ws"),
            F.sum("n_tokens_bpe").alias("total_tokens_bpe"),
        ),
    )
    if stop_after == "corpus_stats":
        return out

    # corpus QA stages: the span-level duplication profile (how much
    # cross-document boilerplate survived dedup) and the sampled LSH
    # recall report (is the near-dup banding still catching what exact
    # verification finds) — the two numbers a production corpus build
    # watches between dedup and export; both derive only from the stored
    # corpus stage
    def build_span_stats() -> DataFrame:
        from ..operators.terms import duplicated_span_stats

        return duplicated_span_stats(out["corpus"])

    out["span_stats"] = runner.run("span_stats", build_span_stats)
    if stop_after == "span_stats":
        return out

    def build_dedup_qa() -> DataFrame:
        from ..operators.dedup import lsh_recall_monitor

        return lsh_recall_monitor(out["corpus"])

    out["dedup_qa"] = runner.run("dedup_qa", build_dedup_qa)
    if stop_after == "dedup_qa":
        return out

    # training-data EXPORT stages: the cleaned corpus chunked into
    # overlapping context windows, and the same corpus packed into
    # fixed-capacity token streams (the two standard pre-training input
    # layouts); both derive only from the stored corpus stage, so a
    # resume after `corpus` never re-runs analyze/dedup
    def build_chunks() -> DataFrame:
        from ..operators.text import chunk_documents

        return chunk_documents(out["corpus"], size=64, stride=48)

    out["chunks"] = runner.run("chunks", build_chunks)
    if stop_after == "chunks":
        return out

    def build_packed() -> DataFrame:
        from ..operators.text import pack_documents

        return pack_documents(out["corpus"], capacity=512, n_streams=8)

    out["packed"] = runner.run("packed", build_packed)
    return out
