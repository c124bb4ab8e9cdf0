"""Storage-layout optimization: spatial range-clustered parquet writes.

Z-ORDER-style data clustering without a table format: sort the fact
table by its hierarchical cell id before writing, so spatially-near rows
land in the same files and a cell-range predicate prunes most files at
scan time (parquet min/max row-group stats on the cell column do the
pruning — Spark's parquet reader skips row groups whose [min, max] cell
interval misses the predicate).

The cell id (functions/cellgrid) is already a locality-preserving
integer — interleaved lat/lon at a fixed resolution — so a plain 1-D
range cluster on it IS the space-filling-curve layout: one
repartitionByRange (range-partitioned shuffle over sampled bounds) +
in-partition sort, no extra machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cellgrid
from ..operators.spatial import DEFAULT_JOIN_RES


def write_range_clustered(
    pages: DataFrame,
    out_dir: str,
    res: int = DEFAULT_JOIN_RES,
    n_files: int = 8,
) -> None:
    """Write pages clustered by cell id: disjoint cell ranges per file
    (repartitionByRange guarantees non-overlapping key ranges across
    output partitions; the within-partition sort tightens row-group
    stats inside each file)."""
    cells = pages.withColumn(
        "cell", cellgrid.cell_id_col(F.col("lon"), F.col("lat"), res)
    )
    (
        cells.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def clustered_cell_scan(spark: SparkSession, in_dir: str, cell_lo: int, cell_hi: int) -> DataFrame:
    """Range scan over a clustered table: the BETWEEN predicate reaches
    the parquet scan (PushedFilters) and row-group stats skip the files
    whose cell interval misses [cell_lo, cell_hi]."""
    df = spark.read.parquet(in_dir)
    return df.where((F.col("cell") >= cell_lo) & (F.col("cell") <= cell_hi))


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the maintenance pass every streaming sink
    needs (availableNow/foreachBatch emit a file per micro-batch per
    partition; a million 50 KB files kill scan planning and NameNode-
    style metadata at scale). Sizes the output by the ACTUAL input bytes
    (filesystem listing, no data pass), rewrites with coalesce (no
    shuffle — coalesce only merges read splits) and returns the output
    file count. Rows are preserved exactly; ordering is not (parquet
    scan order is split order — callers needing clustering should
    re-run write_range_clustered instead)."""
    if os.path.abspath(in_dir.removeprefix("file:")) == os.path.abspath(
        out_dir.removeprefix("file:")
    ):
        raise ValueError(
            "compact_parquet needs a distinct out_dir: Spark cannot "
            "overwrite a path it is reading (write to a sibling, then swap)"
        )
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = path.getFileSystem(conf)
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += f.getLen()
    n_files = max(1, -(-total // target_file_bytes))
    spark.read.parquet(in_dir).coalesce(n_files).write.mode("overwrite").parquet(out_dir)
    out_path = jvm.org.apache.hadoop.fs.Path(out_dir)
    out_fs = out_path.getFileSystem(conf)  # may be a DIFFERENT filesystem
    produced = 0
    it = out_fs.listFiles(out_path, False)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            produced += 1
    return produced
