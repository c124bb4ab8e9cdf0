"""Corpus interchange I/O: JSON-lines and lang-partitioned parquet.

JSONL is the lingua franca of LLM corpus tooling — one JSON object per
line, schema-on-read. Both directions are executor-side Jackson
(df.write.json / spark.read.schema(...).json); the roundtrip test pins
byte-identical text through serialization (quotes, backslashes,
unicode).

Lang-partitioned parquet is the third layout primitive next to
bucketing (plans/bucketing) and range-clustering (plans/layout):
`partitionBy(lang)` puts each language in its own directory, and a
language predicate prunes entire directories at planning time
(PartitionFilters — zero I/O for excluded languages, visible in the
scan node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def write_jsonl(documents: DataFrame, out_dir: str) -> None:
    """One JSON object per line, distributed (one file per partition)."""
    documents.write.mode("overwrite").json(out_dir)


def read_jsonl(
    spark: SparkSession, in_dir: str, schema: str = DOCUMENTS_SCHEMA, mode: str = "FAILFAST"
) -> DataFrame:
    """Schema-on-read JSONL scan: an EXPLICIT schema (inference is a
    whole extra pass over the data at corpus scale, and samples can
    mis-type sparse fields). Default mode is FAILFAST — the default
    PERMISSIVE turns a malformed line into an all-NULL row that silently
    drops out of downstream joins; pass mode="PERMISSIVE" only with a
    deliberate corrupt-record strategy."""
    return spark.read.schema(schema).option("mode", mode).json(in_dir)


def write_lang_partitioned(documents: DataFrame, out_dir: str) -> None:
    """Directory-per-language parquet layout: language predicates prune
    whole partitions at planning time."""
    documents.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
