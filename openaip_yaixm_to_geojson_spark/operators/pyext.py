"""Python extension surfaces: UDTF and grouped-agg pandas UDF.

The engine's production paths are codegen expressions and Arrow-batched
pandas UDFs (mapInPandas / applyInPandas[WithState]); this module
demonstrates the remaining two PySpark extension surfaces — a Python
table function (Spark 4 `@udtf`) and a grouped-aggregate pandas UDF —
each implementing semantics the engine already has in codegen, so tests
can pin the extension surface against the production twin. These are
API-coverage demonstrations, NOT hot-path operators: a row-at-a-time
UDTF is the slow path by construction (documented trade-off; use
text.chunk_documents in pipelines).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="chunk_id bigint, chunk_start bigint, chunk_tokens bigint, chunk_text string")
class ChunkTableFunction:
    """UDTF twin of text.chunk_documents: one input row -> one row per
    overlapping token window. Python-loop semantics are the executable
    SPEC for the codegen operator; the pinned-equality test proves the
    sequence+explode+slice expression tree implements exactly this."""

    def eval(self, text: str, size: int, stride: int):
        import re

        if text is None:
            return
        # mirror the JVM exactly: F.trim strips ASCII spaces only, and
        # Java's \s is the ASCII class [ \t\n\x0b\f\r] (Python
        # str.split would also split on unicode whitespace like \xa0);
        # an empty string still yields one token [''] like split() does,
        # so empty documents emit ONE empty chunk, matching the codegen op
        toks = re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))
        for s in range(0, len(toks), stride):
            window = toks[s : s + size]
            yield (s // stride, s, len(window), " ".join(window))


def chunk_documents_udtf(
    documents: DataFrame, size: int = 32, stride: int = 24, key_col: str = "doc_id"
) -> DataFrame:
    """Lateral-join the chunking UDTF against each document row."""
    return documents.lateralJoin(
        ChunkTableFunction(F.col("text").outer(), F.lit(size), F.lit(stride))
    ).select(F.col(key_col).alias("key"), "chunk_id", "chunk_start", "chunk_tokens", "chunk_text")


@pandas_udf("bigint")
def _sum_chars_agg(n_chars: pd.Series) -> int:  # Series -> scalar = GROUPED_AGG
    # (the `-> int` hint drives GROUPED_AGG dispatch; returning None at
    # runtime is fine — the result column is nullable bigint)
    # NULL semantics must match F.sum: all-NULL group -> NULL (a bare
    # .sum() would return 0.0); nulls arrive as NaN in a float64 series,
    # so drop them before the integer sum (exact below 2^53 — fine for
    # character counts; this is an API demo, F.sum is the production path)
    vals = n_chars.dropna()
    if vals.empty:
        return None
    return int(vals.astype("int64").sum())


def lang_chars_pandas_agg(documents: DataFrame) -> DataFrame:
    """Grouped-aggregate pandas UDF surface: per-language n_chars totals
    computed by an Arrow-batched Python aggregator — pinned equal to the
    JVM F.sum twin in tests. Integer-exact (int64 sums)."""
    return documents.groupBy("lang").agg(_sum_chars_agg("n_chars").alias("total_chars"))
