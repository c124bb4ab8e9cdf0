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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
    ]
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decode: payload bytes cycled
    into an (height, width) uint8 'image'."""
    return np.resize(np.frombuffer(payload, dtype=np.uint8), (height, width))


def resize_images(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    decoder: Callable[[bytes, int, int], np.ndarray] | None = None,
) -> DataFrame:
    """Area-average (block-mean) image resize over mapInPandas.

    The decode step is stubbed (deterministic fake pixels from the payload
    bytes — no codec libs in this container; a real decoder is a
    one-argument swap), but the resize MATH is real, vectorized NumPy:
    reshape to (out_h, bh, out_w, bw) blocks and mean over the block axes.
    Source dims must divide evenly by the target (raises otherwise —
    honest subset, not silent interpolation). Only `image` rows produce
    output; Arrow batches stay bounded because each row's pixel buffer is
    width x height bytes, never the whole partition."""
    decode = decoder or _fake_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image" or payload is None:
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                if w % out_w or h % out_h:
                    raise ValueError(
                        f"block-mean resize needs divisible dims: {w}x{h} -> {out_w}x{out_h}"
                    )
                px = decode(payload, w, h).astype(np.float64)
                blocks = px.reshape(out_h, h // out_h, out_w, w // out_w)
                small = blocks.mean(axis=(1, 3))
                rows.append(
                    (
                        mid,
                        out_w,
                        out_h,
                        np.rint(small).astype(np.uint8).tobytes(),
                        float(small.mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "out_w", "out_h", "resized", "px_mean"])

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.StringType(), True),
    ]
)


def _fake_frame(payload: bytes, frame_idx: int) -> str:
    """Deterministic stand-in for a video frame grab: an 8-byte slice at a
    frame-dependent offset (payloads are ASCII, so the slice decodes).
    Pure substring arithmetic — the DuckDB oracle recomputes it exactly."""
    off = (frame_idx * 7) % (len(payload) - 8)
    return payload[off : off + 8].decode("ascii")


def sample_frames(
    media: DataFrame,
    every_k: int = 4,
    extractor: Callable[[bytes, int], str] | None = None,
) -> DataFrame:
    """Frame sampling over mapInPandas: every k-th frame index of each
    `video` row (0, k, 2k, ... below meta.n_frames) becomes one output row
    with the extracted frame. Extraction is the stubbed deterministic fake
    by default (real codec = one-argument swap; the Spark plan — bounded
    Arrow batches in, exploded frame rows out — does not move)."""
    extract = extractor or _fake_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video" or payload is None:
                    continue
                for i in range(0, int(meta["n_frames"]), every_k):
                    rows.append((mid, i, extract(payload, i)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
