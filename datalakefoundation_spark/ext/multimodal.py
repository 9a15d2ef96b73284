"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct. The Spark-side machinery — schema, partitioning, Arrow
batch shape, ``mapInPandas`` signatures — is real and tested; the actual
codec step is STUBBED (this container has no image/audio libraries): decode
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake feature vector derived from the payload bytes, so
pipelines are fully exercisable end-to-end.

Scale notes:
* ``mapInPandas`` streams Arrow batches — payload bytes never round-trip
  through Python row objects.
* ``media_repartition`` sizes partitions by *bytes*, not rows, so a 100 TB
  video corpus doesn't produce 2-row or 20 GB tasks.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats in
    [0, 1) from the payload's sha256. Replace with PIL/librosa/ffmpeg in a
    real deployment."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def from_text_fixture(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture (text bytes stand in
    for image payloads) — exercises the binary plumbing on real parquet."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``strict=True`` raises NotImplementedError at execution time (the real
    decoder is not available in this environment); otherwise the
    deterministic fake decoder runs so the distributed plumbing (batch
    iteration, schema, null payloads) is fully tested.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "plug a real decoder here (PIL/librosa/ffmpeg)"
                )
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": contents.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": contents.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": contents.map(
                        lambda b: _fake_decode(b) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(_extract, FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Image resize in the real Arrow-batched shape: streams (payload, meta)
    batches through ``mapInPandas`` and rewrites the metadata dimensions.
    The pixel transform itself is STUBBED (no codecs in this environment —
    payload passes through unchanged; plug PIL's ``Image.resize`` into the
    marked line in a real deployment); ``strict=True`` raises instead."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image codecs unavailable; decode+resize payload here (PIL)"
                )
            meta = pdf["meta"].map(
                lambda m: {**(dict(m) if m is not None else {}), "width": width, "height": height}
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"],  # <- real decoder resizes here
                    "media_type": pdf["media_type"],
                    "meta": meta,
                }
            )

    return df.mapInPandas(_resize, MEDIA_SCHEMA)


def media_repartition(df: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Byte-aware repartition: estimate total payload size from the binary
    column and choose a partition count targeting ``target_bytes`` each.
    One lightweight agg job, then a round-robin repartition."""
    total = df.select(F.sum(F.length("content")).alias("b")).head()["b"] or 0
    parts = max(1, int(total / target_bytes) + 1)
    return df.repartition(parts)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits (media_id, frame_ts_ms) rows from the
    metadata duration — the real implementation would decode frames in the
    same mapInPandas shape as extract_features."""
    return (
        df.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
