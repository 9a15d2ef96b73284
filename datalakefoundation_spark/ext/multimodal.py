"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct. The Spark-side machinery — schema, partitioning, Arrow
batch shape, ``mapInPandas`` signatures — is real and tested, and the
codec step is REAL for the supported containers: PNG and PPM images and
PCM WAV audio decode through ``ext.codecs`` (pure numpy + stdlib zlib;
Pillow is picked up automatically as a fast path when importable).
Payloads in unknown containers (e.g. the text-bytes fixture used by the
oracle queries) fall back to a deterministic byte-level feature vector —
or raise in ``strict`` mode, which is now a per-payload unsupported-format
error rather than a blanket stub guard.

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

from datalakefoundation_spark.ext import codecs

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
    """Deterministic byte-level features for payloads in UNKNOWN containers
    (e.g. the text-bytes oracle fixture): FEATURE_DIM floats in [0, 1)
    from the payload's sha256."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _decode_features(content: bytes, strict: bool) -> list[float] | None:
    return _decode_features_tagged(content, strict)[0]


def _decode_features_tagged(
    content: bytes, strict: bool
) -> tuple[list[float] | None, str | None, str | None]:
    """Per-payload feature extraction: REAL decode for supported containers
    (PNG/PPM pixels -> image_features; PCM WAV -> audio_features), the
    deterministic byte-level fallback for unknown ones (or an error in
    strict mode). A corrupt payload in a known container always raises —
    silently hashing bytes that claimed to be a PNG would mask data
    corruption. Returns (features, container, path) where path is "real"
    (container decoded), "fallback" (byte-level features), or None (null
    payload) — the audit columns extract_features(audit=True) surfaces."""
    if content is None:
        return None, None, None
    kind = codecs.sniff(bytes(content))
    if kind in ("png", "ppm", "jpeg"):
        feats = codecs.image_features(codecs.decode_image(bytes(content)), FEATURE_DIM)
        return feats, kind, "real"
    if kind == "gif":  # animated: features of the first composed frame
        frames, _delays = codecs.gif_decode_frames(bytes(content))
        return codecs.image_features(frames[0], FEATURE_DIM), kind, "real"
    if kind == "wav":
        samples, rate = codecs.wav_decode(bytes(content))
        return codecs.audio_features(samples, rate, FEATURE_DIM), kind, "real"
    if strict:
        raise codecs.UnsupportedMedia(
            "payload container not recognized (png|ppm|jpeg|gif|wav supported)"
        )
    return _fake_decode(bytes(content)), None, "fallback"


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


def extract_features(
    df: DataFrame, strict: bool = False, audit: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Supported containers (PNG/PPM/JPEG/GIF/PCM-WAV) decode for REAL
    through ext.codecs (Pillow fast path when importable); unknown
    containers get the deterministic byte-level fallback, or — with
    ``strict=True`` — an UnsupportedMedia error at execution time.

    ``audit=True`` (r9 directive #8) adds decode-cost telemetry columns —
    ``container`` (sniffed kind or NULL), ``decode_path`` ("real" |
    "fallback" | NULL for null payloads), ``decode_us`` (per-payload
    wall) — so a 100 TB run can SEE what fraction of its media bytes
    actually decoded and what each container costs; aggregate with
    ``decode_audit``. The telemetry is collected inside the same Arrow
    batch loop (a perf_counter pair per payload, no second decode)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        for pdf in batches:
            contents = pdf["content"]
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": contents.map(lambda b: len(b) if b is not None else 0),
                "content_sha": contents.map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
            }
            if not audit:
                out["features"] = contents.map(
                    lambda b: _decode_features(b, strict)
                )
                yield pd.DataFrame(out)
                continue
            feats, kinds, paths, walls = [], [], [], []
            for b in contents:
                t0 = _time.perf_counter()
                f, kind, path = _decode_features_tagged(b, strict)
                walls.append(int((_time.perf_counter() - t0) * 1_000_000))
                feats.append(f)
                kinds.append(kind)
                paths.append(path)
            out["features"] = pd.Series(feats, index=pdf.index, dtype=object)
            out["container"] = pd.Series(kinds, index=pdf.index, dtype=object)
            out["decode_path"] = pd.Series(paths, index=pdf.index, dtype=object)
            out["decode_us"] = pd.Series(walls, index=pdf.index)
            yield pd.DataFrame(out)

    schema = FEATURES_SCHEMA
    if audit:
        schema = T.StructType(
            list(FEATURES_SCHEMA.fields)
            + [
                T.StructField("container", T.StringType()),
                T.StructField("decode_path", T.StringType()),
                T.StructField("decode_us", T.LongType()),
            ]
        )
    return df.mapInPandas(_extract, schema)


def decode_audit(features_df: DataFrame) -> DataFrame:
    """Aggregate the audit columns of ``extract_features(audit=True)``
    into the stage's cost/coverage report: per (media_type, container,
    decode_path) — payload count, total bytes, total and per-payload
    decode wall. One map-side-combined groupBy; the result is
    container-cardinality-sized, safe to collect or log anywhere."""
    return (
        features_df.groupBy("media_type", "container", "decode_path")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("decode_us").alias("decode_us_total"),
            F.avg("decode_us").alias("decode_us_avg"),
        )
        .orderBy(F.desc("total_bytes"))
    )


def resize_images(
    df: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Arrow-batched image resize: supported image payloads (PNG/PPM/JPEG)
    are REALLY decoded, nearest-neighbor resized, and re-encoded in their
    original container; the metadata dimensions are rewritten to the
    decoded truth. Unknown containers pass through with metadata updated
    (byte fixture path), or raise UnsupportedMedia with ``strict=True``."""

    def _resize_one(b, strict=strict):
        if b is None:
            return None
        raw = bytes(b)
        kind = codecs.sniff(raw)
        if kind == "png":
            return codecs.png_encode(codecs.resize_nearest(codecs.png_decode(raw), width, height))
        if kind == "ppm":
            return codecs.ppm_encode(codecs.resize_nearest(codecs.ppm_decode(raw), width, height))
        if kind == "jpeg":
            px = codecs.resize_nearest(codecs.jpeg_decode(raw), width, height)
            return codecs.jpeg_encode(px if px.shape[2] > 1 else px[:, :, 0])
        if strict:
            raise codecs.UnsupportedMedia("payload is not a supported image container")
        return raw

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(
                lambda m: {**(dict(m) if m is not None else {}), "width": width, "height": height}
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(_resize_one),
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


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — REAL for animated-GIF payloads: decodes the
    frame sequence (ext.codecs LZW decoder, frame composition with
    transparency/disposal), walks the frame timeline, keeps one composed
    frame per ``every_ms`` window, and emits each as PNG bytes. Runs in
    the same Arrow-batched mapInPandas shape as extract_features.

    Non-GIF payloads keep the metadata-timeline fallback: (media_id,
    frame_idx, frame_ts_ms, NULL png) rows derived from
    ``meta.duration_ms`` — the sampling grid without the pixels."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms", "frame_png")}

            def emit(mid, idx, ts, png):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame_ts_ms"].append(ts)
                out["frame_png"].append(png)

            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                raw = bytes(content) if content is not None else None
                if raw is not None and codecs.sniff(raw) == "gif":
                    frames, delays = codecs.gif_decode_frames(raw)
                    ts = 0
                    next_keep = 0
                    for i, (frame, d) in enumerate(zip(frames, delays)):
                        if ts >= next_keep:
                            emit(mid, i, ts, codecs.png_encode(frame))
                            next_keep = ts + every_ms
                        ts += max(d, 1)
                    continue
                dur = 0
                if meta is not None:
                    m = dict(meta)
                    dur = int(m.get("duration_ms") or 0)
                for i, ts in enumerate(range(0, dur + 1, every_ms)):
                    emit(mid, i, ts, None)
            yield pd.DataFrame(out)

    vids = df.where(F.col("media_type") == "video").select(
        "media_id", "content", "meta"
    )
    return vids.mapInPandas(_sample, FRAMES_SCHEMA)
