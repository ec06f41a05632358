"""Multimodal columns (north star, SURVEY §2.12): media as opaque
``binary`` columns + typed metadata structs, processed by Arrow-
batched pandas UDFs via ``mapInPandas``.

The media codecs (ffmpeg/librosa/PIL) are NOT in this environment,
so the decode step is a clearly-marked deterministic fake behind the
same interface a real decoder would use (see ``_decode_pcm_stub``);
the Spark-side plumbing — schema, partitioning, batch iteration,
feature extraction over decoded arrays — is real and tested.

Layout principle for 100 TB: keep bytes opaque (BinaryType) until
the single UDF stage that needs them decoded; never shuffle decoded
arrays; project metadata columns for all filtering/routing so
partition pruning and pushdown act on the scan, not after decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes bigint, n_samples bigint, duration_s double, "
    "rms double, peak double, checksum bigint"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: one row per document with an opaque
    binary payload (deterministic bytes derived from the text — a
    stand-in for an audio container) + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("audio/fake-pcm").alias("mime"),
            F.lit(16000).alias("frame_rate"),
            F.length("text").cast("bigint").alias("content_length"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _decode_pcm_stub(payload: bytes, frame_rate: int) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    A real implementation would hand ``payload`` to a codec
    (pydub/ffmpeg → PCM float32, as the reference does at
    /root/reference/claude_research_optimal.py:474). The container
    image has no codec libraries, so this maps bytes → a float32
    waveform deterministically (byte values recentred to [-1, 1)),
    preserving every contract a real decoder has: pure function of
    the payload, float32 output, length ∝ content size.
    """
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (raw - 128.0) / 128.0


# Pluggable decode seam: a real codec (sources.backends.soundfile_decoder)
# drops in with the same (payload, frame_rate) -> float32 contract.
_PCM_DECODER = _decode_pcm_stub


def set_pcm_decoder(decoder) -> None:
    """Install a real PCM decoder (e.g. ``backends.soundfile_decoder()``);
    pass ``None`` to restore the deterministic stub."""
    global _PCM_DECODER
    _PCM_DECODER = decoder or _decode_pcm_stub


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract stage: mapInPandas over binary rows →
    per-clip acoustics (duration, RMS, peak) — the engine shape of
    the reference's DSP helpers (C8-C10). Arrow moves the bytes; the
    decoded array never leaves the worker."""
    # Capture the decoder at plan time: the closure ships to workers
    # via cloudpickle, so an installed real decoder rides along
    # (module globals would re-resolve to the stub on the worker).
    _decode_pcm = _PCM_DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fr = int(meta["frame_rate"])
                pcm = _decode_pcm(bytes(payload), fr)
                rows.append(
                    dict(
                        media_id=int(media_id),
                        n_bytes=len(payload),
                        n_samples=len(pcm),
                        duration_s=len(pcm) / fr,
                        rms=float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0,
                        peak=float(np.max(np.abs(pcm))) if len(pcm) else 0.0,
                        checksum=int(np.frombuffer(bytes(payload), dtype=np.uint8).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                    "checksum",
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 1000) -> DataFrame:
    """Frame-sampling stage (the video analog): emit every Nth decoded
    sample as its own row — 1 binary row → M frame rows, the UDTF
    shape used for video frame extraction."""
    _decode_pcm = _PCM_DECODER  # plan-time capture, as audio_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                pcm = _decode_pcm(bytes(payload), int(meta["frame_rate"]))
                for k, i in enumerate(range(0, len(pcm), every_n)):
                    out.append(
                        dict(
                            media_id=int(media_id),
                            frame_no=k,
                            sample_idx=i,
                            value=float(pcm[i]),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "sample_idx", "value"]
            )

    return media.mapInPandas(
        run, "media_id long, frame_no long, sample_idx long, value double"
    )


_FEATURES_ORACLE = """
SELECT doc_id AS media_id,
       cast(length(text) AS bigint) AS n_bytes,
       cast(length(text) AS bigint) AS n_samples
FROM documents
"""


@register("multimodal_audio_features", tags=("multimodal", "udf"))
def multimodal_audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode + acoustic features through the pandas-UDF
    boundary (rows-only; stub decode is hash-deterministic — pinned
    by tests/test_multimodal.py including an n_bytes cross-check
    against the documents table)."""
    n_part = spark.sparkContext.defaultParallelism
    media = media_table(spark, sf_dir).repartition(n_part)
    return audio_features(media).orderBy("media_id")


@register("multimodal_frame_sample", tags=("multimodal", "udf"))
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→M frame-sampling through mapInPandas (video-frame shape)."""
    n_part = spark.sparkContext.defaultParallelism
    media = media_table(spark, sf_dir).repartition(n_part)
    return frame_sample(media, every_n=100).orderBy("media_id", "frame_no")


# ---------------------------------------------------------------------
# Image path: decode-stub → strided resize → thumbnail features
# ---------------------------------------------------------------------

IMAGE_RESIZE_SCHEMA = (
    "media_id long, src_h bigint, src_w bigint, dst_h bigint, dst_w bigint, "
    "mean_px double, checksum bigint"
)


def _decode_image_stub(payload: bytes, width: int = 64) -> np.ndarray:
    """STUB IMAGE DECODER — deterministic fake (no PIL/ffmpeg in this
    container). Maps bytes → a uint8 H×W single-channel 'image' by
    row-major reshape, padding the tail row with zeros. A real decoder
    (PIL.Image.open → np.asarray) drops in with the same contract:
    pure function of payload, uint8 array out."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    h = (len(raw) + width - 1) // width
    img = np.zeros(h * width, dtype=np.uint8)
    img[: len(raw)] = raw
    return img.reshape(h, width)


def image_resize(media: DataFrame, dst_h: int = 16, dst_w: int = 16) -> DataFrame:
    """Decode + nearest-neighbor resize + thumbnail stats in one
    mapInPandas pass — the image-column analog of the audio feature
    stage. The resize is index-striding (no interpolation), the
    standard cheap thumbnail for dedup/feature pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(payload))
                sh, sw = img.shape
                ys = (np.arange(dst_h) * sh // dst_h).clip(0, sh - 1)
                xs = (np.arange(dst_w) * sw // dst_w).clip(0, sw - 1)
                thumb = img[np.ix_(ys, xs)]
                rows.append(
                    dict(
                        media_id=int(media_id),
                        src_h=sh,
                        src_w=sw,
                        dst_h=dst_h,
                        dst_w=dst_w,
                        mean_px=float(thumb.mean()),
                        checksum=int(thumb.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "src_h", "src_w", "dst_h", "dst_w",
                         "mean_px", "checksum"],
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_RESIZE_SCHEMA)


@register("multimodal_image_resize", tags=("multimodal", "udf"))
def multimodal_image_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → decode-stub → strided 16×16 thumbnail → stats through
    the pandas-UDF boundary (rows-only; deterministic payloads)."""
    n_part = spark.sparkContext.defaultParallelism
    media = media_table(spark, sf_dir).repartition(n_part)
    return image_resize(media).orderBy("media_id")
