"""Plumbing tests for the import-guarded real-model backends
(sources/backends.py). No real model libraries exist in this
container, so the adapters are exercised through fake modules
injected into sys.modules — what's under test is the seam contract:
graceful degradation when the library is missing, and faithful
word-row / waveform adaptation when it is present.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from asr_training_data_pipeline_spark.operators import multimodal
from asr_training_data_pipeline_spark.sources import backends


def test_missing_library_raises_named_error():
    factory = backends.faster_whisper_backend(module="not_a_real_pkg_xyz")
    with pytest.raises(RuntimeError, match="not_a_real_pkg_xyz"):
        factory()
    with pytest.raises(RuntimeError, match="also_not_real_xyz"):
        backends.soundfile_decoder(module="also_not_real_xyz")


def _fake_faster_whisper():
    """A minimal faster_whisper stand-in with canned word output."""
    mod = types.ModuleType("fake_fw")

    class _Word:
        def __init__(self, word, start, end, probability):
            self.word, self.start, self.end = word, start, end
            self.probability = probability

    class _Seg:
        def __init__(self, words):
            self.words = words

    class WhisperModel:
        def __init__(self, name, device="auto", compute_type=None):
            self.name = name

        def transcribe(self, src, word_timestamps=True, vad_filter=False):
            segs = [
                _Seg([_Word(" Hello", 0.0, 0.4, 0.9), _Word(" ...", 0.4, 0.5, 0.2)]),
                _Seg([_Word(" world!", 0.5, 0.9, 0.8)]),
            ]
            return iter(segs), {"language": "en"}

    mod.WhisperModel = WhisperModel
    return mod


def test_faster_whisper_adapter_word_rows():
    sys.modules["fake_fw"] = _fake_faster_whisper()
    try:
        factory = backends.faster_whisper_backend("medium.en", module="fake_fw")
        transcribe = factory()
        rows = transcribe(7, b"fake-container-bytes")
        # "..." normalizes to empty -> dropped (F1); idx stays dense
        assert [r["norm"] for r in rows] == ["hello", "world"]
        assert [r["idx"] for r in rows] == [0, 1]
        assert rows[0]["pair_id"] == 7
        assert rows[1]["confidence"] == pytest.approx(0.8)
        assert rows[1]["start"] == pytest.approx(0.5)
    finally:
        del sys.modules["fake_fw"]


def test_soundfile_decoder_mono_mixdown():
    mod = types.ModuleType("fake_sf")

    def read(bio, dtype="float32"):
        assert dtype == "float32"
        return np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]], dtype=np.float32), 16000

    mod.read = read
    sys.modules["fake_sf"] = mod
    try:
        decode = backends.soundfile_decoder(module="fake_sf")
        out = decode(b"\x00\x01", 16000)
        assert out.dtype == np.float32
        assert out.tolist() == [0.5, 0.5, 0.5]
    finally:
        del sys.modules["fake_sf"]


def test_pcm_decoder_seam_reaches_workers(spark, sf_dir):
    """set_pcm_decoder must affect the Spark-side decode: the custom
    decoder is captured at plan time and shipped in the UDF closure,
    so even fresh worker processes use it."""

    def loud(payload: bytes, frame_rate: int) -> np.ndarray:
        return np.full(4, 0.25, dtype=np.float32)

    multimodal.set_pcm_decoder(loud)
    try:
        media = multimodal.media_table(spark, sf_dir).limit(5)
        pdf = multimodal.audio_features(media).toPandas()
        assert (pdf["n_samples"] == 4).all()
        assert pdf["rms"].round(6).eq(0.25).all()
    finally:
        multimodal.set_pcm_decoder(None)
    # stub restored: samples track payload size again
    pdf2 = multimodal.audio_features(
        multimodal.media_table(spark, sf_dir).limit(5)
    ).toPandas()
    assert (pdf2["n_samples"] == pdf2["n_bytes"]).all()
