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


def _fake_whisperx():
    """Minimal whisperx stand-in with canned raw transcribe+align
    output, shaped like the real API (dict segments/words)."""
    mod = types.ModuleType("fake_wx")
    mod.align_loads = 0

    def load_model(name, device, compute_type=None):
        class _M:
            def transcribe(self, wav, batch_size=16):
                return {"language": "en", "segments": ["raw-seg"]}

        return _M()

    def load_audio(path):
        return np.zeros(8, dtype=np.float32)

    def load_align_model(language_code, device):
        mod.align_loads += 1
        return ("align-model", {"lang": language_code})

    def align(segments, am, meta, wav, device):
        assert segments == ["raw-seg"] and am == "align-model"
        return {
            "segments": [
                {
                    "words": [
                        # unaligned word: no "start" key -> skipped (:262-264)
                        {"word": " um"},
                        {"word": " Hello,", "start": 0.0, "end": 0.4, "score": 0.91},
                        # empty norm after stripping punctuation -> dropped (F1)
                        {"word": " --", "start": 0.4, "end": 0.5, "score": 0.3},
                        # no score key -> confidence defaults to 1.0 (:268)
                        {"word": " WORLD", "start": 0.5, "end": 0.9},
                    ]
                },
                {"words": [{"word": " again.", "start": 1.0, "end": 1.3, "score": 0.77}]},
            ]
        }

    mod.load_model = load_model
    mod.load_audio = load_audio
    mod.load_align_model = load_align_model
    mod.align = align
    return mod


def test_whisperx_adapter_word_row_postprocessing():
    """Golden test for the whisperx adapter's TRANSFORM logic (not
    just its wiring): unaligned-word skip, empty-norm drop, dense
    post-filter idx, text strip, lowercase norm, score default —
    reference semantics claude_research_optimal.py:254-277."""
    fake = _fake_whisperx()
    sys.modules["fake_wx"] = fake
    try:
        factory = backends.whisperx_backend("large-v3", module="fake_wx")
        transcribe = factory()
        rows = transcribe(3, np.zeros(8, dtype=np.float32))
        assert [r["norm"] for r in rows] == ["hello", "world", "again"]
        assert [r["idx"] for r in rows] == [0, 1, 2]  # dense AFTER drops
        assert [r["text"] for r in rows] == ["Hello,", "WORLD", "again."]
        assert [r["pair_id"] for r in rows] == [3, 3, 3]
        assert rows[0]["confidence"] == pytest.approx(0.91)
        assert rows[1]["confidence"] == pytest.approx(1.0)  # missing score
        assert rows[2]["start"] == pytest.approx(1.0)
        assert rows[2]["end"] == pytest.approx(1.3)
        # align model cached per language: a second call must not reload
        transcribe(4, np.zeros(8, dtype=np.float32))
        assert fake.align_loads == 1
    finally:
        del sys.modules["fake_wx"]


def test_whisperx_adapter_bytes_input_spills_to_temp():
    """Container bytes go through the temp-file handoff
    (claude_research_optimal.py:346-348 analog) and reach load_audio."""
    fake = _fake_whisperx()
    seen = {}

    def load_audio(path):
        import os

        seen["existed"] = os.path.exists(path)
        with open(path, "rb") as f:
            seen["content"] = f.read()
        return np.zeros(8, dtype=np.float32)

    fake.load_audio = load_audio
    sys.modules["fake_wx"] = fake
    try:
        transcribe = backends.whisperx_backend(module="fake_wx")()
        rows = transcribe(1, b"\x01\x02\x03")
        assert seen == {"existed": True, "content": b"\x01\x02\x03"}
        assert len(rows) == 3
    finally:
        del sys.modules["fake_wx"]
