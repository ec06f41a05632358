"""Real-model backends for the inference/decode seams (import-guarded).

The engine's inference scans (sources.asr_scan) and media decode
(operators.multimodal) run deterministic stubs by default — this
container has no GPU, no whisper weights, no audio codecs. These
factories adapt the real libraries the reference uses behind the
exact same seams, so a user with the libraries installed plugs them
in with one call and every Spark-side contract (per-worker singleton,
Arrow batching, output schema) is unchanged:

- ``faster_whisper_backend``  → the validator model
  (/root/reference/claude_research_optimal.py:344-363)
- ``whisperx_backend``        → the primary ASR + forced alignment
  (/root/reference/claude_research_optimal.py:235-280)
- ``soundfile_decoder``       → PCM decode of a media payload
  (/root/reference/claude_research_optimal.py:474 — pydub/ffmpeg)

All imports happen lazily inside the factory/worker so merely
importing this module never fails; a missing library raises a
RuntimeError naming the package at first use — the same graceful
degradation the reference applies to librosa
(claude_research_optimal.py:143-157).

Usage::

    from asr_training_data_pipeline_spark.sources import asr_scan, backends
    asr_scan.set_asr_backend(backends.faster_whisper_backend("medium.en"))

    from asr_training_data_pipeline_spark.operators import multimodal
    multimodal.set_pcm_decoder(backends.soundfile_decoder())
"""

from __future__ import annotations

from collections.abc import Callable


def _require(module: str, hint: str):
    try:
        return __import__(module)
    except ImportError as e:  # pragma: no cover - exercised via fake name
        raise RuntimeError(
            f"backend requires the '{module}' package, which is not "
            f"installed in this environment ({hint})"
        ) from e


def _normalize_word(s: str) -> str | None:
    from .asr_scan import _normalize_word as norm

    return norm(s)


def faster_whisper_backend(
    model_name: str = "medium.en",
    device: str = "auto",
    compute_type: str | None = None,
    *,
    module: str = "faster_whisper",
) -> Callable[[], Callable]:
    """Factory for :func:`asr_scan.set_asr_backend` wrapping
    faster-whisper — the reference's validator model
    (claude_research_optimal.py:344-363: ``word_timestamps=True``,
    VAD off, int8 on CPU / float16 on CUDA, :470).

    The returned factory runs ONCE PER WORKER (the mapInPandas
    singleton seam), loading the CTranslate2 model there; the
    transcribe callable accepts ``(pair_id, audio)`` where ``audio``
    is a filesystem path or raw container bytes and returns the same
    word-dict rows the stub emits, so every downstream operator
    (alignment, consensus, boundary math) is backend-agnostic.
    """

    def factory() -> Callable:
        fw = _require(module, "pip install faster-whisper")
        dev = device
        if dev == "auto":  # resolve BEFORE picking compute type
            try:
                import torch

                dev = "cuda" if torch.cuda.is_available() else "cpu"
            except ImportError:
                dev = "cpu"
        ct = compute_type or ("float16" if dev == "cuda" else "int8")
        model = fw.WhisperModel(model_name, device=dev, compute_type=ct)

        def transcribe(pair_id: int, audio) -> list[dict]:
            import io

            src = audio if isinstance(audio, str) else io.BytesIO(bytes(audio))
            # Reference validator settings (claude_research_optimal.py:349-357):
            # word timestamps on, VAD filter off.
            segments, _info = model.transcribe(
                src, word_timestamps=True, vad_filter=False
            )
            rows: list[dict] = []
            for seg in segments:
                for w in seg.words or ():
                    norm = _normalize_word(w.word)
                    if norm is None:  # F1 empty-norm filter (:353-356)
                        continue
                    rows.append(
                        dict(
                            pair_id=pair_id,
                            idx=len(rows),
                            text=w.word.strip(),
                            norm=norm,
                            start=float(w.start),
                            end=float(w.end),
                            confidence=float(w.probability),
                        )
                    )
            return rows

        return transcribe

    return factory


def whisperx_backend(
    model_name: str = "large-v3",
    device: str = "auto",
    batch_size: int = 16,
    *,
    module: str = "whisperx",
) -> Callable[[], Callable]:
    """Factory wrapping WhisperX transcription + wav2vec2 forced
    alignment — the reference's primary ASR scan
    (claude_research_optimal.py:235-280: ``batch_size=16`` transcribe
    :245, align-model load :248, forced alignment :251, word rows
    with scores :254-277)."""

    def factory() -> Callable:
        wx = _require(module, "pip install whisperx")
        dev = device
        if dev == "auto":
            try:
                import torch

                dev = "cuda" if torch.cuda.is_available() else "cpu"
            except ImportError:
                dev = "cpu"
        ct = "float16" if dev == "cuda" else "int8"  # :242
        model = wx.load_model(model_name, dev, compute_type=ct)
        align_model = {}

        def transcribe(pair_id: int, audio) -> list[dict]:
            if isinstance(audio, str):
                wav = wx.load_audio(audio)
            elif isinstance(audio, (bytes, bytearray)):
                # whisperx decodes from a path (ffmpeg); spill the
                # container bytes to a temp file first — the same
                # disk handoff the reference validator uses
                # (claude_research_optimal.py:346-348)
                import os
                import tempfile

                fd, tmp = tempfile.mkstemp(suffix=".audio")
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(bytes(audio))
                    wav = wx.load_audio(tmp)
                finally:
                    os.unlink(tmp)
            else:  # already a decoded waveform ndarray
                wav = audio
            result = model.transcribe(wav, batch_size=batch_size)
            lang = result["language"]
            if lang not in align_model:  # one align model per language (:248)
                align_model[lang] = wx.load_align_model(language_code=lang, device=dev)
            am, meta = align_model[lang]
            aligned = wx.align(result["segments"], am, meta, wav, dev)
            rows: list[dict] = []
            for seg in aligned["segments"]:
                for w in seg.get("words", ()):
                    if "start" not in w:  # unaligned word: skipped (:262-264)
                        continue
                    norm = _normalize_word(w["word"])
                    if norm is None:
                        continue
                    rows.append(
                        dict(
                            pair_id=pair_id,
                            idx=len(rows),
                            text=w["word"].strip(),
                            norm=norm,
                            start=float(w["start"]),
                            end=float(w["end"]),
                            confidence=float(w.get("score", 1.0)),
                        )
                    )
            return rows

        return transcribe

    return factory


def soundfile_decoder(*, module: str = "soundfile") -> Callable:
    """Real PCM decode for :func:`multimodal.set_pcm_decoder`:
    payload bytes → mono float32 waveform via libsndfile — the drop-in
    for the reference's ``AudioSegment.from_file``
    (claude_research_optimal.py:474). Mono mix-down matches pydub's
    ``set_channels(1)`` convention; output is float32 in [-1, 1] like
    the reference's sample-array conversion (:122)."""
    _require(module, "pip install soundfile")

    def decode(payload: bytes, frame_rate: int):
        import io

        import numpy as np

        sf_mod = __import__(module)
        data, _sr = sf_mod.read(io.BytesIO(bytes(payload)), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        return np.asarray(data, dtype=np.float32)

    return decode
