"""Source-scan round-trips (SURVEY §2.1 S1/S2/S5)."""

from __future__ import annotations

import json
import os

from asr_training_data_pipeline_spark.sources.tables import (
    read_audio_files,
    read_summaries,
    read_transcripts,
)

_TEXTS = {
    "a.txt": "hello world this is a transcript\nwith two lines",
    "b.txt": "second transcript",
}


def _write_fixture_files(d):
    os.makedirs(d, exist_ok=True)
    for name, body in _TEXTS.items():
        with open(os.path.join(d, name), "w") as f:
            f.write(body)
    with open(os.path.join(d, "x.bin"), "wb") as f:
        f.write(bytes(range(256)))


def test_wholetext_transcript_scan(spark, tmp_path):
    d = str(tmp_path / "txt")
    _write_fixture_files(d)
    rows = read_transcripts(spark, d + "/*.txt").collect()
    got = {os.path.basename(r.path): r.text for r in rows}
    assert got == _TEXTS  # whole file per row, newlines intact


def test_binary_file_scan(spark, tmp_path):
    d = str(tmp_path / "bin")
    _write_fixture_files(d)
    rows = read_audio_files(spark, d + "/x.bin").collect()
    assert len(rows) == 1
    assert rows[0].length == 256
    assert bytes(rows[0].content) == bytes(range(256))


def test_summary_readback(spark, tmp_path):
    d = str(tmp_path / "sum")
    os.makedirs(d)
    payload = {"exported": 56, "rejected": 2, "rejection_rate_pct": 3.45}
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(payload, f)  # single-object JSON, like the reference
    got = read_summaries(spark, d + "/summary.json").collect()[0]
    assert (got.exported, got.rejected, got.rejection_rate_pct) == (56, 2, 3.45)


def test_asr_pairs_datasource(spark, tmp_path):
    """Custom Python DataSource: paired (stem.txt, stem.wav) scan —
    deterministic pair ids, planner-side partition splitting, unpaired
    files skipped, prefix pushdown prunes at planning time."""
    from asr_training_data_pipeline_spark.sources.pairsource import (
        register_pair_source,
    )

    d = tmp_path / "pairs"
    d.mkdir()
    for i in range(7):
        (d / f"s{i:02d}.txt").write_text(f"transcript {i}")
        (d / f"s{i:02d}.wav").write_bytes(bytes([i]) * (10 + i))
    (d / "orphan.txt").write_text("no wav")  # unpaired → skipped
    (d / "noise.wav").write_bytes(b"\0")  # unpaired → skipped

    register_pair_source(spark)
    df = (
        spark.read.format("asr_pairs")
        .option("numPartitions", "3")
        .load(str(d))
    )
    rows = {r.stem: r for r in df.collect()}
    assert set(rows) == {f"s{i:02d}" for i in range(7)}
    assert df.rdd.getNumPartitions() == 3
    for i in range(7):
        r = rows[f"s{i:02d}"]
        assert r.pair_id == i  # sorted-stem order, deterministic
        assert r.transcript == f"transcript {i}"
        assert bytes(r.audio) == bytes([i]) * (10 + i)
        assert r.audio_size == 10 + i
    # prefix pushdown: planning-time pruning, not a post-filter
    few = (
        spark.read.format("asr_pairs")
        .option("stem_prefix", "s0")
        .load(str(d))
    )
    assert {r.stem for r in few.collect()} == {f"s0{i}" for i in range(7)}
