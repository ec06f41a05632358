"""CLI entry-point round-trips (SURVEY §3.1-3.2 entry surfaces):
``--data`` (dataset mode) and ``--pairs`` (the batch wrapper's
audio,transcript manifest, J5 positional pairing)."""

from __future__ import annotations

import json
import os

from asr_training_data_pipeline_spark.cli import main


def test_cli_data_mode(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main(
        ["--data", sf_dir, "--outdir", out, "--limit_pairs", "4"],
        spark=spark,
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] > 0
    assert summary["files_written"] > 0
    assert summary["params"]["min_run"] == 4
    assert os.path.isdir(os.path.join(out, "clips"))
    assert os.path.exists(os.path.join(out, "summary.json"))


def test_cli_pairs_mode(spark, tmp_path, capsys):
    t1 = tmp_path / "t1.txt"
    t2 = tmp_path / "t2.txt"
    words = "the quick brown fox jumps over the lazy dog " * 8
    t1.write_text(words + "alpha beta gamma delta epsilon zeta")
    t2.write_text("one two three four five six seven eight " * 6)
    out = str(tmp_path / "out_pairs")
    rc = main(
        ["--pairs", f"a1.wav,{t1}", str(t2), "--outdir", out, "--min_dur", "0.5"],
        spark=spark,
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] > 0
    txts = [f for f in os.listdir(os.path.join(out, "clips")) if f.endswith(".txt")]
    assert txts, "pairs mode wrote no clip transcripts"
    body = open(os.path.join(out, "clips", sorted(txts)[0])).read()
    assert body.strip() != ""


def test_cli_requires_input(capsys):
    assert main(["--outdir", "/tmp/x"]) == 2


def test_cli_list_queries(capsys):
    from asr_training_data_pipeline_spark.cli import main

    assert main(["--list-queries"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) > 100
    assert any(l.startswith("word_coverage\toracle") for l in lines)


def test_cli_query_runner(spark, sf_dir, capsys):
    import json

    from asr_training_data_pipeline_spark.cli import main

    assert main(["--query", "word_coverage", "--data", sf_dir], spark=spark) == 0
    out = capsys.readouterr().out.strip()
    rows = [json.loads(l) for l in out.splitlines() if l.strip()]
    assert rows and "word" in rows[0]

    assert main(["--query", "nope", "--data", sf_dir], spark=spark) == 2
