"""Domain-shaped fixture derivations (FIXTURES.md §B).

The reference's data model — ASR word rows with timings/confidence
and a transcript ("book") token sequence — derived deterministically
from the driver's ``documents`` table with pure column expressions
(xxhash64-seeded pseudo-randomness), so alignment/sessionization/
boundary operators are testable with no audio and no GPU.

Shapes mirror SURVEY.md §1.1:
- ``asr_words(pair_id, idx, text, norm, start, end, confidence)``
  ← ASRWord (/root/reference/claude_research_optimal.py:95-102)
- ``book_tokens(pair_id, pos, norm)`` ← the normalized transcript
  (claude_research_optimal.py:434-438), mutated (drops +
  substitutions) so LCS produces nontrivial equal runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import normalize_word_col
from .tables import load_table


def asr_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per recognized word with synthetic monotone timings.

    Durations 0.1–0.499 s, inter-word gaps 0.05 s with an 0.8 s pause
    every ~11th word (so gap-sessionization splits), confidence
    0.4–1.0 (straddles the 0.6/0.75 adaptive-guard thresholds).
    All driven by xxhash64(pair, token, position) — deterministic
    across runs, partitionings, and engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("idx", "text"),
    )
    h = F.xxhash64("pair_id", "text", "idx")
    dur = 0.1 + F.pmod(h, F.lit(400)).cast("double") / 1000.0
    gap = F.when(F.pmod(h, F.lit(11)) == 0, 0.8).otherwise(0.05)
    conf = 0.4 + F.pmod(h, F.lit(601)).cast("double") / 1000.0
    w = W.partitionBy("pair_id").orderBy("idx")
    step = (dur + gap).alias("step")
    out = (
        toks.withColumn("dur", dur)
        .withColumn("step", step)
        .withColumn(
            "start",
            F.coalesce(
                F.sum("step").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .withColumn("end", F.col("start") + F.col("dur"))
        .withColumn("confidence", conf)
        .withColumn("norm", normalize_word_col("text"))
        .filter(F.col("norm").isNotNull())
    )
    # The reference assigns idx AFTER dropping empty-norm words
    # (claude_research_optimal.py:255-277), so idx is a dense 0..n-1
    # position; renumber post-filter to match (timings still advance
    # over dropped tokens, as there).
    out = out.withColumn(
        "idx", F.row_number().over(W.partitionBy("pair_id").orderBy("idx")) - 1
    )
    return out.select("pair_id", "idx", "text", "norm", "start", "end", "confidence")


def book_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcript side: same token stream, ~1/7 dropped and ~1/13
    substituted, then re-numbered — yielding LCS equal runs of varied
    length around the reference's min_run=4 default."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "text"),
    )
    hdrop = F.xxhash64("pair_id", "text", "pos0", F.lit("bookdrop"))
    hsub = F.xxhash64("pair_id", "text", "pos0", F.lit("booksub"))
    kept = toks.filter(F.pmod(hdrop, F.lit(7)) != 0)
    mutated = kept.withColumn(
        "norm_raw",
        F.when(F.pmod(hsub, F.lit(13)) == 0, F.reverse(F.col("text"))).otherwise(
            F.col("text")
        ),
    ).withColumn("norm", normalize_word_col("norm_raw"))
    w = W.partitionBy("pair_id").orderBy("pos0")
    return (
        mutated.filter(F.col("norm").isNotNull())
        .withColumn("pos", F.row_number().over(w) - 1)
        .select("pair_id", "pos", "norm")
    )


def audio_samples(spark: SparkSession, sf_dir: str, frame_rate: int = 16000) -> DataFrame:
    """Synthetic PCM per pair: a deterministic waveform whose length
    matches the pair's last ASR word end time — enough to exercise
    slice/fade/silence/assembly operators on ``array<float>``.

    Sample i = sin-ish triangle from xxhash64(pair, i div 1000) —
    cheap, deterministic, non-constant. Built lazily as a column
    expression (one sequence + transform), never collected.
    """
    words = asr_words(spark, sf_dir)
    spans = words.groupBy("pair_id").agg(
        F.max("end").alias("t_end"), F.count("*").alias("n_words")
    )
    n_samples = F.ceil(F.col("t_end") * frame_rate).cast("long")
    # triangle wave with pair-seeded phase; amplitude in [-1, 1)
    samples = F.transform(
        F.sequence(F.lit(0).cast("long"), n_samples - 1),
        lambda i: (
            F.pmod(i + F.pmod(F.xxhash64(F.col("pair_id")), F.lit(997)), F.lit(200))
            - 100
        ).cast("double")
        / 100.0,
    )
    return spans.select(
        "pair_id",
        F.lit(frame_rate).alias("frame_rate"),
        samples.alias("samples"),
        "n_words",
    )
