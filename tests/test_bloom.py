"""Bloom-probe semantics beyond oracle parity: the structural
guarantees a user relies on — no false negatives ever, agreement with
the exact incremental path on the "definitely new" side, and the
broadcast-sketch plan shape that makes it the 100 TB ingest primitive."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY


def test_bloom_no_false_negatives(spark, sf_dir):
    """The defining Bloom property: every probe whose key truly exists
    in the corpus MUST be flagged. bloom_calibration computes this
    against the exact hash join — assert the column is zero."""
    row = REGISTRY["bloom_calibration"].fn(spark, sf_dir).collect()[0]
    assert row.n_false_negatives == 0
    assert row.n_flagged >= row.n_true_dups
    assert row.n_probes > 0


def test_bloom_agrees_with_exact_incremental(spark, sf_dir):
    """dedup_incremental uses the same key and split: every doc it
    marks is_corpus_dup must be maybe_dup here (the converse may not
    hold — false positives are the price of the sketch)."""
    exact = (
        REGISTRY["dedup_incremental"].fn(spark, sf_dir)
        .select("doc_id", "is_corpus_dup")
    )
    bloom = REGISTRY["dedup_bloom_probe"].fn(spark, sf_dir)
    # splits differ (mod 5 == 0 vs the bloom batch: also mod 5 == 0),
    # so the inner join keys line up doc-for-doc
    j = exact.join(bloom, "doc_id")
    assert j.count() > 0
    missed = j.filter(F.col("is_corpus_dup") & ~F.col("maybe_dup")).count()
    assert missed == 0


def test_bloom_sketch_is_tiny_and_broadcast(spark, sf_dir):
    """The probe side must reach the sketch by BROADCAST hash join
    (≤256 word rows), never a sort-merge exchange of the batch; and
    the corpus body never rides an exchange — only positions do."""
    df = REGISTRY["dedup_bloom_probe"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    for part in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in part, part


def test_bloom_fill_bound(spark, sf_dir):
    """Sanity on the sketch budget: with n corpus keys and k=2 the
    number of set words can't exceed 2n (and the bitmap never exceeds
    its 256-word frame)."""
    from asr_training_data_pipeline_spark.operators.dedup import (
        _BLOOM_BITS,
        _bloom_frames,
    )

    bitmap, _ = _bloom_frames(spark, sf_dir)
    n_words = bitmap.count()
    assert n_words <= _BLOOM_BITS // 32


def test_streaming_gate_equals_batch_probe(spark, sf_dir):
    """The stateless streaming gate must emit EXACTLY the batch
    probe's frame (the stateless-plan unification guarantee) — this
    equality is the streaming query's oracle, transitively inheriting
    dedup_bloom_probe's DuckDB check."""
    import pandas as pd

    stream = (
        REGISTRY["streaming_bloom_gate"].fn(spark, sf_dir).toPandas()
    )
    batch = REGISTRY["dedup_bloom_probe"].fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        stream.reset_index(drop=True), batch.reset_index(drop=True)
    )
