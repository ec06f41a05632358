"""Semantic tests for the corpus-curation operators — the oracle
parity suite (test_oracle_parity) proves value equality; these pin the
operator SEMANTICS (redaction completeness, sampling determinism and
stratum rates, contamination direction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY


def test_pii_scrub_removes_all_matches(spark, sf_dir):
    df = REGISTRY["pii_scrub"].fn(spark, sf_dir)
    from asr_training_data_pipeline_spark.operators.curation import (
        _RE_EMAIL,
        _RE_IP,
        _RE_PHONE,
    )

    leftovers = df.filter(
        F.col("clean_text").rlike(_RE_EMAIL)
        | F.col("clean_text").rlike(_RE_IP)
        | F.col("clean_text").rlike(_RE_PHONE)
    ).count()
    assert leftovers == 0
    # every row carries the synthetic PII → every row redacts ≥1 of each
    agg = df.agg(
        F.min("n_emails"), F.min("n_ips"), F.min("n_phones"), F.count("*")
    ).first()
    assert agg[0] >= 1 and agg[1] >= 1 and agg[2] >= 1 and agg[3] > 0
    assert df.filter(~F.col("clean_text").contains("<EMAIL>")).count() == 0


def test_stratified_sample_deterministic_and_stratified(spark, sf_dir):
    from asr_training_data_pipeline_spark.operators.curation import _RATES

    q = REGISTRY["stratified_sample"].fn
    a = {r.doc_id for r in q(spark, sf_dir).collect()}
    b = {r.doc_id for r in q(spark, sf_dir).collect()}
    assert a == b and len(a) > 0  # exact reproducibility
    # realized rate per stratum within ±20pp of the target (small n)
    from asr_training_data_pipeline_spark.sources.tables import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = {
        r.lang: r.n
        for r in q(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        rate = 100.0 * kept.get(lang, 0) / total
        assert abs(rate - _RATES[lang]) < 20, (lang, rate)


def test_contamination_direction(spark, sf_dir):
    """A doc sharing shingles with the benchmark set scores > one that
    does not; benchmark docs themselves are excluded from the output."""
    from asr_training_data_pipeline_spark.operators.curation import _CONTAM_MOD

    df = REGISTRY["contamination_check"].fn(spark, sf_dir)
    assert df.filter(F.col("doc_id") % _CONTAM_MOD == 0).count() == 0
    rows = df.collect()
    assert all(0 <= r.contaminated_frac <= 1 for r in rows)
    assert any(r.n_contaminated > 0 for r in rows)
    for r in rows:
        assert r.is_contaminated == (r.contaminated_frac >= 0.05)


def test_repetition_flags_synthetic_loop(spark, sf_dir):
    """A degenerate looped document must flag; signals are bounded."""
    from asr_training_data_pipeline_spark.operators.curation import (
        repetition_signals,
    )
    import asr_training_data_pipeline_spark.operators.curation as cur

    df = REGISTRY["repetition_signals"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(0 <= r.dup_word_frac < 1 for r in rows)
    assert all(r.top_word_frac > 0 for r in rows)
    # synthetic degenerate doc through the same column logic
    loop = spark.createDataFrame(
        [(1, "spam ham " * 50), (2, "a b c d e f g h i j k l m n o p q r s t")],
        "doc_id long, text string",
    )
    import unittest.mock as mock

    with mock.patch.object(cur, "load_table", lambda s, d, n: loop):
        out = {r.doc_id: r for r in repetition_signals(spark, "x").collect()}
    assert out[1].is_repetitive
    assert not out[2].is_repetitive


def test_pack_sequences_stream_contiguity(spark, sf_dir):
    """Within each (lang, shard) stream: offsets are contiguous
    (stream_start == previous doc's stream_start + n_tokens) and chunk
    spans follow from pure integer arithmetic."""
    from asr_training_data_pipeline_spark.operators.curation import _PACK_CHUNK

    rows = (
        REGISTRY["pack_sequences"].fn(spark, sf_dir)
        .orderBy("lang", "shard", "doc_id")
        .collect()
    )
    assert rows
    pos = {}
    for r in rows:
        key = (r.lang, r.shard)
        assert r.stream_start == pos.get(key, 0)
        pos[key] = r.stream_start + r.n_tokens
        assert r.first_chunk == r.stream_start // _PACK_CHUNK
        assert r.last_chunk == (r.stream_start + r.n_tokens - 1) // _PACK_CHUNK
        assert r.chunks_spanned == r.last_chunk - r.first_chunk + 1
    assert any(r.chunks_spanned > 1 for r in rows)  # chunk cuts do happen


def test_dedup_incremental_semantics(spark, sf_dir):
    """keep ⟺ not a corpus dup and first holder of the key in-batch;
    every incoming doc appears exactly once."""
    from asr_training_data_pipeline_spark.operators.curation import _INC_MOD

    rows = REGISTRY["dedup_incremental"].fn(spark, sf_dir).collect()
    assert rows and all(r.doc_id % _INC_MOD == 0 for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        assert r.keep == ((not r.is_corpus_dup) and (not r.is_batch_dup))
    assert any(r.is_corpus_dup for r in rows)  # the split straddles dup groups


def test_mixture_weights_semantics(spark, sf_dir):
    """Shares sum to 1; weights are capped; upsampling direction is
    right (below-target strata get weight > 1)."""
    from asr_training_data_pipeline_spark.operators.curation import _MIX_MAX_WEIGHT

    rows = REGISTRY["mixture_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 < r.sampling_weight <= _MIX_MAX_WEIGHT
        if r.token_share < r.target_share / _MIX_MAX_WEIGHT:
            assert r.sampling_weight == _MIX_MAX_WEIGHT
        elif r.token_share < r.target_share:
            assert r.sampling_weight > 1.0
        else:
            assert r.sampling_weight <= 1.0


def test_bottomk_sample_exact_k_and_deterministic(spark, sf_dir):
    """Every stratum with ≥k docs must yield exactly k rows (the margin
    pre-filter must not truncate), smaller strata yield all their docs,
    ranks are the hash order, and reruns pick identical rows."""
    from asr_training_data_pipeline_spark.operators.curation import _BK_K

    s1 = REGISTRY["bottomk_sample_per_lang"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_per_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, grp in s1.groupby("lang"):
        assert len(grp) == min(_BK_K, n_per_lang[lang]), lang
        ordered = grp.sort_values("sample_rank")
        assert ordered.bucket.is_monotonic_increasing
        assert list(ordered.sample_rank) == list(range(1, len(grp) + 1))
    s2 = REGISTRY["bottomk_sample_per_lang"].fn(spark, sf_dir).toPandas()
    assert s1.equals(s2)


def test_unigram_perplexity_consistency(spark, sf_dir):
    """Scores must be positive, perplexity must equal exp(score), the
    low-quality flag must agree with the 7-nat threshold, and every
    non-empty document must be scored exactly once."""
    import math

    p = REGISTRY["unigram_perplexity"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_nonempty = docs.filter(F.size(F.split("text", " ")) > 0).count()
    assert len(p) == n_nonempty == p.doc_id.nunique()
    assert (p.avg_neglogp > 0).all()
    for r in p.itertuples():
        assert math.isclose(r.perplexity, math.exp(r.avg_neglogp), rel_tol=1e-3)
        # flag decided on the exact integer scale; the rounded double
        # only disagrees within rounding distance of the cut
        if abs(r.avg_neglogp - 7.0) > 1e-5:
            assert r.is_low_quality == (r.avg_neglogp > 7.0)


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Funnel counts must be monotone non-increasing, chain stage to
    stage (n_out[k] == n_in[k+1]), start from the joined population,
    and each stage must agree with n_dropped/pass_rate."""
    f = REGISTRY["curation_funnel"].fn(spark, sf_dir).toPandas().sort_values("stage")
    assert list(f.gate) == ["length", "diversity", "quality", "perplexity", "dedup"]
    for prev, nxt in zip(f.itertuples(), list(f.itertuples())[1:]):
        assert prev.n_out == nxt.n_in
    for r in f.itertuples():
        assert 0 <= r.n_out <= r.n_in
        assert r.n_dropped == r.n_in - r.n_out
        if r.n_in > 0:
            assert abs(r.pass_rate - r.n_out / r.n_in) < 1e-6
    # the fixture must exercise the funnel non-trivially
    assert f.iloc[-1].n_out < f.iloc[0].n_in


def test_train_test_split_deterministic_and_disjoint(spark, sf_dir):
    """Every document gets exactly one split, proportions are near
    80/10/10, and reruns produce identical assignments."""
    s1 = REGISTRY["train_test_split"].fn(spark, sf_dir).toPandas()
    n = len(s1)
    assert n == s1.doc_id.nunique()
    frac = s1.split.value_counts(normalize=True)
    assert 0.7 < frac.get("train", 0) < 0.9
    assert 0.05 < frac.get("valid", 0) < 0.16
    assert 0.05 < frac.get("test", 0) < 0.16
    s2 = REGISTRY["train_test_split"].fn(spark, sf_dir).toPandas()
    assert s1.equals(s2)
