"""MLlib feature-engineering variants pinned against the engine's
native/exact implementations (operators/mllib_fe.py)."""

from __future__ import annotations

from asr_training_data_pipeline_spark.api import REGISTRY


def _pairs(pdf):
    return set(zip(pdf.doc_a, pdf.doc_b))


def test_mllib_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Every exact pair at jaccard ≥ 0.8 is well inside the 0.5 LSH
    threshold; 16 hash tables must recover nearly all of them, and the
    reported similarity is exact on the recovered pairs."""
    exact = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    got = REGISTRY["mllib_minhash_pairs"].fn(spark, sf_dir).toPandas()
    truth = _pairs(exact)
    found = _pairs(got)
    assert truth, "fixture should contain exact near-dups"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f}"
    # MLlib's distance is Jaccard over the 2^18-dim HASHED vectors, so
    # a rare shingle hash collision can merge two features and nudge
    # the similarity by ~1/|shingles| — compare within that tolerance.
    sim = dict(zip(zip(got.doc_a, got.doc_b), got.jaccard))
    for (a, b), j in zip(zip(exact.doc_a, exact.doc_b), exact.jaccard):
        if (a, b) in sim:
            assert abs(sim[(a, b)] - j) < 0.01, (a, b)


def test_mllib_brp_ann_recall_vs_exact_topk(spark, sf_dir):
    """BRP-LSH top-5 must substantially agree with the exact cosine
    top-5, and scores must match exactly on shared neighbors (the
    distance is exact once a candidate is generated)."""
    exact = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    got = REGISTRY["mllib_brp_ann_topk"].fn(spark, sf_dir).toPandas()
    e = {(q, n) for q, n in zip(exact.query_id, exact.neighbor_id)}
    g = {(q, n) for q, n in zip(got.query_id, got.neighbor_id)}
    recall = len(e & g) / len(e)
    assert recall >= 0.6, f"recall@5 {recall:.2f}"
    es = {(q, n): s for q, n, s in zip(exact.query_id, exact.neighbor_id, exact.score)}
    gs = {(q, n): s for q, n, s in zip(got.query_id, got.neighbor_id, got.score)}
    for k in e & g:
        assert abs(es[k] - gs[k]) < 1e-5, k


def test_mllib_tfidf_features_shape(spark, sf_dir):
    pdf = REGISTRY["mllib_tfidf_features"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_terms > 0).all()
    assert (pdf.l2 > 0).all()
    assert (pdf.max_w >= 0).all()
    # determinism across runs (fixed hashing, no seed dependence)
    pdf2 = REGISTRY["mllib_tfidf_features"].fn(spark, sf_dir).toPandas()
    assert pdf.equals(pdf2)


def test_winnowing_guarantee(spark):
    """Winnowing's defining property: two documents sharing a
    substring of length >= k+w-1 share at least one fingerprint."""
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _WIN_K,
        _WIN_W,
        winnow_fps,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= _WIN_K + _WIN_W - 1
    docs = spark.createDataFrame(
        [(1, "PREFIX-AAA " + shared + " SUFFIX-BBB"),
         (2, "zzz unrelated opening words " + shared),
         (3, "totally different content with no overlap at all here")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in winnow_fps(docs).collect()}
    assert fps[1] & fps[2], "shared substring must produce a shared fingerprint"
