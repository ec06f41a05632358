"""Similarity-search semantics: exact top-k sanity and LSH bucket
behavior (identical vectors collide; buckets partition the set)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.similarity import (
    cosine_col,
    lsh_bucket_col,
)


def test_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(e, dtype=np.float64) for e in emb.embedding])
    ids = emb.vec_id.to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    got = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    for qid in range(8):
        qi = np.where(ids == qid)[0][0]
        scores = mat @ mat[qi] / (norms * norms[qi])
        scores[qi] = -np.inf
        order = np.argsort(-scores, kind="stable")
        expect = [int(ids[i]) for i in order[:5]]
        mine = got[got.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert mine == expect, f"query {qid}: {mine} != {expect}"


def test_lsh_buckets_partition_all_vectors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats = REGISTRY["ann_lsh_buckets"].fn(spark, sf_dir).toPandas()
    assert stats.n_vectors.sum() == emb.count()
    assert (stats.n_vectors > 0).all()


def test_lsh_identical_vectors_same_bucket(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = emb.select(lsh_bucket_col(F.col("embedding")).alias("b")).toPandas()
    b2 = emb.select(lsh_bucket_col(F.col("embedding")).alias("b")).toPandas()
    assert (b1.b == b2.b).all()


def test_cosine_col_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    got = emb.select(
        cosine_col(F.col("embedding"), F.col("embedding")).alias("c")
    ).toPandas()
    assert all(math.isclose(c, 1.0, rel_tol=1e-12) for c in got.c)


def _recall_vs_exact(spark, sf_dir, name, floor):
    exact = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    approx = REGISTRY[name].fn(spark, sf_dir).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        recalls.append(len(e & a) / len(e))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= floor, f"{name} recall {mean_recall:.2f} < {floor}"


def test_lsh_planted_neighbors_collide(spark, sf_dir):
    # The driver embeddings are near-random (top cosine ~0.35), so
    # recall-vs-exact mostly measures scan fraction there. The real
    # LSH contract is: NEAR duplicates collide. Plant perturbed copies
    # (cosine ~0.995) and require most pairs within hamming <= 1 of
    # each other's bucket - the multi-probe radius ann_lsh_topk scans.
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    near = base + 0.05 * rng.standard_normal((40, 64))
    rows = [(i, v.tolist()) for i, v in enumerate(base)] + [
        (1000 + i, v.tolist()) for i, v in enumerate(near)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pdf = df.select("vec_id", lsh_bucket_col(F.col("embedding")).alias("b")).toPandas()
    b = dict(zip(pdf.vec_id, pdf.b))
    hits = sum(
        1 for i in range(40) if bin(b[i] ^ b[1000 + i]).count("1") <= 1
    )
    assert hits >= 30, f"only {hits}/40 planted pairs within probe radius"


def test_lsh_topk_runs_and_scores_exact(spark, sf_dir):
    # Machinery check: every returned candidate is scored identically
    # to the brute-force scorer (same cosine, so scores must agree
    # with the exact query wherever ids overlap).
    exact = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    ap = REGISTRY["ann_lsh_topk"].fn(spark, sf_dir).toPandas()
    merged = ap.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (merged.score_a == merged.score_e).all()


def test_ivf_topk_recall(spark, sf_dir):
    _recall_vs_exact(spark, sf_dir, "ann_ivf_topk", 0.4)


def test_embedding_centroids_semantics(spark, sf_dir):
    """Centroid of each label is the fixed-point mean: a vector equal
    to its own cluster mean scores cos≈1; outliers are a minority and
    the flag agrees with the threshold."""
    import numpy as np

    from asr_training_data_pipeline_spark.api import REGISTRY
    from asr_training_data_pipeline_spark.operators.similarity import (
        _CENTROID_SCALE,
        _OUTLIER_COS,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    df = REGISTRY["embedding_centroids"].fn(spark, sf_dir).toPandas()
    assert df.is_outlier.mean() < 0.25
    # recompute one label's centroid in numpy (fixed-point contract)
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    lbl = int(emb.label.iloc[0])
    sub = np.stack(emb[emb.label == lbl].embedding.to_numpy())
    q = np.floor(sub.astype("f8") * _CENTROID_SCALE + 0.5).astype("i8")
    ce = q.sum(axis=0) / (len(q) * float(_CENTROID_SCALE))
    e0 = sub[0].astype("f8")
    cos = float(e0 @ ce / (np.linalg.norm(e0) * np.linalg.norm(ce)))
    got = float(
        df[df.vec_id == int(emb[emb.label == lbl].vec_id.iloc[0])].centroid_cos.iloc[0]
    )
    assert abs(got - cos) < 1e-6
    # flag agrees with the UNROUNDED score; rounded column may straddle
    near = df[(df.centroid_cos - _OUTLIER_COS).abs() > 1e-5]
    assert (near.is_outlier == (near.centroid_cos < _OUTLIER_COS)).all()


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    """Full 3-iteration Lloyd's replayed in numpy under the same
    deterministic contract (seeds, three-dot distances, fixed-point
    means, low-cid ties) must reproduce the Spark assignment exactly."""
    import numpy as np

    from asr_training_data_pipeline_spark.api import REGISTRY
    from asr_training_data_pipeline_spark.operators.similarity import (
        _CENTROID_SCALE,
        _KM_ITERS,
        _KM_K,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").toPandas().sort_values("vec_id")
    E = np.stack(emb.embedding.to_numpy()).astype("f8")
    Q = np.floor(E * _CENTROID_SCALE + 0.5).astype("i8")
    ids = emb.vec_id.to_numpy()
    C = E[ids < _KM_K].copy()

    def assign(C):
        # three-dot identity per (vector, centroid); ties → lower cid
        d2 = (
            (E * E).sum(1)[:, None]
            - 2 * E @ C.T
            + (C * C).sum(1)[None, :]
        )
        return d2.argmin(1), d2

    for _ in range(_KM_ITERS):
        lab, _ = assign(C)
        for c in range(_KM_K):
            m = lab == c
            if m.any():
                C[c] = Q[m].sum(0) / (m.sum() * float(_CENTROID_SCALE))
    lab, d2 = assign(C)

    got = REGISTRY["kmeans_embeddings"].fn(spark, sf_dir).toPandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    assert (got.cluster.to_numpy() == lab).all()
    assert np.allclose(got.dist2.to_numpy(), np.round(d2[np.arange(len(lab)), lab], 6), atol=2e-6)


def test_sq8_quantization_fidelity(spark, sf_dir):
    """int8 scalar quantization must (a) keep every quantized value in
    [-127, 127], (b) keep high recall vs the exact float top-k, and
    (c) perturb the cosine scores by at most ~1/127 per vector pair."""
    from asr_training_data_pipeline_spark.operators.similarity import (
        sq8_quantize_col,
    )

    emb = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).sparkSession.read.parquet(
        f"{sf_dir}/embeddings.parquet"
    )
    rng = emb.select(
        F.array_max(sq8_quantize_col(F.col("embedding"))).alias("hi"),
        F.array_min(sq8_quantize_col(F.col("embedding"))).alias("lo"),
    ).toPandas()
    assert rng.hi.max() <= 127 and rng.lo.min() >= -127

    _recall_vs_exact(spark, sf_dir, "ann_sq8_topk", 0.8)

    exact = REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    sq8 = REGISTRY["ann_sq8_topk"].fn(spark, sf_dir).toPandas()
    merged = exact.merge(sq8, on=["query_id", "neighbor_id"], suffixes=("_f", "_q"))
    assert not merged.empty
    err = (merged.score_f - merged.score_q).abs()
    assert err.max() < 0.02, f"sq8 cosine off by {err.max()}"


def test_profile_embeddings_matches_numpy(spark, sf_dir):
    """Per-dimension means/extrema must agree with a direct numpy
    computation on the same vectors."""
    import numpy as np

    p = REGISTRY["profile_embeddings"].fn(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    assert len(p) == mat.shape[1]
    q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    np.testing.assert_allclose(
        p.sort_values("dim")["mean"].to_numpy(),
        np.round(q.sum(axis=0) / (mat.shape[0] * 1e6), 9),
        atol=1e-9,
    )
    np.testing.assert_array_equal(
        p.sort_values("dim")["min_val"].to_numpy(), mat.min(axis=0)
    )
    np.testing.assert_array_equal(
        p.sort_values("dim")["max_val"].to_numpy(), mat.max(axis=0)
    )


def test_repeat_invocations_do_not_accrete_caches(spark, sf_dir):
    """Session-lifetime operator caches are slot-held (caching.hold):
    re-invoking a persisting query must REPLACE its cached frames, not
    stack new ones — a long session sweeping the registry repeatedly
    would otherwise leak executor storage (r6 ADVICE)."""
    from asr_training_data_pipeline_spark.api import REGISTRY

    def n_cached() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    for name in ("ann_sq8_topk", "dedup_minhash_lsh"):
        REGISTRY[name].fn(spark, sf_dir).count()
        first = n_cached()
        REGISTRY[name].fn(spark, sf_dir).count()
        assert n_cached() <= first, name
