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
