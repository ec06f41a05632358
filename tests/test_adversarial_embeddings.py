"""Adversarial-embedding oracle parity: zero-norm vectors, exact
duplicates, and denormal magnitudes — the corrupt rows a real encoder
fleet occasionally emits. Under ANSI SQL a single zero vector used to
abort every cosine consumer with DIVIDE_BY_ZERO; the cosine family now
excludes zero-norm vectors scan-side (mirrored in every oracle) and
``validate_embeddings`` reports exactly what was excluded."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_EMB_SQL = """
SELECT vec_id,
       CASE
         WHEN vec_id = 0 THEN [0.0::FLOAT for i in range(1,65)]
         WHEN vec_id = 1 THEN [1.0::FLOAT for i in range(1,65)]
         WHEN vec_id = 2 THEN [1.0::FLOAT for i in range(1,65)]
         WHEN vec_id = 3 THEN [1e-30::FLOAT for i in range(1,65)]
         ELSE embedding
       END AS embedding,
       label
FROM '{src}/embeddings.parquet'
"""

QUERIES = [
    "validate_embeddings",
    "ann_cosine_topk",
    "ann_sq8_topk",
    "embedding_cosine_pairs",
    "embedding_centroids",
    "ann_lsh_topk",
    "ann_lsh_buckets",
    "ann_ivf_topk",
    "profile_embeddings",
    "dedup_semantic",
    "dedup_semantic_clustered",
    "corpus_curation_multimodal",
]


@pytest.fixture(scope="module")
def adversarial_emb_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_emb_")
    duckdb.sql(
        f"COPY ({_EMB_SQL.format(src=sf_dir)}) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_emb_oracle_parity(spark, adversarial_emb_dir, name):
    spdf = REGISTRY[name].fn(spark, adversarial_emb_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], adversarial_emb_dir), name)


def test_validation_flags_exactly_the_bad_rows(spark, adversarial_emb_dir):
    v = REGISTRY["validate_embeddings"].fn(spark, adversarial_emb_dir).toPandas()
    assert not bool(v[v.vec_id == 0].is_valid.iloc[0])  # zero vector
    assert not bool(v[v.vec_id == 0].nonzero_norm.iloc[0])
    # duplicates and denormals are VALID (cosine is defined on them)
    for vid in (1, 2, 3):
        assert bool(v[v.vec_id == vid].is_valid.iloc[0]), vid
    assert v.is_valid.sum() == len(v) - 1
