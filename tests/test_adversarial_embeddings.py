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
    "ann_pq_topk",
    "ann_pq_rerank",
    "profile_embeddings",
    "embedding_drift",
    "dedup_semantic",
    "dedup_semantic_clustered",
    "corpus_curation_multimodal",
    # r9: the greedy coreset runs on the same valid-gated domain; the
    # zero vector is quarantined, duplicates (vec_id 1/2) can never
    # both become centers (md2 > 0 acceptance), denormals are valid
    "kcenter_coreset",
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


# ---------------------------------------------------------------------
# Harder fixture: NaN / ±Inf elements, degenerate all-equal vectors,
# and 2^53-adjacent vec_ids (the double-collision pair 2^53 / 2^53+1 —
# an engine that routed ids through float64 would merge them). The
# similarity family's scan filter must quarantine the non-finite rows
# on BOTH engines (an unfiltered plan would abort under ANSI on the
# fixed-point casts) and everything downstream must stay hash-exact.
# ---------------------------------------------------------------------

_P53 = 2**53

_HARD_EMB_SQL = f"""
SELECT CASE WHEN vec_id = 498 THEN {_P53}
            WHEN vec_id = 499 THEN {_P53 + 1}
            ELSE vec_id END AS vec_id,
       CASE
         WHEN vec_id = 0 THEN ['nan'::FLOAT for i in range(1,65)]
         WHEN vec_id = 1 THEN [CASE WHEN i = 1 THEN 'infinity'::FLOAT
                                    ELSE 0.5::FLOAT END for i in range(1,65)]
         WHEN vec_id = 2 THEN [CASE WHEN i = 64 THEN '-infinity'::FLOAT
                                    ELSE 0.5::FLOAT END for i in range(1,65)]
         WHEN vec_id = 3 THEN [0.25::FLOAT for i in range(1,65)]
         WHEN vec_id = 4 THEN [0.0::FLOAT for i in range(1,65)]
         WHEN vec_id = 5 THEN [0.25::FLOAT for i in range(1,65)]
         WHEN vec_id = 6 THEN [1e-30::FLOAT for i in range(1,65)]
         WHEN vec_id = 7 THEN [CASE WHEN i = 2 THEN 'nan'::FLOAT
                                    ELSE embedding[i] END for i in range(1,65)]
         ELSE embedding
       END AS embedding,
       label
FROM '{{src}}/embeddings.parquet'
"""

HARD_QUERIES = QUERIES + ["kmeans_embeddings"]


@pytest.fixture(scope="module")
def hard_emb_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_emb_hard_")
    duckdb.sql(
        f"COPY ({_HARD_EMB_SQL.format(src=sf_dir)}) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", HARD_QUERIES)
def test_hard_emb_oracle_parity(spark, hard_emb_dir, name):
    spark.catalog.clearCache()
    spdf = REGISTRY[name].fn(spark, hard_emb_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], hard_emb_dir), name)


def test_hard_validation_flags_non_finite(spark, hard_emb_dir):
    v = REGISTRY["validate_embeddings"].fn(spark, hard_emb_dir).toPandas()
    bad = {0, 1, 2, 4, 7}  # NaN-vec, +Inf, -Inf, zero-norm, NaN-element
    assert set(v[~v.is_valid].vec_id) == bad
    # the 2^53 / 2^53+1 pair must stay DISTINCT rows (no float merge)
    assert {_P53, _P53 + 1} <= set(v.vec_id.astype("int64"))


# ---------------------------------------------------------------------
# Events-side adversarial layout: a degenerate all-equal time dimension
# plus snowflake-scale ids — the id RANGE (~2^53) used to overflow the
# 16-bit min-max normalization's ×65535 in bigint and abort the layout
# job under ANSI; it now runs in decimal/hugeint on both engines.
# ---------------------------------------------------------------------

_HARD_EVENTS_SQL = f"""
SELECT CASE WHEN event_id = 996 THEN {_P53}
            WHEN event_id = 997 THEN {_P53 + 1}
            ELSE event_id END AS event_id,
       TIMESTAMP '2024-06-01 12:00:00' AS ts,
       CASE WHEN event_id = 998 THEN {_P53}
            WHEN event_id = 999 THEN {_P53 + 1}
            ELSE user_id END AS user_id,
       event_type, value, props
FROM '{{src}}/events.parquet'
"""


@pytest.fixture(scope="module")
def hard_events_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_events_hard_")
    duckdb.sql(
        f"COPY ({_HARD_EVENTS_SQL.format(src=sf_dir)}) "
        f"TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", ["zorder_layout_events", "sessionize_events"])
def test_hard_events_oracle_parity(spark, hard_events_dir, name):
    spark.catalog.clearCache()
    spdf = REGISTRY[name].fn(spark, hard_events_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], hard_events_dir), name)
