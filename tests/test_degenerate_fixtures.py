"""Degenerate-corpus oracle parity (VERDICT r6 task 7): the r6
operator wave under fixtures that collapse a dimension the driver
fixture always keeps healthy —

- a MONOCULTURE corpus (every doc the same single token): one 100%
  heavy hitter, a single CMS key, one BPE word type, a single-language
  classifier, and a CONSTANT-LABEL / COLLINEAR GLM design (x1 ≡ 1,
  x2 ≡ 0 ⇒ det = 0 ⇒ the documented NULL path) — now carrying the
  oracle's signature, not just the docstring's word;
- an ALL-DISTINCT corpus (every doc a unique hapax token): zero heavy
  hitters, an all-ones CMS grid, tie-dense BPE pair counts;
- a SCORE-ONLY split (every doc_id ≡ 0 mod 5): langid_trained with an
  EMPTY training split must emit an empty frame on both engines, not
  crash;
- a FEW-SEEDS embedding table: NaN rows among vec_id < K leave the PQ
  codebooks with fewer than K codes and shrink the query set — the
  seeding/encode/ADC chain must stay hash-exact.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_OTHER = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
)

_MONO_SQL = """
SELECT i AS doc_id, 'tok' AS text, 'en' AS lang,
       'src' || (i % 3) AS source, 3 AS n_chars
FROM unnest(range(1, 21)) AS t(i)
"""

_DISTINCT_SQL = """
SELECT i AS doc_id, 'w' || i AS text,
       ['en','de','fr','es','zh'][(i % 5) + 1] AS lang,
       'src' || (i % 3) AS source, cast(length('w' || i) AS bigint) AS n_chars
FROM unnest(range(1, 51)) AS t(i)
"""

_SCORE_ONLY_SQL = """
SELECT i * 5 AS doc_id, 'some text to classify here' AS text,
       ['en','de'][(i % 2) + 1] AS lang, 'src1' AS source, 26 AS n_chars
FROM unnest(range(1, 11)) AS t(i)
"""

MONO_QUERIES = [
    "cms_word_counts",
    "heavy_hitter_words",
    "bpe_merges",
    "bpe_vocab",
    "langid_trained",
    "linreg_closed_form",
    "logreg_irls_probe",
    "unigram_perplexity",
    # r9: one lang makes the DSIR target = the whole corpus (λ ≡ 0,
    # every weight exactly zero) and the PSI halves token-identical
    # (every term exactly zero) — the all-zero paths must still be
    # hash-exact
    "dsir_importance_weights",
    "token_psi_drift",
]

DISTINCT_QUERIES = [
    "cms_word_counts",
    "heavy_hitter_words",
    "bpe_merges",
    "bpe_vocab",
    "dsir_importance_weights",
    "token_psi_drift",
]


def _doc_fixture(sf_dir: str, docs_sql: str) -> str:
    d = tempfile.mkdtemp(prefix="degen_sf_")
    duckdb.sql(f"COPY ({docs_sql}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    for t in _OTHER + ("embeddings",):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def mono_dir(sf_dir):
    return _doc_fixture(sf_dir, _MONO_SQL)


@pytest.fixture(scope="module")
def distinct_dir(sf_dir):
    return _doc_fixture(sf_dir, _DISTINCT_SQL)


@pytest.mark.parametrize("name", MONO_QUERIES)
def test_monoculture_oracle_parity(spark, mono_dir, name):
    spdf = REGISTRY[name].fn(spark, mono_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], mono_dir), name)


def test_monoculture_glm_hits_null_path(spark, mono_dir):
    """x1 ≡ 1 makes the design collinear with the intercept and the
    label constant: det = 0, so both GLM probes must emit their NULL
    coefficients (already oracle-matched above), never a crash or a
    garbage solve."""
    lin = REGISTRY["linreg_closed_form"].fn(spark, mono_dir).toPandas()
    assert lin.beta0.isna().all()
    # the IRLS probe's documented det=0 shape: the solve CTE filters
    # det <> 0, so the output is EMPTY (matched by the oracle above)
    log = REGISTRY["logreg_irls_probe"].fn(spark, mono_dir).toPandas()
    assert len(log) == 0


@pytest.mark.parametrize("name", DISTINCT_QUERIES)
def test_all_distinct_oracle_parity(spark, distinct_dir, name):
    spdf = REGISTRY[name].fn(spark, distinct_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], distinct_dir), name)


def test_all_distinct_has_no_heavy_hitters(spark, distinct_dir):
    assert len(REGISTRY["heavy_hitter_words"].fn(spark, distinct_dir).toPandas()) == 0


def test_langid_empty_train_split(spark, sf_dir):
    d = _doc_fixture(sf_dir, _SCORE_ONLY_SQL)
    spdf = REGISTRY["langid_trained"].fn(spark, d).toPandas()
    compare_frames(spdf, run_oracle(oracles()["langid_trained"], d), "langid_trained")
    assert len(spdf) == 0  # no profiles → no scored rows, no crash


def test_pq_with_fewer_than_k_valid_seeds(spark, sf_dir):
    """vec_id 1/3/5/6 are NaN rows: only 4 of the K=8 seed slots (and
    4 of the 8 query slots) survive the validity gate, so the PQ
    codebooks train with K'<K codes — seeding, Lloyd refinement,
    encode argmin, and ADC must all stay hash-exact on the shrunken
    book."""
    d = tempfile.mkdtemp(prefix="degen_pq_")
    duckdb.sql(f"""
COPY (
  SELECT vec_id,
         CASE WHEN vec_id IN (1, 3, 5, 6)
              THEN ['nan'::FLOAT for i in range(1, 65)]
              ELSE embedding END AS embedding,
         label
  FROM '{sf_dir}/embeddings.parquet'
) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
""")
    for t in _OTHER + ("documents",):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    for name in ("ann_pq_topk", "ann_pq_rerank"):
        spdf = REGISTRY[name].fn(spark, d).toPandas()
        compare_frames(spdf, run_oracle(oracles()[name], d), name)
        assert set(spdf.query_id) == {0, 2, 4, 7}
