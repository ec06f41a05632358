"""Cross-engine libm boundary audit (VERDICT r6 task 4).

The micro-quantized LM/GLM operators evaluate one transcendental per
DISTINCT input and floor it onto a fixed-point grid
(``floor(x·S + ½)``), so the per-document/IRLS sums are exact integer
arithmetic. Cross-engine hash-equality then rests on ONE analog
assumption: Spark's (JVM) and DuckDB's libm agree on ln/exp at every
distinct input — a 1-ulp divergence landing exactly on a grid
boundary would shift that entry by one unit and flip the value hash.

This suite makes the assumption auditable: for every distinct
quantization input on the driver fixtures (sf0.001 + sf0.01), the
true value must land at least EPS = 1e-6 grid units away from the
nearest boundary. Since any libm is within ~1 ulp (≲ 3e-9 grid units
at these magnitudes) of the true value, a passing audit PROVES both
engines floor identically on these fixtures — the exactness claim is
then a theorem about the fixture, not an observation. If a future
fixture regeneration fails this audit, the failing operator's oracle
may hash-flicker and needs a tolerance band.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from asr_training_data_pipeline_spark.operators.curation import _LOGREG_SQL
from asr_training_data_pipeline_spark.operators.text_analysis import (
    _BI_BACKOFF,
    _BI_TRAIN_MOD,
    _LM_SCALE,
)

EPS = 1e-6

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _floor_boundary_dist(v: float) -> float:
    """Distance of v + ½ from the nearest integer — how far
    ``floor(v + ½)`` is from flipping."""
    e = v + 0.5
    return abs(e - round(e))


def _docs(sf_dir: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_unigram_lm_inputs_off_boundary(sf_dir):
    """unigram_perplexity: every distinct -ln(cnt/total)·S lands ≥EPS
    from a floor boundary (trained on the full corpus, so the distinct
    inputs are the distinct word counts)."""
    con = _docs(sf_dir)
    rows = con.sql(f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE len(string_split(text, ' ')) > 0
),
freq AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
tot AS (SELECT sum(cnt) AS total FROM freq)
SELECT DISTINCT cnt, total FROM freq, tot
""").fetchall()
    assert rows
    for cnt, total in rows:
        v = -math.log(cnt / total) * _LM_SCALE
        assert _floor_boundary_dist(v) > EPS, (cnt, total, v)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bigram_lm_inputs_off_boundary(sf_dir):
    """bigram_perplexity: unigram table, bigram table, and the two
    constants (OOV, backoff) — every quantization input off-boundary
    on the train split."""
    con = _docs(sf_dir)
    uni = con.sql(f"""
WITH train AS (
  SELECT string_split(lower(text), ' ') AS t FROM documents
  WHERE doc_id % {_BI_TRAIN_MOD} <> 0 AND text IS NOT NULL
),
u AS (SELECT w, count(*) AS cu
      FROM (SELECT unnest(t) AS w FROM train) GROUP BY w),
tot AS (SELECT sum(cu) AS total FROM u)
SELECT DISTINCT cu, total FROM u, tot
""").fetchall()
    assert uni
    total = uni[0][1]
    for cu, tt in uni:
        assert _floor_boundary_dist(-math.log(cu / tt) * _LM_SCALE) > EPS, cu
    assert _floor_boundary_dist(math.log(total + 1) * _LM_SCALE) > EPS
    assert _floor_boundary_dist(-math.log(_BI_BACKOFF) * _LM_SCALE) > EPS
    bi = con.sql(f"""
WITH train AS (
  SELECT string_split(lower(text), ' ') AS t FROM documents
  WHERE doc_id % {_BI_TRAIN_MOD} <> 0 AND text IS NOT NULL
),
u AS (SELECT w, count(*) AS cu
      FROM (SELECT unnest(t) AS w FROM train) GROUP BY w),
bi AS (
  SELECT w1, w2, count(*) AS cb
  FROM (
    SELECT unnest([struct_pack(w1 := t[i], w2 := t[i + 1])
                   for i in range(1, len(t))], recursive := true)
    FROM train
  ) GROUP BY w1, w2
)
SELECT DISTINCT cb, cu FROM bi JOIN u ON u.w = bi.w1
""").fetchall()
    assert bi
    for cb, cu in bi:
        assert _floor_boundary_dist(-math.log(cb / cu) * _LM_SCALE) > EPS, (cb, cu)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_logreg_sigmoid_inputs_off_boundary(sf_dir):
    """logreg_irls_probe: the micro-quantized sigmoid (pu) and working
    response (zu) for every distinct (y, x1, x2, eta) — the only two
    transcendental-fed floors in the IRLS step. Reuses the oracle's
    own CTE prefix so the audited eta IS the oracle's eta."""
    prefix = _LOGREG_SQL.split("q2 AS (")[0].rstrip().rstrip(",")
    con = _docs(sf_dir)
    rows = con.sql(
        prefix + "\nSELECT DISTINCT y, x1, x2, eta FROM s2"
    ).fetchall()
    assert rows
    for y, x1, x2, eta in rows:
        pu_v = 1000.0 / (1.0 + math.exp(-eta))
        assert _floor_boundary_dist(pu_v) > EPS, (y, x1, x2, eta)
        pu = max(1, min(999, math.floor(pu_v + 0.5)))
        zu_v = (eta + (1000 * y - pu) * 1000.0 / (pu * (1000 - pu))) * 1000.0
        assert _floor_boundary_dist(zu_v) > EPS, (y, x1, x2, eta)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bm25_contribs_off_boundary(sf_dir):
    """bm25_topk: every per-(doc, query-term) contribution — the one
    ln() call times the tf normalization, scaled to micro-units —
    lands ≥EPS from a floor boundary on the driver fixtures."""
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _BM25_QTERMS,
        _BM25_SCALE,
        _FOLD_SQL,
    )

    con = _docs(sf_dir)
    rows = con.sql(f"""
WITH toks AS (
  SELECT lang, doc_id, unnest(string_split({_FOLD_SQL}, ' ')) AS w
  FROM documents),
tf AS (SELECT lang, doc_id, w, count(*) AS tf FROM toks GROUP BY ALL),
dl AS (SELECT lang, doc_id, count(*) AS dl FROM toks GROUP BY ALL),
stats AS (SELECT lang, count(*) AS n_docs,
                 cast(sum(dl) AS double)/count(*) AS avgdl
          FROM dl GROUP BY lang),
df AS (SELECT lang, w, count(*) AS df FROM tf GROUP BY ALL),
q AS (SELECT lang, w FROM (
        SELECT lang, w, row_number() OVER (PARTITION BY lang
               ORDER BY df DESC, w) AS rn FROM df) WHERE rn <= {_BM25_QTERMS})
SELECT DISTINCT t.tf, df.df, dl.dl, stats.n_docs, stats.avgdl
FROM tf t
JOIN q ON q.lang = t.lang AND q.w = t.w
JOIN df ON df.lang = t.lang AND df.w = t.w
JOIN dl ON dl.lang = t.lang AND dl.doc_id = t.doc_id
JOIN stats ON stats.lang = t.lang
""").fetchall()
    assert rows
    for tf, dfv, dlv, n, avgdl in rows:
        idf = math.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
        contrib = idf * ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / avgdl)))
        assert _floor_boundary_dist(contrib * _BM25_SCALE) > EPS, (tf, dfv, dlv)
