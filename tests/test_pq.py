"""PQ quality properties beyond oracle parity: the two-stage re-rank
must recover accuracy the codes-only ADC ranking loses, and its output
must stay within the ADC shortlist (the production contract: stage 2
never looks outside stage 1's candidates)."""

from __future__ import annotations

import duckdb

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.similarity import (
    _PQ_RERANK,
    _VALID_WHERE,
)

_GT_SQL = f"""
WITH v AS (SELECT vec_id,
                  [cast(floor(x * 1000000 + 0.5) AS bigint)
                   for x in cast(embedding AS double[])] AS qe
           FROM '{{sf}}/embeddings.parquet' WHERE {_VALID_WHERE})
SELECT query_id, neighbor_id FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           cast(list_dot_product(v.qe, v.qe)
                - 2 * list_dot_product(v.qe, q.qe)
                + list_dot_product(q.qe, q.qe) AS bigint), v.vec_id) AS rn
  FROM (SELECT * FROM v WHERE vec_id < 8) q, v
  WHERE v.vec_id <> q.vec_id)
WHERE rn <= 5
"""


def _recall(df, gtset) -> float:
    pairs = {(int(r.query_id), int(r.neighbor_id)) for r in df.collect()}
    return len(pairs & gtset) / len(gtset)


def test_rerank_recovers_recall(spark, sf_dir):
    """Exact re-rank of the ADC shortlist must strictly improve (or at
    worst match) recall@5 vs the codes-only ranking, and clear a floor
    that codes alone (measured 0.275) cannot."""
    gt = duckdb.sql(_GT_SQL.format(sf=sf_dir)).fetchall()
    gtset = {(int(a), int(b)) for a, b in gt}
    adc = _recall(REGISTRY["ann_pq_topk"].fn(spark, sf_dir), gtset)
    rr = _recall(REGISTRY["ann_pq_rerank"].fn(spark, sf_dir), gtset)
    assert rr >= adc
    assert rr >= 0.5, (adc, rr)


def test_rerank_stays_inside_shortlist(spark, sf_dir):
    """Stage-2 results must be a subset of stage-1's top-R candidates
    per query — the re-rank never re-scans the corpus."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    topk = REGISTRY["ann_pq_topk"].fn(spark, sf_dir)
    # re-derive the full shortlist (the registered query truncates to
    # TOPK, so recompute rank over the same scored stream is overkill;
    # instead assert against rank <= R of the ADC ordering by reusing
    # the oracle-checked query at its natural size)
    rr = REGISTRY["ann_pq_rerank"].fn(spark, sf_dir).collect()
    from asr_training_data_pipeline_spark.operators.similarity import _pq_scored

    _sub, scored, _q = _pq_scored(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    shortlist = {
        (int(r.query_id), int(r.neighbor_id))
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_RERANK)
        .collect()
    }
    for r in rr:
        assert (int(r.query_id), int(r.neighbor_id)) in shortlist


def test_rerank_d2_monotone_in_rank(spark, sf_dir):
    """Within a query the exact distances must be non-decreasing with
    rank (ties broken by neighbor_id ascending)."""
    rows = REGISTRY["ann_pq_rerank"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r.query_id), []).append(r)
    assert by_q
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        for a, b in zip(rs, rs[1:]):
            assert (a.d2, a.neighbor_id) < (b.d2, b.neighbor_id)


def test_pq_argmin_float64_matches_integer_reference():
    """The kernel's float64-BLAS d2 must pick the SAME centroid as
    exact integer arithmetic with the (d2 asc, book-order asc)
    tie-break, including engineered exact ties and domain-extreme
    magnitudes (the docstring's sub-2^48-dot exactness claim, tested
    directly rather than trusted)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from asr_training_data_pipeline_spark.operators.similarity import (
        _PQ_DSUB,
        _pq_argmin_np,
    )

    lim = 2_000_000  # fixed-point domain bound (scale·|x|max)
    vec = st.lists(
        st.integers(min_value=-lim, max_value=lim),
        min_size=_PQ_DSUB, max_size=_PQ_DSUB,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        xs=st.lists(vec, min_size=1, max_size=6),
        cs=st.lists(vec, min_size=1, max_size=8),
        dup=st.booleans(),
    )
    def check(xs, cs, dup):
        if dup:  # engineered exact tie: duplicate the first centroid
            cs = [cs[0]] + cs
        X = np.array(xs, dtype=np.int64)
        C = np.array(cs, dtype=np.int64)
        got = _pq_argmin_np(X, C)
        for row, g in zip(xs, got):
            d2s = [
                sum((x - c) * (x - c) for x, c in zip(row, cv)) for cv in cs
            ]
            want = min(range(len(cs)), key=lambda k: (d2s[k], k))
            assert int(g) == want, (d2s, int(g), want)

    check()


def test_pq_magnitude_gate_excludes_overflow_rows(spark, sf_dir, tmp_path):
    """Elements inside the general embedding domain (|x| ≤ 1e6) but
    outside the PQ window (|x| ≤ 2) would push fixed-point dots past
    2^53, where float64 summation order makes the two engines
    legitimately diverge — so BOTH scans must exclude such rows, and
    with the gate in place the oracle comparison must stay hash-exact
    even with an adversarial near-1e6 row injected."""
    import shutil

    import duckdb

    from asr_training_data_pipeline_spark.api import REGISTRY, oracles
    from asr_training_data_pipeline_spark.operators.similarity import (
        _EMB_DIM,
    )
    from asr_training_data_pipeline_spark.testing import (
        compare_frames,
        run_oracle,
    )

    d = tmp_path / "pqgate"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT * FROM '{sf_dir}/embeddings.parquet'
  UNION ALL
  SELECT 999999 AS vec_id,
         [CASE WHEN i % 2 = 0 THEN 999983.0 ELSE -999983.0 END::FLOAT
          for i in range({_EMB_DIM})] AS embedding,
         'adv' AS label
) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
""")
    for name in ("ann_pq_topk", "ann_pq_rerank"):
        spdf = REGISTRY[name].fn(spark, str(d)).toPandas()
        compare_frames(spdf, run_oracle(oracles()[name], str(d)), name)
        assert 999999 not in set(spdf.neighbor_id)
