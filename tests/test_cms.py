"""Count-Min sketch guarantees beyond oracle parity: one-sidedness
(estimate never undercounts — the property every CMS consumer relies
on), the d·w counter budget, and conservation (each hash row's cells
sum to exactly N, the token total)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.text_analysis import (
    _CMS_D,
    _CMS_W,
)


def test_cms_never_undercounts(spark, sf_dir):
    df = REGISTRY["cms_word_counts"].fn(spark, sf_dir).toPandas()
    assert len(df) > 0
    assert (df.cms_est >= df.exact_cnt).all()
    # the fixture's 31-word vocab over 16 cells guarantees collisions —
    # a sketch with zero overestimate everywhere would mean the probe
    # is accidentally reading exact counts
    assert (df.overestimate > 0).any()


def test_cms_rows_conserve_mass(spark, sf_dir):
    """Every hash row distributes the SAME token stream: its cells
    must sum to the exact token total, and the grid stays within the
    d·w budget."""
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    n = toks.count()
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _cms_pos_col,
    )

    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_pos_col(F.col("w"), j).alias("p"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("x")
    ).select("x.j", "x.p")
    counters = cells.groupBy("j", "p").count()
    assert counters.count() <= _CMS_D * _CMS_W
    per_row = {int(r.j): int(r.s) for r in
               counters.groupBy("j").agg(F.sum("count").alias("s")).collect()}
    assert set(per_row) == set(range(_CMS_D))
    assert all(v == n for v in per_row.values())


def test_cms_probe_joins_broadcast(spark, sf_dir):
    """The counter grid must reach the probe by broadcast — a
    sort-merge join here would shuffle the probe stream for a ≤ d·w
    row table."""
    df = REGISTRY["cms_word_counts"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_cms_build_stages_md5_once(spark, sf_dir):
    """The token-stream build must compute md5 ONCE per token in its
    own projection (lambda/array bodies get no CSE — unstaged, the 4
    per-cell recomputations measured 7.5× the query wall at 27 M
    tokens). The probe side may inline its md5s: it runs over the
    ≤ vocab-sized exact-count frame."""
    import re

    df = REGISTRY["cms_word_counts"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"Project \[md5\(.*\) AS hx", plan), plan[:2000]
