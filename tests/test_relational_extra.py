"""Pandas-recomputation pin for the rows-only correlated subquery."""

from __future__ import annotations


def test_correlated_min_subquery_matches_pandas(spark, sf_dir):
    from asr_training_data_pipeline_spark.api import REGISTRY

    got = REGISTRY["correlated_min_subquery"].fn(spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    ps = (
        li.groupby(["l_partkey", "l_suppkey"], as_index=False)["l_extendedprice"]
        .min()
        .rename(columns={"l_extendedprice": "cost"})
    )
    ps["min_cost"] = ps.groupby("l_partkey")["cost"].transform("min")
    expect = ps[ps.cost == ps.min_cost]
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").toPandas().s_suppkey
    part = spark.read.parquet(f"{sf_dir}/part.parquet").toPandas().p_partkey
    expect = expect[
        expect.l_suppkey.isin(set(sup)) & expect.l_partkey.isin(set(part))
    ]
    assert len(got) == len(expect)
    g = got.sort_values(["p_partkey", "s_suppkey"]).reset_index(drop=True)
    e = expect.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)
    assert (g.p_partkey.to_numpy() == e.l_partkey.to_numpy()).all()
    assert (g.ps_supplycost.to_numpy() == e.cost.to_numpy()).all()


def test_approx_stats_within_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.api import REGISTRY

    approx = REGISTRY["approx_stats_orders"].fn(spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        )
        .toPandas()
        .set_index("o_orderstatus")
    )
    for _, r in approx.iterrows():
        e = exact.loc[r.o_orderstatus]
        assert abs(r.approx_custs - e.n_custs) <= max(5, 0.05 * e.n_custs)
        assert abs(r.approx_median - e["median"]) <= 0.01 * e["median"] + 1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_semi_join_plan_shape(spark, sf_dir):
    """The EXISTS shape must stay a left-semi join (never duplicating
    orders rows) with the date filter pushed into the orders scan."""
    from asr_training_data_pipeline_spark.api import REGISTRY

    plan = _plan(REGISTRY["q4_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed to parquet


def test_q18_partial_agg_plan_shape(spark, sf_dir):
    """The quantity rollup must partial-aggregate map-side (the
    exchange carries per-orderkey partials, not raw lineitems)."""
    from asr_training_data_pipeline_spark.api import REGISTRY

    plan = _plan(REGISTRY["q18_large_volume"].fn(spark, sf_dir))
    assert "partial_sum" in plan
    assert "LeftSemi" in plan


def test_moving_avg_range_frame_single_pass(spark, sf_dir):
    """The trailing-window mean must be a Window over one exchange on
    user_id — no self-join, no extra shuffle."""
    from asr_training_data_pipeline_spark.api import REGISTRY

    plan = _plan(REGISTRY["moving_avg_range_frame"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") >= 1
    assert "specifiedwindowframe(RangeFrame" in plan


def test_funnel_stage_zero_user_not_dropped(spark):
    """A user with events but no 'view' must appear as stage 0 (the
    oracle's ELSE branch) — regression for the dropped-row divergence."""
    import datetime
    import unittest.mock as mock

    import asr_training_data_pipeline_spark.queries as qq

    ev = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0), "view"),
            (1, datetime.datetime(2024, 1, 1, 1, 0), "click"),
            (2, datetime.datetime(2024, 1, 1, 0, 0), "click"),
            (2, datetime.datetime(2024, 1, 1, 2, 0), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    with mock.patch.object(qq, "load_table", lambda s, d, n: ev):
        rows = {r.user_id: r for r in qq.funnel_stages(spark, "x").collect()}
    assert rows[1].stage == 2 and rows[1].purchase_us is None
    assert rows[2].stage == 0
    assert rows[2].view_us is None and rows[2].click_us is None
