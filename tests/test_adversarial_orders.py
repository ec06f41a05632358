"""Adversarial-orders oracle parity: NULL, negative, and zero
o_totalprice rows injected into every ~90th order. The relational
family's exactness machinery (decimal-routed sums, explicit casts,
total window orders, coalesce defaults) must hold under dirty
numerics — aggregates skip NULLs identically on both engines, signs
flow through rollup/cube/pivot, and rank ties stay total."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_ORD_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 101 = 0 THEN NULL
            WHEN o_orderkey % 103 = 0 THEN o_custkey + 1000000
            ELSE o_custkey END AS o_custkey,
       o_orderstatus,
       CASE WHEN o_orderkey % 97 = 0 THEN NULL
            WHEN o_orderkey % 89 = 0 THEN -o_totalprice
            WHEN o_orderkey % 83 = 0 THEN 0.0
            ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM '{src}/orders.parquet'
"""

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q18_large_volume",
    "topk_orders_per_cust",
    "conditional_agg_orders",
    "rollup_revenue",
    "cube_quantities",
    "grouping_sets_revenue",
    "pivot_revenue_by_status",
    "percentile_prices",
    "exact_quantiles_orders",
    "cust_order_distribution",
    "ntile_quartiles",
    "corr_qty_price",
    "skew_join_salted",
    "asof_join_orders",
    "correlated_min_subquery",
    "distinct_counts",
    "set_ops_segments",
    "first_match_confidence",
    "group_concat_ordered",
    "avg_confidence_coalesce",
    # r7: NULL custkeys are unscoreable (filtered on both engines);
    # negative monetary sums exercise the offset-before-padding rank
    # key; NULL-only metric groups coalesce to 0
    "rfm_segments",
    # r6: NULL and orphaned o_custkey rows (%101/%103 above) give the
    # integrity audit real findings and stress every custkey join
    "fk_integrity_audit",
]


@pytest.fixture(scope="module")
def adversarial_ord_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_ord_")
    duckdb.sql(
        f"COPY ({_ORD_SQL.format(src=sf_dir)}) "
        f"TO '{d}/orders.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "lineitem", "events", "documents", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_orders_oracle_parity(spark, adversarial_ord_dir, name):
    spdf = REGISTRY[name].fn(spark, adversarial_ord_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], adversarial_ord_dir), name)


_LI_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_quantity END AS l_quantity,
       CASE WHEN l_orderkey % 89 = 0 THEN NULL
            WHEN l_orderkey % 83 = 0 THEN -l_extendedprice
            ELSE l_extendedprice END AS l_extendedprice,
       CASE WHEN l_orderkey % 79 = 0 THEN NULL
            WHEN l_orderkey % 73 = 0 THEN 1.0
            ELSE l_discount END AS l_discount,
       l_tax, l_returnflag, l_linestatus, l_shipdate
FROM '{src}/lineitem.parquet'
"""

LI_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume",
    "cube_quantities",
    "corr_qty_price",
    "filter_pushdown_projection",
    "join_broadcast_dims",
    "semi_join_customers",
    "anti_join_customers",
    "range_join_events",
    "distinct_counts",
]


@pytest.fixture(scope="module")
def adversarial_li_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_li_")
    duckdb.sql(
        f"COPY ({_LI_SQL.format(src=sf_dir)}) "
        f"TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "events", "documents", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", LI_QUERIES)
def test_adversarial_lineitem_oracle_parity(spark, adversarial_li_dir, name):
    """NULL quantities/prices/discounts and a discount of exactly 1.0
    (revenue-zeroing) injected into lineitem; the q1 family's decimal
    sums and every lineitem join must keep hash-matching."""
    spdf = REGISTRY[name].fn(spark, adversarial_li_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], adversarial_li_dir), name)
