"""Bucketed-table co-located join: writing both sides bucketed by the
join key lets the sort-merge join run with ZERO exchanges — the
100 TB pattern for repeated joins on the same key (fact tables
bucketed once at ingest, every downstream join shuffle-free)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{wh}/orders_b")
        .saveAsTable("orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{wh}/customer_b")
        .saveAsTable("customer_b")
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # Disable broadcast so the co-located sort-merge path is what runs.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(ot)
            .join(spark.table(ct), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # The join's INPUTS print after the SortMergeJoin node; neither
        # side may shuffle - both read pre-bucketed files.
        below_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning" not in below_join
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1  # only the post-join groupBy may shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_tables):
    ot, ct = bucketed_tables
    bucketed = (
        spark.table(ot)
        .join(spark.table(ct), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert bucketed == plain
