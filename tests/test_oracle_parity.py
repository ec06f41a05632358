"""Every registry query with an oracle must hash-match DuckDB on the
same parquet — this mirrors the driver's CORRECTNESS gate exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.testing import (
    assert_typed_parity,
    compare_to_oracle,
    run_oracle_arrow,
)

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    compare_to_oracle(spark, name, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_typed_parity_red_on_hugeint(spark, sf_dir):
    """An uncast integer SUM leaves DuckDB as HUGEINT → Arrow
    decimal128(38,0); the driver's buffer-level hash fails it against a
    Spark bigint even with equal values (the r7/r8 ``hll_distinct`` /
    ``hll_column_profile`` reds). The typed check must go red here —
    this pins the whole class, not just the fixed instance."""
    tbl = run_oracle_arrow("SELECT SUM(1) AS v FROM region", sf_dir)
    sdf = spark.range(1).select(F.lit(1).cast("bigint").alias("v"))
    with pytest.raises(AssertionError, match="typed oracle drift"):
        assert_typed_parity(sdf.schema, tbl.schema, "hugeint_probe")


def test_typed_parity_red_on_int_width_drift(spark, sf_dir):
    tbl = run_oracle_arrow("SELECT CAST(1 AS INT) AS v FROM region LIMIT 1", sf_dir)
    sdf = spark.range(1).select(F.lit(1).cast("bigint").alias("v"))
    with pytest.raises(AssertionError, match="typed oracle drift"):
        assert_typed_parity(sdf.schema, tbl.schema, "int32_probe")


def test_typed_parity_green_on_exact_match(spark, sf_dir):
    tbl = run_oracle_arrow(
        "SELECT CAST(SUM(1) AS BIGINT) AS v, 'x' AS s,"
        " CAST(1.5 AS DOUBLE) AS f FROM region",
        sf_dir,
    )
    sdf = spark.range(1).select(
        F.lit(1).cast("bigint").alias("v"),
        F.lit("x").alias("s"),
        F.lit(1.5).alias("f"),
    )
    assert_typed_parity(sdf.schema, tbl.schema, "green_probe")
