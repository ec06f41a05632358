"""Every registry query with an oracle must hash-match DuckDB on the
same parquet — this mirrors the driver's CORRECTNESS gate exactly."""

from __future__ import annotations

import pytest

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.testing import compare_to_oracle

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
