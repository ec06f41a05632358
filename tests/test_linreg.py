"""Closed-form regression cross-check: the Cramer solution must agree
with an independent dense least-squares solve (numpy lstsq) on the
same features, and the fit must be strong on the fixture (the label
is near-linear in the features by construction of the check)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.sources.tables import load_table


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    row = REGISTRY["linreg_closed_form"].fn(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    pdf = (
        docs.filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            F.col("n_chars").cast("double").alias("y"),
            F.size(words).cast("double").alias("x1"),
            F.size(F.filter(words, lambda w: F.length(w) > 5))
            .cast("double")
            .alias("x2"),
        )
        .toPandas()
    )
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta, *_ = np.linalg.lstsq(X, pdf.y.to_numpy(), rcond=None)
    assert row.n_rows == len(pdf)
    for got, want in zip((row.beta0, row.beta1, row.beta2), beta):
        assert abs(got - want) < 1e-4, (got, want)
    assert row.r2 is not None and row.r2 > 0.9


def test_linreg_degenerate_design_yields_nulls(spark, tmp_path):
    """A constant feature column makes X'X singular: det = 0 must
    yield NULL coefficients, not a division error under ANSI."""
    import duckdb

    d = str(tmp_path / "degen")
    import os

    os.makedirs(d, exist_ok=True)
    duckdb.sql(
        "COPY (SELECT g AS doc_id, 'aaaaaaaa' AS text, 'en' AS lang,"
        " 'src' AS source, 8 AS n_chars FROM unnest(range(20)) u(g))"
        f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    row = REGISTRY["linreg_closed_form"].fn(spark, d).collect()[0]
    assert row.n_rows == 20
    assert row.beta0 is None and row.beta1 is None and row.beta2 is None
    assert row.r2 is None


def test_logreg_probe_fits_and_is_sane(spark, sf_dir):
    row = REGISTRY["logreg_irls_probe"].fn(spark, sf_dir).collect()[0]
    assert row.n_rows > 0
    assert row.train_accuracy is not None and row.train_accuracy > 0.9
    for b in (row.beta0, row.beta1, row.beta2):
        assert b is not None and abs(b) < 1e6


def test_logreg_degenerate_design_yields_empty(spark, tmp_path):
    """Constant features make step 1 singular: the model frame is
    empty and the query returns zero rows (same as the oracle's empty
    cross join), never an ANSI division error."""
    import os

    import duckdb

    d = str(tmp_path / "degen_lr")
    os.makedirs(d, exist_ok=True)
    duckdb.sql(
        "COPY (SELECT g AS doc_id, 'aaaaaaaa bb' AS text, 'en' AS lang,"
        " 'src' AS source, CASE WHEN g % 2 = 0 THEN 100 ELSE 400 END AS n_chars"
        " FROM unnest(range(20)) u(g))"
        f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    assert REGISTRY["logreg_irls_probe"].fn(spark, d).count() == 0
