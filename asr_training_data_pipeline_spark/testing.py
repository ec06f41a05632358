"""Local mirror of the driver's correctness gate.

Runs a registry query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column set, and values
(order-insensitive: columns sorted by name, rows sorted by all
columns). Floats are compared EXACTLY by default — the engine's
query-design rules (decimal-exact sums, deterministic row-level IEEE
arithmetic, explicit casts) are meant to make exact equality hold;
any drift is a design bug to fix, not to tolerate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .api import REGISTRY
from .sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize numeric dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # Spark surfaces SQL NULL as None, DuckDB's .df() as NaN;
            # pandas currently treats them as equal in
            # assert_series_equal but has deprecated that (pandas
            # FutureWarning). Pin one representation so the comparison
            # stays exact under future pandas majors.
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            for i, (x, y) in enumerate(zip(av, bv)):
                both_nan = (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and math.isnan(x)
                    and math.isnan(y)
                )
                assert both_nan or x == y, (
                    f"{name}: value mismatch col={c} row={i}: "
                    f"spark={x!r} oracle={y!r} (diff={x - y!r})"
                )
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def compare_to_oracle(spark: SparkSession, name: str, sf_dir: str) -> None:
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} has no oracle"
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name)
