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
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import types as T

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


def run_oracle_arrow(sql: str, sf_dir: str) -> pa.Table:
    """Oracle result as an Arrow table — the representation the driver
    actually hashes, so output TYPES are visible (DuckDB's ``.df()``
    coerces e.g. HUGEINT → object/int and hides them)."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).arrow()
    finally:
        con.close()


# ---------------------------------------------------------------------
# Typed oracle parity (VERDICT r8 task 2)
#
# The driver's value hash is type-aware at the Arrow-buffer level: a
# DuckDB HUGEINT (SUM over integers!) surfaces as decimal128(38,0) and
# hash-fails against a Spark bigint even when every value is equal —
# the r7/r8 `hll_distinct`/`hll_column_profile` reds. Python-level
# value comparison can never see that class, so compare_to_oracle now
# also asserts CANONICAL TYPE equality between the Spark schema and
# the DuckDB Arrow schema for every oracle on every suite run.
# ---------------------------------------------------------------------


def _canon_arrow(t: pa.DataType) -> tuple:
    if pa.types.is_integer(t):
        return ("int", t.bit_width, pa.types.is_signed_integer(t))
    if pa.types.is_floating(t):
        return ("float", t.bit_width)
    if pa.types.is_decimal(t):
        return ("decimal", t.precision, t.scale)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("string",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("binary",)
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_timestamp(t):
        return ("timestamp",)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _canon_arrow(t.value_type))
    if pa.types.is_struct(t):
        return (
            "struct",
            tuple((f.name, _canon_arrow(f.type)) for f in t),
        )
    return ("other", str(t))


def _canon_spark(dt: T.DataType) -> tuple:
    if isinstance(dt, T.LongType):
        return ("int", 64, True)
    if isinstance(dt, T.IntegerType):
        return ("int", 32, True)
    if isinstance(dt, T.ShortType):
        return ("int", 16, True)
    if isinstance(dt, T.ByteType):
        return ("int", 8, True)
    if isinstance(dt, T.DoubleType):
        return ("float", 64)
    if isinstance(dt, T.FloatType):
        return ("float", 32)
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.precision, dt.scale)
    if isinstance(dt, T.BooleanType):
        return ("bool",)
    if isinstance(dt, T.StringType):
        return ("string",)
    if isinstance(dt, T.BinaryType):
        return ("binary",)
    if isinstance(dt, T.DateType):
        return ("date",)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("timestamp",)
    if isinstance(dt, T.ArrayType):
        return ("list", _canon_spark(dt.elementType))
    if isinstance(dt, T.StructType):
        return (
            "struct",
            tuple((f.name, _canon_spark(f.dataType)) for f in dt.fields),
        )
    return ("other", dt.simpleString())


def assert_typed_parity(
    spark_schema: T.StructType, arrow_schema: pa.Schema, name: str
) -> None:
    """Canonical-type agreement between a Spark result schema and the
    oracle's DuckDB-Arrow schema — red on decimal128 (uncast HUGEINT
    SUM/product), int32-vs-int64 drift, float-vs-int drift."""
    s = {f.name: _canon_spark(f.dataType) for f in spark_schema.fields}
    o = {n: _canon_arrow(arrow_schema.field(n).type) for n in arrow_schema.names}
    assert sorted(s) == sorted(o), (
        f"{name}: column mismatch spark={sorted(s)} oracle={sorted(o)}"
    )
    drift = {c: {"spark": s[c], "oracle": o[c]} for c in s if s[c] != o[c]}
    assert not drift, (
        f"{name}: typed oracle drift (driver hashes Arrow buffers — equal "
        f"values with unequal types still hash-fail): {drift}"
    )


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
    df = q.fn(spark, sf_dir)
    tbl = run_oracle_arrow(q.oracle, sf_dir)
    assert_typed_parity(df.schema, tbl.schema, name)
    spark_pdf = df.toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name)
