"""Word k-gram shingling — shared by the dedup family.

Both sides of the oracle comparison build shingles identically:
1-based positions ``i ∈ [1, n-k+1]``, shingle = the k words starting
at ``i`` joined by a single space, de-duplicated per document. Docs
shorter than k words produce no shingles (and so never pair).

Everything is built-in higher-order functions — no Python in the
plan, so shingling runs inside whole-stage codegen and scales with
the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles_col(tokens: Column, k: int) -> Column:
    """Distinct word k-gram shingles of an ``array<string>`` column.

    CONTRACT: ``tokens`` must be an ATTRIBUTE (a pre-projected
    column — ``withColumn('_toks', split(...))`` then
    ``F.col('_toks')``), never an expression like ``split(text)``
    passed inline. The per-shingle transform lambda references
    ``tokens``, and higher-order functions run on Catalyst's
    interpreted eval path (no whole-stage codegen, no
    common-subexpression elimination): a non-attribute subtree in the
    lambda body re-evaluates ON EVERY ELEMENT, so an inline
    ``split(text)`` re-split the whole document once per shingle —
    O(tokens²) per doc (jstack-pinned to StringSplit.nullSafeEval
    under the transform lambda at the 500k-doc fixture). An attribute
    is a row-field read: O(1) per reference. Call sites pre-project
    via :func:`tokens_attr`.

    SECOND CONTRACT (r11 forensics): downstream filters must NEVER
    reference the shingle column (or anything derived from it —
    signatures, hash arrays). Predicate pushdown substitutes
    attributes back to their defining expressions as it pushes a
    filter through the projections, so `sh IS NOT NULL` lands at the
    parquet scan with this whole transform — inline re-split
    included — re-evaluated once per row on top of the real
    projection (jstack-pinned in the r11 500k run: StringSplit under
    ConcatWs under ArrayTransform in the SCAN stage). Drop short docs
    with ``df.filter(F.size(tokens_column) >= k)`` BEFORE shingling:
    it pushes down as a cheap row-local `size(split(text)) >= k` and
    makes the shingle column non-null by construction. Plan-locked in
    tests/test_plan_shapes.py::test_no_hof_chain_in_scan_filters."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
        ),
    )


_TOKS = "__shingle_toks"


def tokens_attr(df, text_col: str = "text", sep: str = " "):
    """(df', tokens_column) with the split pre-projected as a real
    column, satisfying :func:`shingles_col`'s attribute contract.
    Callers must reference the tokens through the RETURNED column
    handle (never a hand-typed ``F.col``) and exclude it from their
    final projection."""
    if _TOKS in df.columns:
        # withColumn would silently overwrite the caller's column and
        # every downstream shingle would read the wrong tokens.
        raise ValueError(
            f"input frame already carries the internal column {_TOKS!r}"
        )
    return (
        df.withColumn(_TOKS, F.split(F.col(text_col), sep)),
        F.col(_TOKS),
    )


def shingles_sql(k: int, table: str = "documents") -> str:
    """DuckDB CTE text producing (doc_id, shingle) rows — the oracle
    mirror of :func:`shingles_col` + explode."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, {concat} AS shingle
  FROM toks, unnest(range(1, greatest(len(t) - {k - 2}, 1))) AS u(i)
  WHERE len(t) >= {k}
)"""
