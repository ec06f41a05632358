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
    """Distinct word k-gram shingles of an ``array<string>`` column."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
        ),
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
