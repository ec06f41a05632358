"""Text scalar functions (reference §2.9 C1-C3, C13, C15).

Everything except the digits→words branch is pure Catalyst column
expressions (JVM-side, codegen'd, pushdown-friendly). The digits
branch is the one genuine Python scalar in the hot path and is kept
out of the default normalization unless requested — exactly like the
reference's ``numbers_to_words`` flag
(/root/reference/claude_research_optimal.py:66-80).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- C2: integer → English words -------------------------------------
# Semantics mirror /root/reference/claude_research_optimal.py:37-64:
# supports 0, negatives, up to billions; the caller concatenates the
# words with NO separator (":78") before stripping non-alphanumerics.

_ONES = (
    "zero one two three four five six seven eight nine ten eleven "
    "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
    "nineteen"
).split()
_TENS = (
    "zero ten twenty thirty forty fifty sixty seventy eighty ninety"
).split()


def num_to_words(n: int) -> str:
    """English words for an integer, space-separated."""
    if n < 0:
        return "negative " + num_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rem = divmod(n, 10)
        return _TENS[tens] + (f" {_ONES[rem]}" if rem else "")
    for scale, word in ((10**9, "billion"), (10**6, "million"), (10**3, "thousand"), (100, "hundred")):
        if n >= scale:
            head, rem = divmod(n, scale)
            out = f"{num_to_words(head)} {word}"
            return out + (f" {num_to_words(rem)}" if rem else "")
    return _ONES[n]  # unreachable


@F.udf(T.StringType())
def num_to_words_udf(s: str | None) -> str | None:
    """UDF form used by the digits branch of normalization: the words
    are joined with no separator ("42" → "fortytwo"), matching the
    reference's concatenation before its non-alpha strip."""
    if s is None or not s.isdigit():
        return s
    return num_to_words(int(s)).replace(" ", "").replace("-", "")


# --- C1: normalize_word ----------------------------------------------


def normalize_word_col(col: Column | str, numbers_to_words: bool = False) -> Column:
    """Lowercase → strip chars outside [a-z0-9'-] → drop ' and -;
    empty string → NULL. Mirrors the reference's normalize_word
    (/root/reference/claude_research_optimal.py:66-80) as a pure
    column expression (stays inside whole-stage codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9'\-]", "")
    if numbers_to_words:
        c = F.when(c.rlike(r"^[0-9]+$"), num_to_words_udf(c)).otherwise(c)
    c = F.translate(c, "'-", "")
    return F.when(c == "", None).otherwise(c)


NORMALIZE_WORD_SQL = (
    "nullif(translate(regexp_replace(lower({col}), '[^a-z0-9''\\-]', '', 'g'),"
    " '''-', ''), '')"
)
"""ANSI/DuckDB mirror of :func:`normalize_word_col` (no digits branch)."""


# --- C3 / C15: tokenization ------------------------------------------


def tokenize_col(col: Column | str) -> Column:
    """Regex token scan [A-Za-z0-9'-]+ — the reference's
    tokenize_text_to_words (/root/reference/claude_research_optimal.py:82-83)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9'-]+"), 0)


def whitespace_tokens_col(col: Column | str) -> Column:
    """Lowercase + whitespace split (reference batch_processor.py:28-29),
    used by the word-coverage aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), r"\s+")
