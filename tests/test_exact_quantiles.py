"""Property coverage for the two-pass exact-quantile rank arithmetic:
the bucket histogram + targeted recount must reproduce discrete
quantiles (value at sorted position ⌈p·n⌉) for ANY value distribution
— ties, skew, negatives, single-bucket degeneracy — because bucketing
only relies on the bucket id being monotone in the value."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from asr_training_data_pipeline_spark.queries import _EQ_BUCKET, _EQ_PCTS


def _reference_disc(values, num, den):
    s = sorted(values)
    r = (len(s) * num + den - 1) // den  # ceil(p·n) in integers
    return s[r - 1]


def _bucket(v):
    # Spark's `div` truncates toward zero (Python // floors) — mirror
    # the engine exactly; correctness only needs monotonicity, which
    # truncation satisfies, but the replay should be bit-faithful
    fv = math.floor(v)
    q, rem = divmod(abs(fv), _EQ_BUCKET)
    return -q if fv < 0 else q


def _two_pass(values, num, den):
    """Pure-Python replay of the operator's bucket/rank arithmetic."""
    n = len(values)
    r = (n * num + den - 1) // den
    hist = {}
    for v in values:
        hist[_bucket(v)] = hist.get(_bucket(v), 0) + 1
    below = 0
    for b in sorted(hist):
        cnt = hist[b]
        if below < r <= below + cnt:
            in_bucket = sorted(v for v in values if _bucket(v) == b)
            return in_bucket[r - below - 1]
        below += cnt
    raise AssertionError("rank not located")


@given(
    st.lists(
        st.floats(
            min_value=-5e5, max_value=5e5, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=300, deadline=None)
def test_bucket_rank_equals_sorted_rank(values):
    for _name, num, den in _EQ_PCTS:
        assert _two_pass(values, num, den) == _reference_disc(values, num, den)


@given(st.lists(st.just(42.0), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_all_equal_values_single_bucket(values):
    for _name, num, den in _EQ_PCTS:
        assert _two_pass(values, num, den) == 42.0
