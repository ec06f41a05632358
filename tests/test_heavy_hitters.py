"""Heavy-hitter guarantees: the Misra-Gries candidate pass must never
lose a true heavy hitter — under any partitioning, any arrival order,
any skew — because the recount pass can only recover what pass 1 kept.
The oracle-parity suite pins the end result on the driver fixture;
these tests attack the guarantee itself with constructed inputs."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from asr_training_data_pipeline_spark.operators.text_analysis import (
    _HH_CAPACITY,
    _HH_PHI_DEN,
    heavy_hitter_words,
    misra_gries_candidates,
)


def _mg_local(items, capacity):
    """Reference implementation of the batch-merge MG rule the Arrow
    kernel applies (add counts, subtract the (capacity+1)-largest,
    drop non-positive) — one batch == the whole stream."""
    counters = Counter(items)
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = Counter({k: c - cut for k, c in counters.items() if c > cut})
    return set(counters)


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=400),
    st.integers(4, 16),
)
@settings(max_examples=200, deadline=None)
def test_mg_merge_rule_keeps_partition_heavy_items(items, capacity):
    """Any item with count > n/(capacity+1) survives the summary."""
    kept = _mg_local(items, capacity)
    n = len(items)
    for k, c in Counter(items).items():
        if c * (capacity + 1) > n:
            assert k in kept, (k, c, n, capacity)


@pytest.mark.parametrize("n_part", [1, 3, 32])
def test_spark_candidates_superset_of_heavy_hitters(spark, n_part):
    """Candidates from ANY partitioning cover every global heavy
    hitter of a skewed stream (one value at ~25%, one at ~3%, a long
    uniform tail)."""
    rows = (
        [("hot",)] * 2500
        + [("warm",)] * 300
        + [(f"tail{i % 997}",) for i in range(7200)]
    )
    df = spark.createDataFrame(rows, "w string").repartition(n_part)
    cands = {
        r["w"]
        for r in misra_gries_candidates(df, "w", _HH_CAPACITY).collect()
    }
    counts = Counter(w for (w,) in rows)
    n = len(rows)
    heavy = {k for k, c in counts.items() if c * _HH_PHI_DEN > n}
    assert heavy  # the fixture must actually contain heavy hitters
    assert heavy <= cands


def test_query_matches_plain_groupby(spark, sf_dir):
    """End-to-end equality with the single-shuffle formulation on the
    real fixture — the sketch changes the plan, never the answer."""
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.sources.tables import load_table

    got = {
        (r["w"], r["cnt"]) for r in heavy_hitter_words(spark, sf_dir).collect()
    }
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    n = toks.count()
    want = {
        (r["w"], r["cnt"])
        for r in toks.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * _HH_PHI_DEN > n)
        .collect()
    }
    assert got == want and len(want) > 0


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=600),
    st.integers(2, 8),
    st.lists(st.integers(1, 50), min_size=1, max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_mg_ingest_survival_under_any_batching(items, capacity, cuts):
    """The SHIPPED ingest path (including its mid-stream 8·capacity
    compressions) never loses an item with count > n/(capacity+1),
    for any stream, any capacity, and any batch-boundary placement —
    the exact property the recount pass relies on."""
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _mg_ingest,
    )

    # slice the stream at arbitrary boundaries derived from `cuts`
    bounds, pos = [], 0
    for c in cuts:
        pos += c
        if pos >= len(items):
            break
        bounds.append(pos)
    batches, prev = [], 0
    for b in bounds + [len(items)]:
        if b > prev:
            batches.append(items[prev:b])
            prev = b
    counters: dict = {}
    for batch in batches:
        _mg_ingest(counters, Counter(batch).items(), capacity)
    n = len(items)
    for k, c in Counter(items).items():
        if c * (capacity + 1) > n:
            assert k in counters, (k, c, n, capacity, bounds)


def test_mg_ingest_peak_memory_bounded():
    """The documented bound: the counter dict never exceeds
    8·capacity(+1 for the just-inserted key) DURING ingest, even on an
    all-distinct adversarial stream — the in-loop compression trigger,
    not just the end-of-batch one (r6 ADVICE)."""
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _mg_ingest,
    )

    capacity = 64
    counters: dict = {}
    peak = 0

    def stream():
        nonlocal peak
        for i in range(100_000):
            peak = max(peak, len(counters))
            yield (f"k{i}", 1)

    _mg_ingest(counters, stream(), capacity)
    assert peak <= 8 * capacity + 1, peak
    assert len(counters) <= capacity
