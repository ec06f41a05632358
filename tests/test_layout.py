"""Z-order layout semantics and plan shape: the clustering must beat
ingestion order for 2-D stat pruning, tiles must be balanced (exact
ntile), and the heavy rank must never run on a single partition."""

from __future__ import annotations

import re

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.layout import _Z_FILES
from asr_training_data_pipeline_spark.sources.tables import load_table


def test_zorder_tiles_balanced_and_cover_all(spark, sf_dir):
    plan = REGISTRY["zorder_layout_events"].fn(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert plan.n_rows.sum() == n_events
    assert len(plan) == min(_Z_FILES, n_events)
    # exact ntile: tile sizes differ by at most one row
    assert plan.n_rows.max() - plan.n_rows.min() <= 1


def test_zorder_beats_ingestion_order_for_stat_pruning(spark, sf_dir):
    """What makes stats prunable is each file's SPAN per dimension: a
    `user_id = ?` predicate skips a file iff the file's user range
    excludes it. Ingestion (event_id ≈ time) order leaves every file
    spanning ~the whole user range — user predicates prune nothing —
    while z-order must bound BOTH spans well below the full ranges."""
    z = REGISTRY["zorder_layout_events"].fn(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / 60000000).cast("long").alias("ts_min"),
    )
    ingest = (
        events.withColumn(
            "file_id", F.ntile(_Z_FILES).over(W.orderBy("event_id"))
        )
        .groupBy("file_id")
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("uspan"),
            (F.max("ts_min") - F.min("ts_min")).alias("tspan"),
        )
        .toPandas()
    )
    z_uspan = (z.max_uid - z.min_uid).mean()
    z_tspan = (z.max_tsmin - z.min_tsmin).mean()
    full_u = ingest.uspan.max()
    full_t = (z.max_tsmin.max() - z.min_tsmin.min())
    # ingestion order: no user pruning at all (files span ~everything)
    assert ingest.uspan.mean() > 0.9 * full_u
    # z-order: a user-equality predicate must prune most files, and
    # time files must still cover only a fraction of the time range
    assert z_uspan < 0.5 * full_u, (z_uspan, full_u)
    assert z_tspan < 0.5 * full_t, (z_tspan, full_t)


def test_zorder_rank_is_distributed(spark, sf_dir):
    """The per-row rank must partition by the coarse z-bucket (no
    global-order ntile window — that would drag every event onto one
    partition; the only single-partition exchanges left are scalar
    min-max aggregates and the ≤4096-row histogram prefix-sum)."""
    plan = (
        REGISTRY["zorder_layout_events"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no global-order ntile window anywhere (the naive layout plan);
    # the file id must come from the arithmetic over per-bucket ranks
    assert "ntile" not in plan
    assert any(
        "zbucket" in part
        for part in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    ), plan


def test_u16_normalization_monotone_and_bounded_at_extreme_ranges():
    """Property for the decimal-routed 16-bit min-max normalization:
    for ANY id range — including snowflake-scale spans past 2^47 where
    the old bigint ×65535 overflowed — the quotient stays in
    [0, 65535] and is monotone in the value. Pure-integer replay of
    cast((u - min) AS decimal(38,0)) * 65535 div greatest(range, 1)
    (Python ints are exact, like decimal(38,0))."""
    import random

    rng = random.Random(406)
    for _ in range(200):
        lo = rng.randint(-(2**53), 2**53)
        hi = lo + rng.choice([0, 1, 63, 2**20, 2**47, 2**53 - 1])
        span = max(hi - lo, 1)
        xs = sorted(
            rng.randint(lo, hi) for _ in range(20)
        ) + [lo, hi]
        xs.sort()
        prev = None
        for x in xs:
            q = ((x - lo) * 65535) // span
            # Spark `div` truncates; operands here are non-negative so
            # floor == trunc
            assert 0 <= q <= 65535, (lo, hi, x, q)
            if prev is not None:
                assert q >= prev
            prev = q
