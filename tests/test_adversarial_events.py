"""Adversarial-events oracle parity: duplicate timestamps (within and
across users), sub-microsecond neighbors, NULL values, malformed /
empty / non-numeric JSON props, day-boundary timestamps, and lone
single-event users. The fixture events are uniformly clean, so these
shapes never exercised the engines' edge-case disagreements (ANSI cast
aborts on dirty JSON was caught by exactly this table)."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_EV_SQL = """
SELECT * FROM (VALUES
  (0, TIMESTAMP '2024-01-01 00:00:00',        1, 'click',    1.5,  '{"k":"v"}'),
  (1, TIMESTAMP '2024-01-01 00:00:00',        1, 'click',    2.5,  NULL),
  (2, TIMESTAMP '2024-01-01 00:00:00',        1, 'error',    NULL, '{}'),
  (3, TIMESTAMP '2024-01-01 00:10:00',        1, 'view',     0.0,  '{"k":2}'),
  (4, TIMESTAMP '2024-01-01 02:00:00',        1, 'click',    -3.25, '{"a":[1,2]}'),
  (5, TIMESTAMP '2024-01-01 02:00:00.000001', 1, 'error',    1e12, '{"k":null}'),
  (6, TIMESTAMP '2024-01-01 23:59:59.999999', 2, 'click',    0.125, 'not json'),
  (7, TIMESTAMP '2024-01-02 00:00:00',        2, 'purchase', 7.0,  ''),
  (8, TIMESTAMP '2024-03-01 12:00:00',        3, 'view',     4.5,  '{"deep":{"x":1}}'),
  (9, TIMESTAMP '2024-03-01 12:00:00',        3, 'view',     4.5,  '{"deep":{"x":1}}')
) AS t(event_id, ts, user_id, event_type, value, props)
"""

QUERIES = [
    "sessionize_events",
    "profile_events",
    "ms_round_convert",
    "json_extract_props",
    "case_adaptive_guard",
    "lag_lead_boundaries",
    "sequence_position",
    "longest_span_top1",
    "leak_vote_2of3",
    "moving_avg_range_frame",
    "range_join_events",
    "zorder_layout_events",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_interval_join",
    "funnel_stages",
    "cohort_retention",
    "event_rate_anomalies",
    # r7: duplicate timestamps order-tiebreak by event_id in the lag
    # window; NULL values must vanish from the sums but count in n
    "event_transition_matrix",
    "incremental_agg_refresh",
]


@pytest.fixture(scope="module")
def adversarial_ev_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_ev_")
    duckdb.sql(f"COPY ({_EV_SQL}) TO '{d}/events.parquet' (FORMAT PARQUET)")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_events_oracle_parity(spark, adversarial_ev_dir, name):
    spdf = REGISTRY[name].fn(spark, adversarial_ev_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], adversarial_ev_dir), name)
