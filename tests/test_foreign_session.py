"""Foreign-session contract: every registered query must run on a
SparkSession the *caller* built — the correctness harness constructs a
vanilla ``SparkSession.builder.getOrCreate()`` session with none of
``session.py``'s confs. Round 2 failed 15 driver checks because
``events.parquet`` (TIMESTAMP(NANOS)) is unreadable without
``spark.sql.legacy.parquet.nanosAsLong``; ``load_table`` now sets it at
runtime. These tests simulate the harness by stripping the conf from an
isolated session before running events-reading queries end-to-end.
"""

from __future__ import annotations

import pytest

from asr_training_data_pipeline_spark import api
from asr_training_data_pipeline_spark.sources.tables import load_table

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def bare_session(spark):
    """An isolated session with the nanos conf removed — the closest
    in-process stand-in for the driver's vanilla session (newSession
    shares the SparkContext but has its own SQLConf)."""
    s = spark.newSession()
    s.conf.set(NANOS_CONF, "false")  # force the vanilla default
    return s


def test_load_events_on_bare_session(bare_session, sf_dir):
    df = load_table(bare_session, sf_dir, "events")
    assert "ts" in df.columns
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


@pytest.mark.parametrize(
    "name",
    ["sessionize_events", "ms_round_convert", "asof_join_orders", "range_join_events"],
)
def test_events_queries_on_bare_session(bare_session, sf_dir, name):
    bare_session.conf.set(NANOS_CONF, "false")  # load_table must re-set it
    df = api.queries()[name](bare_session, sf_dir)
    assert df.count() >= 0
