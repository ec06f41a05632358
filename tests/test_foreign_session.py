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


def test_all_parquet_timestamps_normalized_to_ltz(bare_session, sf_dir):
    """Footer-driven normalization: EVERY timestamp-typed parquet
    column — not just events.ts — must surface as TimestampType (LTZ),
    whatever physical form (NANOS-as-long / MICROS-ntz) the current
    testdata generation used."""
    for table in ("events", "orders", "lineitem"):
        df = load_table(bare_session, sf_dir, table)
        for name, dtype in df.dtypes:
            assert dtype not in ("timestamp_ntz",), (table, name, dtype)
            # a raw nanos long would masquerade as bigint; timestamps
            # in these tables carry date/ts names — spot-check none of
            # the known time columns degraded
        bad = [n for n, t in df.dtypes if n in ("ts", "o_orderdate", "l_shipdate") and t != "timestamp"]
        assert not bad, (table, bad)


@pytest.mark.parametrize(
    "name",
    [
        "sessionize_events",
        "ms_round_convert",
        "asof_join_orders",
        "range_join_events",
        # r4 families: curation / packing / clustering / funnel /
        # stream-stream join — none may depend on session.py's confs
        "pii_scrub",
        "pack_sequences",
        "kmeans_embeddings",
        "funnel_stages",
        "streaming_interval_join",
        # r4 late additions: the z-order plan reads events.ts via
        # unix_micros; the funnel composes text+LM+dedup families
        "zorder_layout_events",
        "curation_funnel",
        # prefix-rotated late-r4 entries: first driver exposure is on
        # the vanilla session, so pin them here too
        "dedup_minhash_portable",
        "dedup_semantic_clustered",
        "unigram_perplexity",
        "dedup_canonical",
        "streaming_curation_gate",
        # r5 rotation wave: the rest of the twelve newcomers — first
        # driver exposure is on the vanilla session, so pin them here
        "ann_sq8_topk",
        "train_test_split",
        "bottomk_sample_per_lang",
        "event_rate_anomalies",
        "dedup_incremental",
        "sink_training_shards",
        # r6 rotation wave 3: all twenty newcomers' first driver
        # exposure is on the vanilla session, so pin each here
        "heavy_hitter_words",
        "bigram_perplexity",
        "vocab_coverage",
        "lang_id_confusion",
        "ann_ivf_topk",
        "ann_lsh_buckets",
        "embedding_centroids",
        "profile_embeddings",
        "validate_embeddings",
        "dedup_simhash_portable",
        "dedup_substring_spans",
        "dedup_cluster_stats",
        "minhash_calibration",
        "mllib_minhash_pairs",
        "curation_signals_fused",
        "length_filter_adaptive",
        "mixture_weights",
        "cohort_retention",
        "corpus_curation_multimodal",
        "sink_export_manifest",
        # r6 additions
        "exact_quantiles_orders",
        "ann_pq_topk",
        "ann_pq_rerank",
        "dedup_bloom_probe",
        "bloom_calibration",
        "streaming_bloom_gate",
        "cms_word_counts",
        "bpe_merges",
        "bpe_vocab",
        "snapshot_diff",
        "dedup_method_eval",
        "fk_integrity_audit",
        "embedding_drift",
        "linreg_closed_form",
        "profile_events",
        "logreg_irls_probe",
        "langid_trained",
    ],
)
def test_events_queries_on_bare_session(bare_session, sf_dir, name):
    bare_session.conf.set(NANOS_CONF, "false")  # load_table must re-set it
    df = api.queries()[name](bare_session, sf_dir)
    assert df.count() >= 0


TZ_CONF = "spark.sql.session.timeZone"


@pytest.mark.parametrize(
    "name",
    [
        "streaming_tumbling_counts",
        "sessionize_events",
        "zorder_layout_events",
        # r6: the only wave-3 newcomer that reads event timestamps
        "cohort_retention",
    ]
)
def test_non_utc_session_timezone_still_matches_oracle(spark, sf_dir, name):
    """A harness JVM defaulting to a non-UTC zone must not skew
    NTZ→LTZ casts: load_table AND the streaming probe re-pin the
    session to UTC at runtime, so unix_micros/window results keep
    agreeing with DuckDB's naive-as-UTC reading (ADVICE r3, medium)."""
    from asr_training_data_pipeline_spark.testing import compare_to_oracle

    s = spark.newSession()
    s.conf.set(TZ_CONF, "America/New_York")  # hostile default
    s.conf.set(NANOS_CONF, "false")
    compare_to_oracle(s, name, sf_dir)
    # and the pin is what made it pass
    assert s.conf.get(TZ_CONF) == "UTC"
