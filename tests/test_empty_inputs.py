"""Empty-input robustness: a 100 TB pipeline constantly hits empty
partitions, strata, and incremental batches — every operator family
must degrade to an empty (or constant) result, never a crash
(division by zero on an empty stratum, sum-of-nothing None leaking
into a fixpoint check, collect() on an empty model frame, ...)."""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# one representative per operator family (keeps suite time bounded)
FAMILIES = [
    "word_coverage",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_canonical",
    "dedup_semantic_clustered",
    "corpus_curation",
    "curation_funnel",
    "unigram_perplexity",
    "bottomk_sample_per_lang",
    "mixture_weights",
    "length_filter_adaptive",
    "ann_cosine_topk",
    "ann_sq8_topk",
    "kmeans_embeddings",
    "profile_embeddings",
    "zorder_layout_events",
    "pack_sequences",
    "contamination_check",
    "sessionize_events",
    "train_test_split",
    "validate_embeddings",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "streaming_curation_gate",
    "heavy_hitter_words",
    "bigram_perplexity",
    "exact_quantiles_orders",
    "ann_ivf_topk",
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
    # r7 sketch + association/blocking/IVM layers: empty corpora must
    # yield empty reports (cms_join_size: ONE all-zero row — the size
    # of an empty join is 0, not NULL)
    "hll_distinct",
    "hll_merge_shards",
    "kmv_corpus_overlap",
    "pmi_collocations",
    "hll_column_profile",
    "streaming_distinct_hll",
    "basket_lift",
    "sorted_neighborhood_pairs",
    "sorted_neighborhood_multikey",
    "incremental_agg_refresh",
    "event_transition_matrix",
    "record_linkage_fuzzy",
    "linkage_entities",
    "rfm_segments",
    "cms_join_size",
    "dedup_ppjoin",
    "snm_recall_eval",
    # r8 wave: iterative graph / retraction IVM / sampled quantiles /
    # tokenizer fertility — empty corpora must yield empty reports
    "pagerank_coorder",
    "incremental_agg_retract",
    "sampled_quantiles_orders",
    "bpe_fertility_by_lang",
    "dedup_tf_cosine",
    "top_event_paths",
    "gopher_quality_flags",
    "dedup_paragraph",
    # r9 late wave: empty corpora → empty vocab/pair/report frames
    # (q22's scalar threshold aggregates to NULL over zero customers;
    # the comparison is then never true on either engine)
    "unigram_lm_vocab",
    "unigram_lm_fertility",
    "dedup_rate_by_source",
    "multimodal_phash_dedup",
    "multimodal_audio_dedup",
    "multimodal_phash_canonical",
    "q7_volume_shipping",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "bm25_topk",
    "q10_returned_items",
    "q14_promo_effect",  # global agg: ONE all-NULL ratio row
    "streaming_simhash_gate",
    "q6_forecast_revenue",  # global agg: ONE row (NULL sum, zero count)
    "q15_top_supplier",
    "window_rank_functions",
    # r10 wave: bounded manifests, production source matrix, streaming
    # audio gate, and the TPC-H completions — empty corpora must yield
    # empty (or one-NULL-row global-aggregate) frames
    "multimodal_audio_canonical",
    "dedup_rate_by_source_fast",
    "streaming_audio_gate",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_late_lines",
    "q16_part_supplier_count",
    "q17_small_qty_revenue",  # global agg: ONE NULL row
    "q19_discounted_revenue",  # global agg: ONE row (NULL sum, 0 count)
    "q20_promo_suppliers",
]

# row counts that are CONSTANT by design (parameter reports / per-dim
# profiles emit their frame even over zero input rows)
_EXPECTED_NONZERO = {
    "profile_embeddings": 64,  # per-dimension rows, null stats
    "curation_funnel": 5,  # the five stage rows, all counts zero
    "bloom_calibration": 1,  # global aggregate: one all-zero row
    "fk_integrity_audit": 5,  # one all-zero row per declared FK
    "linreg_closed_form": 1,  # global aggregate: one NULL-model row
    "profile_events": 5,  # one row per profiled column
    "cms_join_size": 1,  # global report: one all-zero row
    "snm_recall_eval": 2,  # one row per method, vacuous 100% ppm
    "q14_promo_effect": 1,  # global ratio report: one NULL row
    "q6_forecast_revenue": 1,  # global aggregate: one NULL/zero row
    "q17_small_qty_revenue": 1,  # global aggregate: one NULL row
    "q19_discounted_revenue": 1,  # global aggregate: one NULL/zero row
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="empty_sf_")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.mark.parametrize("name", FAMILIES)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    n = REGISTRY[name].fn(spark, empty_sf_dir).count()
    assert n == _EXPECTED_NONZERO.get(name, 0)
