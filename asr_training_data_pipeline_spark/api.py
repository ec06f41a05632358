"""Public accessor module: importing it populates the full query
registry (each operator module registers its queries on import)."""

from __future__ import annotations

from . import queries as core_queries  # noqa: F401  (relational/window/scalar core)
from .operators import asof, associations, curation, dedup, dsp, layout, mllib_fe, multimodal, similarity, sketches, text_analysis  # noqa: F401
from .plans import pipeline  # noqa: F401
from .registry import REGISTRY, bench_queries, oracles, queries  # noqa: F401
from .sinks import exports  # noqa: F401
from .streaming import stateful, windows  # noqa: F401

# ---------------------------------------------------------------------
# Registry ordering (driver-visibility contract).
#
# The correctness harness checks a bounded prefix of the registry (r2
# checked exactly the first 50 of 73), so dict order decides which
# queries get a CORRECTNESS row. Priority: (1) the flagship + the
# north-star LLM-pipeline surface (dedup/ANN/text/multimodal/curation),
# (2) the reference pipeline/alignment/streaming operators, (3) the
# events-table queries, (4) one representative per reference scalar
# family. Oracle-backed queries outrank rows-only ones when a family
# already has ≥2 driver rows (ann_lsh_buckets / multimodal_frame_sample
# / sink_export_manifest stay pytest-covered but yield their slots to
# corpus_curation / streaming_dedup_exact / streaming_sliding_counts).
# Redundant
# relational shapes (plain Catalyst joins/aggs that the reference
# doesn't define and r2 already verified green) sort last — they stay
# covered by tests/test_oracle_parity.py every run.
# ---------------------------------------------------------------------

_PRIORITY = (
    # flagship + north-star: dedup, similarity, text, multimodal.
    # r6 rotation wave 3 (VERDICT r5 tasks 1/2/5): the 18 oracle-backed
    # queries that had never had a driver CORRECTNESS row, plus the two
    # long-waiting rows-only members (sink_export_manifest,
    # mllib_minhash_pairs), rotate IN. Funded by retiring twenty
    # twice-or-more-green members to the tail: the r4 winnowing block
    # (doc_winnowing, dedup_winnow_pairs, profile_documents,
    # dedup_ngram_jaccard_stopshingle, dedup_semantic — green r4+r5),
    # the r4 curation block (pii_scrub, repetition_signals,
    # stratified_sample, contamination_check, unigram_perplexity,
    # curation_funnel — green r4+r5), the late-r4 block
    # (dedup_minhash_portable, dedup_semantic_clustered,
    # dedup_canonical, corpus_curation — green r4+r5), and five
    # many-times-green flagship members whose families keep prefix reps
    # (dedup_exact, ann_lsh_topk, dedup_components, lang_id_heuristic,
    # token_count — green r2..r5). Every retiree stays
    # pytest-oracle-covered on every suite run.
    # r7 rotation wave 4 (VERDICT r6 task 2): zero the verification
    # debt — the 3 oracle-backed queries built after the r6 driver ran
    # (bloom_calibration, bpe_vocab, langid_trained) and the 5
    # rows-only queries never driver-run (streaming_bloom_gate,
    # vad_speech_segments, mllib_tfidf_features, mllib_brp_ann_topk,
    # multimodal_frame_sample) rotate IN; with them, every one of the
    # registered queries has a driver CORRECTNESS row at least once.
    # Eight slots funded by retiring eight twice-or-more-green members
    # whose families keep prefix reps: dedup_ngram_jaccard (pass
    # r2..r6 — dedup keeps minhash_lsh/simhash_portable/substring/
    # cluster_stats/bloom/method_eval), streaming_session_window (pass
    # r3..r6 — streaming keeps dedup_exact/interval_join/curation_gate
    # + the new bloom gate), zorder_layout_events / ann_sq8_topk /
    # kmeans_embeddings (pass r5+r6), and three four-times-green
    # rows-only composites whose operators stay driver-exercised
    # inside asr_pipeline_clips and pytest-pinned (lcs_align_runs —
    # difflib golden, bridge_runs_sessions — sessionize oracle,
    # multimodal_audio_features — frame-exact tests; multimodal keeps
    # image_resize + the new frame_sample).
    "word_coverage",
    "dedup_minhash_lsh",
    "bpe_vocab",
    "langid_trained",
    "bloom_calibration",
    "streaming_bloom_gate",
    "vad_speech_segments",
    "mllib_tfidf_features",
    "mllib_brp_ann_topk",
    "multimodal_frame_sample",
    # wave-3 newcomers: text analysis (heavy_hitter_words and
    # bigram_perplexity are the r5-new operators — verification-debt
    # head per VERDICT r5 task 2)
    "heavy_hitter_words",
    "bigram_perplexity",
    # r6-new operator: Count-Min sketch calibration, oracle-backed —
    # slot funded by retiring dedup_simhash (rows-only, green r2..r5;
    # the SimHash family keeps the exact-oracle portable variant in
    # the prefix and the recall/mutation pytest pins)
    "cms_word_counts",
    # r6-new operator: BPE merge training (tokenizer induction),
    # oracle-backed — slot funded by retiring streaming_tumbling_counts
    # (green r2..r5; streaming keeps four prefix reps)
    "bpe_merges",
    # r7-new operators (first-round-exposure rule): the distinct-count
    # sketch layer — portable HyperLogLog per-lang calibration, its
    # shard-merge losslessness proof, K-minimum-values corpus overlap,
    # PMI collocation mining, and the streaming HLL register window.
    # Five slots funded by deferring the second green of once-green
    # wave-3 members whose families keep prefix reps
    # (vocab_coverage, lang_id_confusion — text keeps heavy_hitter/
    # bigram_ppl/cms/bpe×2/langid_trained; embedding_centroids —
    # embeddings keep profile/validate + the ANN block) and by
    # retiring the two third-green holdovers (streaming_interval_join,
    # streaming_curation_gate — green r5+r6; streaming keeps
    # dedup_exact + bloom_gate + the new distinct_hll).
    "hll_distinct",
    "hll_merge_shards",
    "kmv_corpus_overlap",
    "pmi_collocations",
    "streaming_distinct_hll",
    # sixth r7 newcomer: the one-scan multi-column distinct profile
    # (ANALYZE shape) on the same HLL core — slot funded by retiring
    # streaming_dedup_exact (pass r3..r6, four greens; streaming keeps
    # bloom_gate + distinct_hll in the prefix and every retiree stays
    # pytest-oracle-covered each run)
    "hll_column_profile",
    # late-r7 operators (first-round-exposure rule): a-priori
    # market-basket lift, sorted-neighborhood blocking on the
    # distributed two-level rank, and monoid-merge incremental
    # aggregate refresh — all exact-oracle. Three slots funded by
    # retiring ann_cosine_topk (green r2..r6, five rows; ANN keeps
    # ivf/lsh_buckets/pq_topk/pq_rerank in the prefix and the
    # brute-force flagship stays bench-pinned + pytest-oracle-covered)
    # and deferring the second green of two once-green wave-3 members
    # whose families keep prefix reps (validate_embeddings —
    # embeddings keep profile_embeddings + embedding_drift;
    # cohort_retention — curation keeps signals_fused,
    # length_filter_adaptive, multimodal).
    "basket_lift",
    "sorted_neighborhood_pairs",
    "incremental_agg_refresh",
    # late-r7 operators, second pair: the sessionized Markov
    # transition matrix and cross-source blocked-Levenshtein record
    # linkage — both exact-oracle. Two slots funded by deferring the
    # second green of two more once-green wave-3 members whose
    # families keep prefix reps (dedup_cluster_stats — dedup keeps
    # minhash_lsh/simhash_portable/substring_spans/bloom_probe/
    # method_eval + the new blocking pair; mixture_weights — curation
    # keeps signals_fused, length_filter_adaptive, multimodal).
    "event_transition_matrix",
    "record_linkage_fuzzy",
    # late-r7 operator: multi-pass SNM (prefix + suffix keys, per-pass
    # recall report) — slot funded by deferring the second green of
    # minhash_calibration (once-green r6; dedup keeps minhash_lsh,
    # simhash_portable, substring_spans, bloom_probe, method_eval and
    # the single-key SNM in the prefix).
    "sorted_neighborhood_multikey",
    # late-r7 operator: entity formation over the accepted linkage
    # graph (components + per-entity source span, recursive-CTE
    # oracle) — slot funded by deferring the second green of
    # length_filter_adaptive (once-green r6; curation keeps
    # signals_fused + corpus_curation_multimodal in the prefix).
    "linkage_entities",
    # late-r7 operator: RFM quintile segmentation on three
    # distributed ranks (offset + zero-pad numeric rank keys) — slot
    # funded by deferring the second green of profile_embeddings
    # (once-green r6; embeddings keep embedding_drift + the four-rep
    # ANN block in the prefix).
    "rfm_segments",
    # late-r7 operator: CMS inner-product join-size estimation (the
    # sketch layer's optimizer-stats application) — slot funded by
    # deferring the second green of dedup_substring_spans (once-green
    # r6; dedup keeps minhash_lsh, simhash_portable, bloom_probe,
    # method_eval and the blocking/linkage block in the prefix).
    "cms_join_size",
    # late-r7 operator: PPJoin prefix-filtered exact set-similarity
    # join (oracle = dedup_ngram_jaccard's brute force — hash-equality
    # IS the filter-completeness proof) — slot funded by deferring the
    # second driver run of mllib_minhash_pairs (rows-only, first run
    # r6; MLlib keeps tfidf + brp_ann in the prefix, and the pair
    # semantics stay pinned by tests/test_mllib_fe.py).
    "dedup_ppjoin",
    # late-r7 operator: the blocking-method calibration report
    # (single- vs multi-pass SNM candidates scored against exact
    # truth) — slot funded by retiring multimodal_image_resize
    # (rows-green r3..r6, four runs; multimodal keeps frame_sample in
    # the prefix and the resize path stays pinned by its cross-check
    # tests).
    "snm_recall_eval",
    # wave-3 newcomers: ANN / embeddings
    "ann_ivf_topk",
    "ann_lsh_buckets",
    # wave-3 newcomers: dedup
    "dedup_simhash_portable",
    # wave-3 newcomers: curation / analytics / sinks
    "curation_signals_fused",
    "corpus_curation_multimodal",
    "sink_export_manifest",
    # reference pipeline / alignment / streaming
    # r6-new operator (same first-round-exposure rule as
    # exact_quantiles_orders below): product-quantization ANN with
    # integer ADC distances, oracle-backed. Slot funded by retiring
    # asr_scan_stub (rows-only, green r3+r4+r5; stays golden-tested).
    "ann_pq_topk",
    # r6-new operator: the two-stage ADC-shortlist + exact re-rank on
    # the same PQ core, oracle-backed. Slot funded by retiring
    # acoustic_boundary_gate (rows-only, green r2..r5; stays pinned by
    # the DSP signal tests).
    "ann_pq_rerank",
    # r6-new operator: Bloom-sketch incremental probe, oracle-backed.
    # Slot funded by retiring streaming_stateful_totals (green r2..r5;
    # streaming keeps prefix reps via session_window, dedup_exact,
    # interval_join, and curation_gate after this round's two
    # streaming retirements).
    "dedup_bloom_probe",
    "asr_pipeline_clips",
    "asr_pipeline_summary",
    # events-table block (ms_round_convert, json_extract_props,
    # case_adaptive_guard, avg_confidence_coalesce, lag_lead_boundaries,
    # sequence_position, longest_span_top1, first_match_confidence,
    # leak_vote_2of3, moving_avg_range_frame, asof_join_orders,
    # range_join_events — retired in the r5 wave after green in BOTH
    # r3+r4; sessionize_events retired mid-r6 after green in r2+r5 to
    # fund the slot below; all stay pytest-oracle-covered every run,
    # and the events table keeps prefix reps via funnel + anomalies +
    # z-order below)
    # r6-new operator: first driver exposure must not wait a round
    # (the r5 verdict's task-2 lesson) — exact distributed quantiles
    # via bucket histogram + targeted recount, oracle-backed
    "exact_quantiles_orders",
    # late-r6 operators: the audit/eval/ML wave built after the wave-3
    # rotation — same first-round-exposure rule. Six slots funded by
    # deferring the second green of six once-green r5-wave members
    # whose families keep prefix reps (pack_sequences,
    # train_test_split, bottomk_sample_per_lang — curation keeps four
    # reps; funnel_stages — events keeps anomalies + z-order;
    # dedup_incremental — the bloom probe IS the incremental shape;
    # sink_training_shards — sinks keep sink_export_manifest). All six
    # retirees stay pytest-oracle-covered every run.
    "dedup_method_eval",
    "fk_integrity_audit",
    "embedding_drift",
    "linreg_closed_form",
    "logreg_irls_probe",
    "snapshot_diff",
    "profile_events",
)

# Rotation queue for the NEXT prefix refresh: after CORRECTNESS_r07,
# the never-checked set is the seventeen r7-new queries' FIRST rows (the
# sketch/PMI wave + basket_lift / sorted_neighborhood_pairs /
# incremental_agg_refresh / event_transition_matrix /
# record_linkage_fuzzy / sorted_neighborhood_multikey /
# linkage_entities / rfm_segments / cms_join_size / dedup_ppjoin /
# snm_recall_eval, all in the prefix above) — every other
# registered query has a driver row at least once. Next candidates to
# rotate IN: any r8-new operators first, then second greens for the
# deferred once-green members (vocab_coverage, lang_id_confusion,
# embedding_centroids, validate_embeddings, cohort_retention,
# dedup_cluster_stats, mixture_weights, minhash_calibration,
# length_filter_adaptive, profile_embeddings,
# dedup_substring_spans, mllib_minhash_pairs,
# multimodal_image_resize,
# pack_sequences, train_test_split, bottomk_sample_per_lang,
# funnel_stages, dedup_incremental, sink_training_shards,
# event_rate_anomalies) and for the wave-4 newcomers once green, then
# third greens for the long-retired r2/r3 blocks. Fund slots by
# retiring whichever wave-3/wave-4 members CORRECTNESS_r07 confirms
# green a second time.


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly: a rename would silently demote coverage
        raise RuntimeError(f"priority list references unknown queries: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "bench_queries", "oracles", "queries"]


def create_views(spark, sf_dir: str) -> None:
    """Register every star-schema table as a temp view (normalized
    timestamps, UTC pin) so users can ``spark.sql`` against the same
    relations the registry queries and the DuckDB oracle see."""
    from .sources.tables import TABLES, load_table

    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_sql_functions(spark) -> None:
    """Expose the scalar layer to SQL users: ``normalize_word(x)``,
    ``tokenize_text(x)``, ``ws_tokens(x)`` and ``num_to_words(x)``
    become callable from ``spark.sql`` strings. The Column helpers are
    mirrored as SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN) over
    the same Catalyst built-ins — full codegen, no Python; equivalence
    with the DataFrame layer is locked by tests/test_functions.py.
    Only ``num_to_words`` is a Python UDF, by the same design as the
    column layer (digits branch, C2)."""
    from .functions.text import num_to_words

    spark.udf.register(
        "num_to_words",
        # isdigit() alone accepts superscript/subscript digits that
        # int() rejects; require ascii so the UDF nulls, never throws
        lambda s: num_to_words(int(s))
        if s is not None and str(s).isascii() and str(s).isdigit()
        else None,
        "string",
    )
    bodies = (
        (
            "normalize_word",
            "STRING",
            "nullif(translate(regexp_replace(lower(x),"
            " '[^a-z0-9\\'\\-]', ''), '\\'-', ''), '')",
        ),
        ("tokenize_text", "ARRAY<STRING>",
         "regexp_extract_all(x, \"[A-Za-z0-9'-]+\", 0)"),
        ("ws_tokens", "ARRAY<STRING>", "split(lower(x), '\\\\s+')"),
    )
    for name, rtype, body in bodies:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(x STRING) "
            f"RETURNS {rtype} RETURN {body}"
        )
