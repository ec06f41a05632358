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
# The correctness harness checks a bounded prefix of the registry
# (every round so far: exactly the first 50), so dict order decides
# which queries get a CORRECTNESS row each round. Standing policy:
# the flagship and any driver REDS always stay; queries whose code
# changed since their last green re-enter for re-validation; brand-new
# operators get first-round exposure; remaining slots pay down
# verification debt (members with the fewest cumulative greens first).
# Everything rotated out stays covered by tests/test_oracle_parity.py
# on every suite run.
# ---------------------------------------------------------------------

_PRIORITY = (
    # ------------------------------------------------------------------
    # r8 rotation wave 5 (VERDICT r7 tasks 1+3). Composition of the 50:
    #   * the flagship + the two r7 driver REDS (hll_distinct /
    #     hll_column_profile stay until a green driver row exists —
    #     VERDICT r7 task 1; their green sibling hll_merge_shards stays
    #     as the family cross-check);
    #   * every query whose CODE changed this round, which therefore
    #     needs a fresh driver row: the fold-dependent trained-text and
    #     SNM/linkage queries (generated Unicode casefold + ASCII
    #     projection), the distributed_rank consumers (sampled-boundary
    #     buckets), and the ADVICE fixes (basket_lift lift overflow,
    #     cms_join_size empty-row floor, streaming_distinct_hll NULL
    #     gate);
    #   * the eight r8-new operators (first-round-exposure rule):
    #     pagerank_coorder, incremental_agg_retract,
    #     sampled_quantiles_orders, bpe_fertility_by_lang,
    #     dedup_tf_cosine, top_event_paths, gopher_quality_flags,
    #     dedup_paragraph;
    #   * the twenty deferred once-green members queued since wave 3/4
    #     (the full api.py queue list) — their SECOND greens;
    #   * a second green for the refactor-adjacent
    #     exact_quantiles_orders (helper extraction).
    # Funded by retiring the CORRECTNESS_r07-green r7 newcomers
    # (dedup_ppjoin, event_transition_matrix, cms_word_counts …), the
    # twice-green ANN/audit/ML block (green r6+r7), and the wave-4
    # rows-only members after their first driver row (streaming_bloom_
    # gate, vad, mllib tfidf/brp, multimodal_frame_sample). Every
    # retiree stays pytest-oracle-covered on every suite run.
    # ------------------------------------------------------------------
    "word_coverage",
    "hll_distinct",
    "hll_column_profile",
    "hll_merge_shards",
    "rfm_segments",
    "sorted_neighborhood_pairs",
    "sorted_neighborhood_multikey",
    "snm_recall_eval",
    "record_linkage_fuzzy",
    "linkage_entities",
    "bpe_merges",
    "bpe_vocab",
    "langid_trained",
    "pmi_collocations",
    "basket_lift",
    "cms_join_size",
    "streaming_distinct_hll",
    "pagerank_coorder",
    "incremental_agg_retract",
    "sampled_quantiles_orders",
    "bpe_fertility_by_lang",
    "dedup_minhash_lsh",
    "asr_pipeline_clips",
    "asr_pipeline_summary",
    "sink_export_manifest",
    "vocab_coverage",
    "lang_id_confusion",
    "embedding_centroids",
    "validate_embeddings",
    "cohort_retention",
    "dedup_cluster_stats",
    "mixture_weights",
    "minhash_calibration",
    "length_filter_adaptive",
    "profile_embeddings",
    "dedup_substring_spans",
    "mllib_minhash_pairs",
    "multimodal_image_resize",
    "pack_sequences",
    "train_test_split",
    "bottomk_sample_per_lang",
    "funnel_stages",
    "dedup_incremental",
    "sink_training_shards",
    "event_rate_anomalies",
    # second green: refactor-adjacent (the _disc_quantiles extraction)
    "exact_quantiles_orders",
    # r8-new (first-round exposure; slots funded by retiring the
    # twice-green heavy_hitter_words — text keeps bpe×3/langid/pmi
    # reps — and deferring the second greens of bloom_calibration,
    # kmv_corpus_overlap and incremental_agg_refresh: the sketch
    # family keeps hll×3 + cms_join_size in the prefix, IVM keeps the
    # new retract path, and all three deferred members stay
    # pytest-oracle-covered every run)
    "dedup_tf_cosine",
    "top_event_paths",
    "gopher_quality_flags",
    "dedup_paragraph",
)

# Rotation queue for the NEXT prefix refresh: after CORRECTNESS_r08,
# the never-checked set is the eight r8-new operators' first rows plus
# this wave's twenty second-green attempts. Next candidates to rotate
# IN: any r9-new operators first, then (a) second greens for the four
# r8 newcomers and for the r7 first-green members retired this round
# (dedup_ppjoin, event_transition_matrix, cms_word_counts,
# streaming_bloom_gate, vad_speech_segments, mllib_tfidf_features,
# mllib_brp_ann_topk, multimodal_frame_sample), then (b) third greens
# for the long-retired r2/r3 blocks. Fund slots by retiring whichever
# members CORRECTNESS_r08 confirms at ≥2 cumulative greens (the
# twenty deferred members above + the changed-code re-validations).


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
