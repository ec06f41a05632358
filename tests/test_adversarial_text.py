"""Adversarial-text oracle parity: the driver fixture is uniform word
salad, so NULL text, empty strings, repeated separators, punctuation
soup, digit runs, control characters, and degenerate repetition never
exercise the engines' edge-case disagreements (empty-list join, NULL
key grouping, \\s-class drift). This suite re-runs the text/dedup
oracle comparison on a hostile documents table — any Spark/DuckDB
divergence on these inputs is a query-design bug by the repo's
exactness contract."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_DOCS_SQL = """
SELECT * FROM (VALUES
  (0, NULL, 'en', 'src0', 0),
  (1, '', 'en', 'src1', 0),
  (2, 'one', 'de', 'src2', 3),
  (3, 'a  b   c', 'es', 'src3', 8),
  (4, '!!! ??? ... --- ;;; :::', 'fr', 'src4', 23),
  (5, repeat('loop the loop ', 500), 'zh', 'src5', 7000),
  (6, 'MiXeD CaSe WORDS lower UPPER', 'en', 'src6', 28),
  (7, '123 456 7890 0 00', 'en', 'src7', 17),
  (8, 'tab\tand\nnewline chars', 'de', 'src8', 22),
  (9, 'duplicate duplicate duplicate duplicate', 'es', 'src9', 39),
  -- r5 extension (VERDICT r4 task 7): unicode soup, PII in the RAW
  -- text (not just the deterministic augmentation), and a real
  -- benchmark-contamination hit. doc 97 is a benchmark member
  -- (97 % 97 = 0); docs 11/12 share 3-gram shingles with it below/
  -- above the 5% threshold; doc 0 (NULL) is also a benchmark member
  -- and must contribute nothing.
  (11, 'the quick brown fox leaps over fences today quite often indeed truly', 'en', 'src11', 69),
  (12, 'the quick brown fox jumps over the lazy dog entirely verbatim', 'en', 'src12', 62),
  (13, 'emoji 🤖 soup 🌍🌎🌏 and ☕ break time', 'en', 'src13', 36),
  (14, '中文文本没有空格所以整句是一个词', 'zh', 'src14', 16),
  (15, 'مرحبا بالعالم هذا نص عربي للاختبار', 'ar', 'src15', 34),
  (16, 'naïve café résumé coöperate reëlect', 'fr', 'src16', 35),
  (17, 'superscript ¹²³ and arabic ١٢٣٤ digits here', 'en', 'src17', 43),
  (18, 'zero​width joiner and non' || chr(160) || 'breaking space', 'en', 'src18', 40),
  (19, 'reach alice@example.org or 192.168.1.1 or call 555-1234 now', 'en', 'src19', 60),
  (20, 'fake ip 999.999.999.999 half phone 55-1234 plus 1234-5678 runs', 'en', 'src20', 63),
  (21, ' leading and trailing spaces ', 'de', 'src21', 29),
  (97, 'the quick brown fox jumps over the lazy dog', 'en', 'src97', 43),
  (9007199254740993, 'big id division exactness row with enough words to shingle', 'en', 'srcbig', 59)
) AS t(doc_id, text, lang, source, n_chars)
"""

QUERIES = [
    "lang_id_heuristic",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "stopword_filter",
    "tfidf_top_terms",
    "curation_signals_fused",
    "unigram_perplexity",
    "repetition_signals",
    "pii_scrub",
    "stratified_sample",
    "bottomk_sample_per_lang",
    "contamination_check",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "doc_winnowing",
    "dedup_substring_spans",
    "pack_sequences",
    "mixture_weights",
    "length_filter_adaptive",
    "word_coverage",
    "curation_funnel",
    "dedup_canonical",
    # r5 rotation newcomers on the documents table
    "dedup_incremental",
    "train_test_split",
    "sink_training_shards",
    # r5 new operators; the score-only unicode docs (doc_id % 5 == 0:
    # 0, 5, 15, 20) force bigram_perplexity through its backoff/OOV
    # paths here
    "heavy_hitter_words",
    "bigram_perplexity",
    # r6 new operators: NULL text must probe as definitely-new and
    # contribute nothing to the sketch
    "dedup_bloom_probe",
    "bloom_calibration",
    "cms_word_counts",
    "bpe_merges",
    "bpe_vocab",
    "snapshot_diff",
    "dedup_method_eval",
    "linreg_closed_form",
    "logreg_irls_probe",
    "langid_trained",
    # r7 sketch layer: NULL text contributes no registers, the empty
    # string is one (hashable) token on both engines, CJK/emoji/RTL
    # words round-trip through md5 as identical UTF-8 bytes, and the
    # huge doc_id exercises the parity split / shard modulus
    "hll_distinct",
    "hll_merge_shards",
    "kmv_corpus_overlap",
    "pmi_collocations",
    # r7 association/blocking layer: NULL text coalesces to the empty
    # sort key (still ranked, never shingle-verified); the linkage
    # projection gate (r8: fold + ASCII projection replaced the r7
    # ASCII gate) admits the accented/Cyrillic docs and drops
    # CJK/emoji on BOTH engines before the byte-vs-codepoint
    # Levenshtein divergence can bite
    "sorted_neighborhood_pairs",
    "sorted_neighborhood_multikey",
    "record_linkage_fuzzy",
    "linkage_entities",
    "cms_join_size",
    "dedup_ppjoin",
    "snm_recall_eval",
    "basket_lift",
    # r8 text wave: NULL text drops from every frame; the repeated
    # 'loop the loop' doc exercises tf-cosine's count weighting and
    # gopher's repetition-adjacent ratios; single-paragraph docs make
    # paragraph dedup degrade to exact first-occurrence; control-char
    # and emoji docs must not split/fold differently across engines
    "dedup_tf_cosine",
    "dedup_paragraph",
    "gopher_quality_flags",
    "bpe_fertility_by_lang",
    # r9 text wave: NULL text drops before feature extraction; the
    # hostile tokens (NUL bytes, emoji, RTL, huge words) round-trip
    # through the md5 bucket hash as identical UTF-8 bytes in both
    # engines; DSIR's min(lang) target pick and PSI's doc_id-parity
    # split are data-independent of the text content
    "dsir_importance_weights",
    "token_psi_drift",
    # r9 late wave: unigram-LM EM trains on the hostile word types
    # (NULL text drops; words over the length bound fall out on both
    # engines; control chars ride the md5-free fold untouched — and a
    # chr(31) inside a word corrupts the path join IDENTICALLY in
    # both engines, so parity holds even then); rate_by_source rides
    # the already-swept portable-MinHash pair set
    "unigram_lm_vocab",
    "unigram_lm_fertility",
    "dedup_rate_by_source",
    # bm25's ln() micro-quantization must hold on hostile tokens too
    # (the boundary audit covers the driver fixtures; this pins the
    # engineered unicode corpus end-to-end)
    "bm25_topk",
]


@pytest.fixture(scope="module")
def adversarial_sf_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="adv_sf_")
    duckdb.sql(f"COPY ({_DOCS_SQL}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_oracle_parity(spark, adversarial_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, adversarial_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], adversarial_sf_dir), name)
