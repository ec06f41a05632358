"""Corpus-curation safety/sampling operators (north star, SURVEY §6):
PII scrubbing, repetition signals, deterministic stratified sampling,
and benchmark-contamination checks — the filter/scrub/sample stages a
large-scale LLM training-data pipeline runs between raw scans and
training shards.

All pure column expressions (plus one broadcast join) with exact
DuckDB oracles: both engines evaluate the same regexes on explicit
character classes (no ``\\s``/``\\d`` shorthands, which Java and RE2
define differently), the same list arithmetic, and the same md5-based
portable hash, so value equality is exact.

Scale notes: every operator is one pass over the scan inside
whole-stage codegen; the contamination check joins exploded corpus
shingles against the (small, broadcast) benchmark shingle set — the
corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .shingles import shingles_col, shingles_sql, tokens_attr
from .similarity import _VALID_WHERE as _SIM_VALID_WHERE

# ---------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------

# Explicit-class regexes valid (and identical in meaning) in both Java
# regex and RE2. The driver's documents are synthetic word-salad with
# no PII, so the query embeds deterministic PII-shaped strings derived
# from doc_id first — the scrub logic is exercised on every row, and
# the redaction counts are non-trivially checkable.
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
_RE_PHONE = r"[0-9]{3}-[0-9]{4}"

_PII_AUG_SQL = (
    "text || ' contact user' || doc_id || '@example.com phone 555-' || "
    "lpad(cast(doc_id % 10000 AS varchar), 4, '0') || ' ip 10.' || "
    "(doc_id % 256) || '.' || ((doc_id // 7) % 256) || '.' || ((doc_id // 13) % 256)"
)

_PII_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(aug,
           '{_RE_EMAIL}', '<EMAIL>', 'g'),
           '{_RE_IP}', '<IP>', 'g'),
           '{_RE_PHONE}', '<PHONE>', 'g') AS clean_text,
       cast(len(regexp_extract_all(aug, '{_RE_EMAIL}')) AS bigint) AS n_emails,
       cast(len(regexp_extract_all(aug, '{_RE_IP}')) AS bigint) AS n_ips,
       cast(len(regexp_extract_all(regexp_replace(regexp_replace(aug,
           '{_RE_EMAIL}', '<EMAIL>', 'g'), '{_RE_IP}', '<IP>', 'g'),
           '{_RE_PHONE}')) AS bigint) AS n_phones
FROM (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
"""


@register("pii_scrub", oracle=_PII_SQL, tags=("text", "safety"))
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction scan: emails → ``<EMAIL>``, IPv4 → ``<IP>``,
    phone-shaped digit groups → ``<PHONE>``, with per-document match
    counts. Replacement order matters (emails/IPs contain digit runs a
    phone pattern could claim) and is identical on both engines:
    email, then IP, then phone — phones are counted AFTER the earlier
    redactions for the same reason. One pass, pure codegen."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        # integer `div`, not double /: exact past 2^53 and matching
        # DuckDB's `//` for the non-negative ids these tables use
        (F.expr("doc_id div 7") % 256).cast("string"),
        F.lit("."),
        (F.expr("doc_id div 13") % 256).cast("string"),
    )
    no_email = F.regexp_replace(aug, _RE_EMAIL, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, _RE_IP, "<IP>")
    clean = F.regexp_replace(no_ip, _RE_PHONE, "<PHONE>")
    count = lambda src, pat: F.size(  # noqa: E731
        F.regexp_extract_all(src, F.lit(pat), 0)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        count(aug, _RE_EMAIL).alias("n_emails"),
        count(aug, _RE_IP).alias("n_ips"),
        count(no_ip, _RE_PHONE).alias("n_phones"),
    )


# ---------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------

_REP_SQL = """
SELECT doc_id,
       cast(n AS bigint) AS n_tokens,
       1.0 - cast(n_uniq AS double) / n AS dup_word_frac,
       cast(top_word AS double) / n AS top_word_frac,
       CASE WHEN n > 1 THEN cast(top_bigram AS double) / (n - 1) END AS top_bigram_frac,
       (1.0 - cast(n_uniq AS double) / n) > 0.7
         OR (n > 1 AND cast(top_bigram AS double) / (n - 1) > 0.11) AS is_repetitive
FROM (
  SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS n_uniq,
         list_max([len(list_filter(t, y -> y = x)) for x in list_distinct(t)]) AS top_word,
         CASE WHEN len(t) > 1 THEN
           list_max([len(list_filter(bg, y -> y = x)) for x in list_distinct(bg)])
         END AS top_bigram
  FROM (
    SELECT doc_id, t, [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS bg
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  )
  WHERE len(t) > 0
)
"""


@register("repetition_signals", oracle=_REP_SQL, tags=("text", "quality"))
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rule
    family): duplicate-word fraction, most-frequent-word fraction, and
    most-frequent-bigram fraction, plus a composite repetitive flag.
    Frequency maxima are computed as distinct×occurrences list
    arithmetic — O(n·uniq) per document inside codegen, no shuffle;
    the document, not the corpus, bounds the cost."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)

    def top_freq(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            )
        )

    bigrams = F.transform(
        F.slice(t, 1, n - 1), lambda x, i: F.concat_ws(" ", x, F.get(t, i + 1))
    )
    n_uniq = F.size(F.array_distinct(t))
    dup_frac = 1.0 - n_uniq.cast("double") / n
    top_word_frac = top_freq(t).cast("double") / n
    top_bigram_frac = F.when(
        n > 1, top_freq(bigrams).cast("double") / (n - 1)
    )
    return docs.filter(n > 0).select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        dup_frac.alias("dup_word_frac"),
        top_word_frac.alias("top_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        # single-token docs have no bigram signal: that leg is FALSE,
        # not NULL (matching the oracle's n>1 guard)
        (
            (dup_frac > 0.7)
            | F.coalesce(top_bigram_frac > 0.11, F.lit(False))
        ).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, MassiveText filter bundle)
# ---------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_MWL_MILLI, _G_MAX_MWL_MILLI = 3_000, 10_000  # mean word length 3..10
_G_MAX_SYMBOL_PPM = 100_000   # (# + ellipsis) per word ≤ 0.1
_G_MAX_BULLET_PPM = 900_000   # < 90% of lines bullet-led
_G_MAX_ELLIPSIS_PPM = 300_000  # < 30% of lines ellipsis-ended
_G_MIN_ALPHA_PPM = 800_000    # ≥ 80% of words contain a letter

_STOPS_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)

_GOPHER_SQL = f"""
SELECT doc_id, n_words, mean_word_len_milli, symbol_ppm, bullet_ppm,
       ellipsis_ppm, alpha_word_ppm, stop_hits,
       (n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
         AND mean_word_len_milli BETWEEN {_G_MIN_MWL_MILLI} AND {_G_MAX_MWL_MILLI}
         AND symbol_ppm <= {_G_MAX_SYMBOL_PPM}
         AND bullet_ppm <= {_G_MAX_BULLET_PPM}
         AND ellipsis_ppm <= {_G_MAX_ELLIPSIS_PPM}
         AND alpha_word_ppm >= {_G_MIN_ALPHA_PPM}
         AND stop_hits >= 2 AS keep
FROM (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(length(array_to_string(t, '')) * 1000 // len(t) AS BIGINT)
           AS mean_word_len_milli,
         CAST((length(text) - length(replace(text, '#', ''))
               + (length(text) - length(replace(text, '...', ''))) // 3
               + length(text) - length(replace(text, '…', ''))) * 1000000
              // len(t) AS BIGINT) AS symbol_ppm,
         CAST(len(list_filter(ls, x -> ltrim(x) LIKE '-%'
                                    OR ltrim(x) LIKE '*%'
                                    OR ltrim(x) LIKE '•%')) * 1000000
              // len(ls) AS BIGINT) AS bullet_ppm,
         CAST(len(list_filter(ls, x -> rtrim(x) LIKE '%...'
                                    OR rtrim(x) LIKE '%…')) * 1000000
              // len(ls) AS BIGINT) AS ellipsis_ppm,
         CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
              * 1000000 // len(t) AS BIGINT) AS alpha_word_ppm,
         CAST(len(list_filter([{_STOPS_SQL}],
                              s -> list_contains(t, s))) AS BIGINT) AS stop_hits
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex({{fold}}, '\\s+'),
                           x -> x <> '') AS t,
               string_split(text, chr(10)) AS ls
        FROM documents WHERE text IS NOT NULL)
  WHERE len(t) > 0
)
ORDER BY doc_id
"""

# the tokenizer casefold is the generated translate table (identical
# on both engines; lower() diverges outside ASCII and İ even changes
# LENGTH under Spark's lower, skewing mean_word_len)
from ..functions.casefold import FOLD_DST as _F_DST  # noqa: E402
from ..functions.casefold import FOLD_SRC as _F_SRC  # noqa: E402

_GOPHER_SQL = _GOPHER_SQL.format(
    fold=f"translate(text, '{_F_SRC}', '{_F_DST}')"
)


@register("gopher_quality_flags", oracle=_GOPHER_SQL, tags=("text", "quality"))
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GOPHER quality-filter bundle (Rae et al. 2021, Appendix A —
    the MassiveText rules that RefinedWeb/Dolma-class pipelines reuse):
    word-count bounds, mean-word-length window, symbol-to-word ratio
    (#/ellipsis), bullet-led and ellipsis-ended line fractions,
    alphabetic-word fraction, and a stop-word floor — plus the fused
    keep flag. Complements repetition_signals (the rule family's other
    half) and curation_signals_fused.

    Exact-integer surface: every ratio is a bigint ppm/milli floor
    division, so the DuckDB replay is hash-exact; all signals are
    per-row column expressions inside one scan — no shuffle at all
    (the profile shape every 100 TB gate wants: cost = one pass,
    pruned to the text column)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    t = F.filter(
        F.split(F.translate(F.col("text"), _F_SRC, _F_DST), r"\s+"),
        lambda x: x != "",
    )
    ls = F.split(F.col("text"), "\n")
    n_words = F.size(t).cast("bigint")
    chars = F.length(F.array_join(t, "")).cast("bigint")
    hashes = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    dots3 = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    ell = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("…"), F.lit(""))
    )
    bullets = F.size(
        F.filter(
            ls,
            lambda x: F.ltrim(x).startswith("-")
            | F.ltrim(x).startswith("*")
            | F.ltrim(x).startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            ls,
            lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
        )
    )
    alpha_words = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPS])
    stop_hits = F.size(
        F.filter(stops, lambda s: F.array_contains(t, s))
    ).cast("bigint")
    out = docs.filter(n_words > 0).select(
        "doc_id",
        n_words.alias("n_words"),
        (chars * 1000).cast("bigint").alias("_c1000"),
        ((hashes + dots3.cast("bigint") + ell) * 1_000_000)
        .cast("bigint")
        .alias("_sym"),
        (bullets.cast("bigint") * 1_000_000).alias("_bul"),
        (ellipsis_lines.cast("bigint") * 1_000_000).alias("_ell"),
        (alpha_words.cast("bigint") * 1_000_000).alias("_alpha"),
        F.size(ls).cast("bigint").alias("_nl"),
        stop_hits.alias("stop_hits"),
    )
    out = out.select(
        "doc_id",
        "n_words",
        F.expr("_c1000 div n_words").alias("mean_word_len_milli"),
        F.expr("_sym div n_words").alias("symbol_ppm"),
        F.expr("_bul div _nl").alias("bullet_ppm"),
        F.expr("_ell div _nl").alias("ellipsis_ppm"),
        F.expr("_alpha div n_words").alias("alpha_word_ppm"),
        "stop_hits",
    )
    keep = (
        F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
        & F.col("mean_word_len_milli").between(_G_MIN_MWL_MILLI, _G_MAX_MWL_MILLI)
        & (F.col("symbol_ppm") <= _G_MAX_SYMBOL_PPM)
        & (F.col("bullet_ppm") <= _G_MAX_BULLET_PPM)
        & (F.col("ellipsis_ppm") <= _G_MAX_ELLIPSIS_PPM)
        & (F.col("alpha_word_ppm") >= _G_MIN_ALPHA_PPM)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("keep", keep).orderBy("doc_id")


# ---------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------

# Per-language keep rates (percent): downsample the dominant language,
# keep the tails — the mixing step of corpus assembly.
_RATES = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 60}
_DEFAULT_RATE = 50

_RATE_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATES.items()))
    + f" ELSE {_DEFAULT_RATE} END"
)

_SAMPLE_SQL = f"""
SELECT doc_id, lang, bucket
FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5('strat' || doc_id), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
WHERE bucket < {_RATE_CASE_SQL}
"""


@register("stratified_sample", oracle=_SAMPLE_SQL, tags=("sampling",))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: an md5-derived bucket in
    [0,100) per document, kept when under the stratum's rate — the
    language-mixing / domain-mixing downsampler. Engine-portable and
    reproducible (unlike ``rand()``-based sampling, reruns and
    backfills keep exactly the same rows); one scan, no shuffle, and
    the keep decision pushes down to the scan as an ordinary filter."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.lit(_DEFAULT_RATE)
    for k, v in sorted(_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


# ---------------------------------------------------------------------
# Benchmark-contamination check
# ---------------------------------------------------------------------

_CONTAM_K = 3
_CONTAM_MOD = 97  # doc_id % MOD == 0 → the held-out "benchmark" set
_CONTAM_THRESH = 0.05

_CONTAM_SQL = f"""
WITH {shingles_sql(_CONTAM_K)},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_CONTAM_MOD} = 0),
corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {_CONTAM_MOD} <> 0),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corpus c JOIN bench b USING (shingle)
  GROUP BY c.doc_id
),
totals AS (
  SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id
)
SELECT t.doc_id,
       cast(t.n_shingles AS bigint) AS n_shingles,
       cast(coalesce(h.n_hits, 0) AS bigint) AS n_contaminated,
       cast(coalesce(h.n_hits, 0) AS double) / t.n_shingles AS contaminated_frac,
       cast(coalesce(h.n_hits, 0) AS double) / t.n_shingles >= {_CONTAM_THRESH}
         AS is_contaminated
FROM totals t LEFT JOIN hits h USING (doc_id)
"""


@register("contamination_check", oracle=_CONTAM_SQL, tags=("text", "dedup"))
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: fraction of a document's distinct
    word {k}-grams that appear anywhere in a held-out benchmark set
    (here ``doc_id % {mod} == 0`` stands in for the eval suite). The
    benchmark shingle set is tiny by construction — it broadcasts, so
    the corpus side is scan → explode → broadcast-probe → re-group on
    doc_id: ONE shuffle keyed by doc_id, independent of benchmark
    size. At 100 TB the eval suite is still MBs; the plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked, toks = tokens_attr(docs)
    # token-count pre-filter, NOT shingles.isNotNull(): a shingle-
    # column filter pushes to the scan with the HOF chain inlined
    # (r11 forensics, SCALING.md)
    # Explode the EXPRESSION, not a projected alias: attribute-input
    # explode triggers InferFiltersFromGenerate, whose inferred
    # isnotnull/size>0 filters push to the scan with the shingle
    # chain inlined (shingles.py second contract).
    floored = toked.filter(F.size(toks) >= _CONTAM_K)
    bench = (
        floored.filter(F.col("doc_id") % _CONTAM_MOD == 0)
        .select(F.explode(shingles_col(toks, _CONTAM_K)).alias("shingle"))
        .distinct()
    )
    corpus = floored.filter(F.col("doc_id") % _CONTAM_MOD != 0).select(
        "doc_id", F.explode(shingles_col(toks, _CONTAM_K)).alias("shingle")
    )
    # ONE pass: left-probe the broadcast benchmark set, then a single
    # doc_id aggregation counts total and matched shingles together.
    marked = corpus.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.count("_hit").cast("bigint").alias("n_contaminated"),
    )
    frac = F.col("n_contaminated").cast("double") / F.col("n_shingles")
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        frac.alias("contaminated_frac"),
        (frac >= _CONTAM_THRESH).alias("is_contaminated"),
    )


# ---------------------------------------------------------------------
# Sequence packing (concat-and-chunk sharding)
# ---------------------------------------------------------------------

_PACK_CHUNK = 128  # tokens per training chunk (small, so shards actually split)
_PACK_SHARDS = 16  # packing shards per language

_PACK_SQL = f"""
SELECT doc_id, lang, shard,
       cast(n AS bigint) AS n_tokens,
       cast(cum - n AS bigint) AS stream_start,
       cast((cum - n) // {_PACK_CHUNK} AS bigint) AS first_chunk,
       cast((cum - 1) // {_PACK_CHUNK} AS bigint) AS last_chunk,
       cast((cum - 1) // {_PACK_CHUNK} - (cum - n) // {_PACK_CHUNK} + 1 AS bigint)
         AS chunks_spanned
FROM (
  SELECT doc_id, lang, doc_id % {_PACK_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n,
         sum(len(string_split(text, ' '))) OVER (
           PARTITION BY lang, doc_id % {_PACK_SHARDS}
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
"""


@register("pack_sequences", oracle=_PACK_SQL, tags=("sampling", "pipeline"))
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing manifest: documents are laid
    end-to-end per (language, shard) token stream and cut into
    fixed-size training chunks; each doc reports its stream offset and
    the chunk ids it spans — the sharding plan for tokenize-and-pack
    pretraining data.

    All-integer window arithmetic (exact under any partitioning).
    Scale: the running sum is per (lang, shard) — shards bound every
    window partition, so no global ordering exists anywhere; adding
    shards is how the same plan spreads over 1000 executors."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("long")
    shard = (F.col("doc_id") % _PACK_SHARDS).alias("shard")
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = docs.select(
        "doc_id", "lang", shard, n.alias("n")
    ).withColumn("cum", F.sum("n").over(w))
    first_chunk = F.floor((F.col("cum") - F.col("n")) / _PACK_CHUNK)
    last_chunk = F.floor((F.col("cum") - 1) / _PACK_CHUNK)
    return staged.select(
        "doc_id",
        "lang",
        "shard",
        F.col("n").alias("n_tokens"),
        (F.col("cum") - F.col("n")).alias("stream_start"),
        first_chunk.cast("bigint").alias("first_chunk"),
        last_chunk.cast("bigint").alias("last_chunk"),
        (last_chunk - first_chunk + 1).cast("bigint").alias("chunks_spanned"),
    )


# ---------------------------------------------------------------------
# Incremental dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------

_INC_MOD = 5  # doc_id % MOD == 0 → the incoming batch; rest = corpus

# Key = the same first-8-words prefix dedup_exact groups on (full texts
# in this corpus are all unique; production would use sha256(text) —
# the plan is identical, only the key expression changes).
_INC_SQL = f"""
WITH h AS (SELECT doc_id,
                  array_to_string((string_split(text, ' '))[1:8], ' ') AS h
           FROM documents),
corpus AS (SELECT DISTINCT h FROM h WHERE doc_id % {_INC_MOD} <> 0),
incoming AS (SELECT doc_id, h FROM h WHERE doc_id % {_INC_MOD} = 0)
SELECT i.doc_id,
       (c.h IS NOT NULL) AS is_corpus_dup,
       (i.doc_id <> min(i.doc_id) OVER (PARTITION BY i.h)) AS is_batch_dup,
       (c.h IS NULL AND i.doc_id = min(i.doc_id) OVER (PARTITION BY i.h)) AS keep
FROM incoming i LEFT JOIN corpus c USING (h)
"""


@register("dedup_incremental", oracle=_INC_SQL, tags=("dedup", "pipeline"))
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: a new batch checked against the
    existing corpus — the shape every periodically-refreshed training
    corpus runs (new crawl vs what's already ingested). An incoming
    doc survives iff its dedup key is absent from the corpus AND it
    is the first holder of that key within the batch.

    Scale: both sides reduce to (doc_id, key) — the join and the
    within-batch window shuffle short keys, never document bodies;
    in production the corpus side is a pre-bucketed hash index, making
    the probe co-partitioned."""
    docs = load_table(spark, sf_dir, "documents")
    # NULL text must key to NULL (joins/windows then treat it as its
    # own non-matching row, like the oracle's array_to_string(NULL)):
    # concat_ws alone folds a NULL array to '' and would spuriously
    # collide NULL-text docs with empty-text docs.
    key = F.when(
        F.col("text").isNotNull(),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)),
    )
    h = docs.select("doc_id", key.alias("h"))
    corpus = (
        h.filter(F.col("doc_id") % _INC_MOD != 0).select("h").distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    incoming = h.filter(F.col("doc_id") % _INC_MOD == 0)
    from pyspark.sql import Window as W

    first = F.min("doc_id").over(W.partitionBy("h"))
    joined = incoming.join(corpus, "h", "left")
    is_corpus = F.coalesce(F.col("_in_corpus"), F.lit(False))
    is_batch = F.col("doc_id") != first
    return joined.select(
        "doc_id",
        is_corpus.alias("is_corpus_dup"),
        is_batch.alias("is_batch_dup"),
        (~is_corpus & ~is_batch).alias("keep"),
    )


# ---------------------------------------------------------------------
# Domain/language mixture planning
# ---------------------------------------------------------------------

_MIX_MAX_WEIGHT = 3.0  # upsampling cap (epochs over a small stratum)

_MIX_SQL = f"""
WITH s AS (
  SELECT lang, count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY lang
),
t AS (SELECT *, sum(n_tokens) OVER () AS total,
             count(*) OVER () AS n_langs FROM s)
SELECT lang,
       cast(n_docs AS bigint) AS n_docs,
       cast(n_tokens AS bigint) AS n_tokens,
       cast(n_tokens AS double) / total AS token_share,
       1.0 / n_langs AS target_share,
       least((1.0 / n_langs) / (cast(n_tokens AS double) / total),
             {_MIX_MAX_WEIGHT}) AS sampling_weight
FROM t
"""


@register("mixture_weights", oracle=_MIX_SQL, tags=("sampling", "agg"))
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: per-language token counts and the sampling
    weight that moves the realized token share toward a uniform
    target, capped at {max}× upsampling — the report that feeds
    stratified_sample's rates. Integer token sums (exact under any
    partitioning) with one deterministic division at the end; the
    totals ride an all-strata window over a |langs|-row frame."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("n_tokens"),
    )
    w = W.partitionBy()
    total = F.sum("n_tokens").over(w)
    n_langs = F.count("*").over(w)
    share = F.col("n_tokens").cast("double") / total
    target = 1.0 / n_langs
    return s.select(
        "lang",
        "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        share.alias("token_share"),
        target.alias("target_share"),
        F.least(target / share, F.lit(_MIX_MAX_WEIGHT)).alias("sampling_weight"),
    )


# ---------------------------------------------------------------------
# Adaptive (quantile-driven) length filter
# ---------------------------------------------------------------------

_LEN_LO_Q = 0.05
_LEN_HI_Q = 0.95

_LEN_FILTER_SQL = f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
q AS (SELECT round(quantile_cont(n, {_LEN_LO_Q}), 6) AS lo,
             round(quantile_cont(n, {_LEN_HI_Q}), 6) AS hi
      FROM t)
SELECT doc_id, cast(n AS bigint) AS n_tokens, lo, hi,
       n >= lo AND n <= hi AS keep
FROM t, q
"""


@register("length_filter_adaptive", oracle=_LEN_FILTER_SQL, tags=("text", "quality"))
def length_filter_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven length gate: cut the corpus' own p5/p95 token-count
    tails rather than fixed thresholds — the adaptive variant of the
    Gopher length rule, re-derived per corpus so it survives domain
    shifts. Exact interpolated percentiles (both engines sort +
    linearly interpolate identically; thresholds rounded to 6 dp so an
    integer count never straddles an ulp), broadcast back over the
    scan as two scalars.

    Scale: exact global percentile sorts once; at 100 TB swap in
    approx_percentile (mergeable sketch) with the same plan shape —
    the keep-flag join is a 1-row broadcast either way."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    q = t.agg(
        F.round(F.expr(f"percentile(n, {_LEN_LO_Q})"), 6).alias("lo"),
        F.round(F.expr(f"percentile(n, {_LEN_HI_Q})"), 6).alias("hi"),
    )
    return t.crossJoin(F.broadcast(q)).select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        "lo",
        "hi",
        ((F.col("n") >= F.col("lo")) & (F.col("n") <= F.col("hi"))).alias("keep"),
    )


# ---------------------------------------------------------------------
# Multi-signal curation (text × embedding fusion)
# ---------------------------------------------------------------------

_MM_OUTLIER_COS = -0.05  # mirror of similarity._OUTLIER_COS
_MM_SCALE = 1_000_000

_MM_CURATION_SQL = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
txt AS (
  SELECT doc_id, lang,
         cast(len(list_distinct(tk)) AS double) / len(tk) AS uniq_ratio,
         len(tk) AS n_tokens
  FROM t WHERE len(tk) > 0
),
v AS (SELECT vec_id, label, cast(embedding AS double[]) AS e,
             [cast(floor(x * {_MM_SCALE} + 0.5) AS bigint)
              for x in cast(embedding AS double[])] AS qe
      FROM embeddings
      WHERE {_SIM_VALID_WHERE}),
s AS (SELECT label, i, sum(qe[i]) AS sq, count(*) AS n
      FROM v, unnest(range(1, 65)) AS u(i) GROUP BY label, i),
c AS (SELECT label, list(cast(sq AS double) / (n * {_MM_SCALE}.0) ORDER BY i) AS ce
      FROM s GROUP BY label),
emb AS (
  SELECT v.vec_id AS doc_id,
         list_dot_product(v.e, c.ce)
           / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)))
           AS centroid_cos
  FROM v JOIN c USING (label)
)
SELECT txt.doc_id, txt.lang,
       cast(txt.n_tokens AS bigint) AS n_tokens,
       txt.uniq_ratio,
       round(emb.centroid_cos, 6) AS centroid_cos,
       (txt.uniq_ratio >= 0.3
        AND emb.centroid_cos >= {_MM_OUTLIER_COS}) AS keep
FROM txt JOIN emb USING (doc_id)
ORDER BY txt.doc_id
"""


@register(
    "corpus_curation_multimodal",
    oracle=_MM_CURATION_SQL,
    tags=("text", "similarity", "pipeline"),
)
def corpus_curation_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation fused across modalities: a document survives only if
    BOTH its text signal (lexical diversity) and its embedding signal
    (not a far-from-prototype outlier in its cluster) pass — the
    text × vector composition a production corpus gate runs when
    embeddings exist for every document.

    Scale: the text side is a zero-exchange scan; the embedding side
    reuses the fixed-point centroid aggregation (|labels|·dim longs on
    the wire); the fusion join keys doc_id=vec_id — co-partitioned in
    a real layout, one exchange here.
    """
    from .similarity import centroid_cos_frame

    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    txt = docs.filter(n > 0).select(
        "doc_id",
        "lang",
        n.cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(t)).cast("double") / n).alias("uniq_ratio"),
    )
    emb = centroid_cos_frame(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "centroid_cos_raw"
    )
    keep = (F.col("uniq_ratio") >= 0.3) & (
        F.col("centroid_cos_raw") >= _MM_OUTLIER_COS
    )
    return (
        txt.join(emb, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "uniq_ratio",
            F.round("centroid_cos_raw", 6).alias("centroid_cos"),
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Fused single-scan curation signal vector
# ---------------------------------------------------------------------

_FUSED_SQL = f"""
SELECT doc_id, lang,
       cast(len(t) AS bigint) AS n_tokens,
       cast(len(list_distinct(t)) AS double) / len(t) AS uniq_ratio,
       cast(len(list_filter(lt, x -> x IN ({{sw}}))) AS double) / len(t)
         AS stop_ratio,
       0.4 * least(cast(len(t) AS double) / 100, 1.0)
         + 0.3 * (cast(len(list_distinct(lt)) AS double) / len(t))
         + 0.3 * (cast(len(list_filter(lt, x -> x IN ({{sw}}))) AS double) / len(t))
         AS quality_score,
       1.0 - cast(len(list_distinct(t)) AS double) / len(t) AS dup_word_frac,
       cast(length(text) AS bigint) AS n_chars,
       cast(ceil(length(text) / 4.0) AS bigint) AS approx_bpe_tokens
FROM (SELECT doc_id, lang, text,
             string_split(text, ' ') AS t,
             string_split(lower(text), ' ') AS lt
      FROM documents)
WHERE len(t) > 0
"""


def _fused_sql() -> str:
    from .text_analysis import _SW_SQL_LIST

    return _FUSED_SQL.format(sw=_SW_SQL_LIST)


def fused_signals_projection(docs: DataFrame) -> DataFrame:
    """The fused signal projection applied to ANY documents frame —
    batch scan or stream (it is a stateless select, so the identical
    expressions run under Structured Streaming in
    streaming.windows.streaming_curation_gate_q)."""
    from .text_analysis import _STOPWORDS

    t = F.split(F.col("text"), " ")
    lt = F.split(F.lower(F.col("text")), " ")
    n = F.size(t)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(lt, lambda x: F.array_contains(sw, x)))
    uniq = F.size(F.array_distinct(t)).cast("double") / n
    uniq_l = F.size(F.array_distinct(lt)).cast("double") / n
    stop_ratio = n_stop.cast("double") / n
    quality = (
        0.4 * F.least(n.cast("double") / 100, F.lit(1.0))
        + 0.3 * uniq_l
        + 0.3 * stop_ratio
    )
    return docs.filter(n > 0).select(
        "doc_id",
        "lang",
        n.cast("bigint").alias("n_tokens"),
        uniq.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality_score"),
        (1.0 - uniq).alias("dup_word_frac"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
    )


@register("curation_signals_fused", oracle=_fused_sql(), tags=("text", "quality", "pipeline"))
def curation_signals_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every per-document curation signal in ONE scan: token counts,
    lexical diversity, stopword ratio, the composite quality score,
    duplicate-word fraction, character and approximate-BPE budgets —
    the fused feature vector a production gate computes once per
    ingest instead of re-scanning per rule. All signals are codegen'd
    column expressions over the same split arrays; the plan is a
    zero-exchange projection, so adding a signal costs compute, never
    another pass over 100 TB."""
    return fused_signals_projection(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------
# Exact-k per-stratum sampling (bottom-k by hash, KMV-style)
# ---------------------------------------------------------------------

_BK_K = 20       # sample size per language
_BK_MARGIN = 8.0  # pre-filter keeps ~margin*k rows per stratum

_BOTTOMK_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('tok' || doc_id), 1, 8))::BIGINT AS bucket
  FROM documents
),
n AS (SELECT lang, count(*) AS n_docs FROM h GROUP BY lang),
pre AS (
  SELECT h.doc_id, h.lang, h.bucket
  FROM h JOIN n USING (lang)
  WHERE cast(bucket AS double) / 4294967296.0
        < least(1.0, {_BK_MARGIN} * {_BK_K} / n_docs)
)
SELECT doc_id, lang, bucket,
       cast(row_number() OVER (PARTITION BY lang
                               ORDER BY bucket, doc_id) AS bigint) AS sample_rank
FROM pre
QUALIFY sample_rank <= {_BK_K}
ORDER BY lang, sample_rank
"""


@register("bottomk_sample_per_lang", oracle=_BOTTOMK_SQL, tags=("sampling",))
def bottomk_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k per-stratum sample: the k documents with the smallest
    md5-derived hash per language (bottom-k / KMV sampling) — the
    reproducible "give me exactly 10k docs per language for tokenizer
    training" primitive. Unlike stratified_sample (a keep-RATE), this
    guarantees the sample SIZE, and reruns/backfills select identical
    rows.

    Scale: the naive plan windows the whole corpus by lang — a skewed
    full shuffle. Instead a margin pre-filter (hash fraction <
    {margin}·k/n per stratum, n from a tiny broadcast count) drops
    ~99.99% of a large corpus BEFORE the exact bottom-k window, which
    then sorts ~{margin}·k rows per stratum. The binomial tail
    P(survivors < k) is negligible for any n (and when n ≤ {margin}·k
    the filter keeps everything, so small strata are exact by
    construction); tests assert every stratum fills its k."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tok"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
    )
    h = docs.select("doc_id", "lang", bucket.alias("bucket"))
    n = h.groupBy("lang").agg(F.count("*").alias("n_docs"))
    frac = F.least(F.lit(1.0), _BK_MARGIN * _BK_K / F.col("n_docs"))
    pre = h.join(F.broadcast(n), "lang").filter(
        F.col("bucket").cast("double") / 4294967296.0 < frac
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy("bucket", "doc_id")
    return (
        pre.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= _BK_K)
        .select("doc_id", "lang", "bucket", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


# ---------------------------------------------------------------------
# End-to-end curation funnel (the run report)
# ---------------------------------------------------------------------

_FN_LEN_LO, _FN_LEN_HI = 10, 2000
_FN_UNIQ, _FN_QUALITY = 0.3, 0.36  # ~corpus median composite score

_FN_STAGES = ("length", "diversity", "quality", "perplexity", "dedup")


def _funnel_sql() -> str:
    from .dedup import _CANON_SQL
    from .text_analysis import _LM_PPL_SQL

    sig = _fused_sql().replace("WHERE len(t) > 0", "WHERE len(t) > 0 ")
    ppl = _LM_PPL_SQL.replace("ORDER BY doc_id", "")
    canon = _CANON_SQL.replace("ORDER BY doc_id", "")
    gates = [
        f"(n_tokens BETWEEN {_FN_LEN_LO} AND {_FN_LEN_HI})",
        f"uniq_ratio >= {_FN_UNIQ}",
        f"quality_score >= {_FN_QUALITY}",
        "NOT is_low_quality",
        "is_canonical",
    ]
    cum = []
    acc = []
    for g in gates:
        acc.append(g)
        cum.append(" AND ".join(acc))
    sums = ", ".join(
        f"sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS n{i + 1}"
        for i, c in enumerate(cum)
    )
    stage_rows = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{name}' AS gate, n{i} AS n_in, n{i + 1} AS n_out"
        f" FROM a"
        for i, name in enumerate(_FN_STAGES)
    )
    return f"""
WITH sig AS ({sig}),
ppl AS ({ppl}),
canon AS ({canon}),
j AS (
  SELECT sig.doc_id, sig.n_tokens, sig.uniq_ratio, sig.quality_score,
         ppl.is_low_quality, canon.is_canonical
  FROM sig JOIN ppl USING (doc_id) JOIN canon USING (doc_id)
),
a AS (SELECT count(*) AS n0, {sums} FROM j)
SELECT cast(stage AS bigint) AS stage, gate,
       cast(n_in AS bigint) AS n_in, cast(n_out AS bigint) AS n_out,
       cast(n_in - n_out AS bigint) AS n_dropped,
       round(CASE WHEN n_in > 0 THEN cast(n_out AS double) / n_in END, 6)
         AS pass_rate
FROM ({stage_rows}) s
ORDER BY stage
"""


@register("curation_funnel", oracle=_funnel_sql(), tags=("pipeline", "quality", "dedup"))
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation RUN REPORT: how many documents survive each
    successive gate — length → lexical diversity → composite quality →
    LM perplexity → dedup survivorship — the five-line summary an
    engineer reads after every corpus build to see where the data
    went. Composes three operator families (fused text signals, the
    corpus-trained unigram LM, the canonical-survivor manifest) in one
    query, and the oracle composes their SQL the same way, so the
    whole integrated pipeline hash-matches.

    Scale: the text signals are scan-side; the LM and manifest joins
    are the same plans their standalone queries run; the funnel itself
    is ONE conditional aggregation (five cumulative-AND counters folded
    map-side into a single row) exploded into the report rows — adding
    a gate costs one more counter, never another pass."""
    sig = curation_signals_fused(spark, sf_dir).select(
        "doc_id", "n_tokens", "uniq_ratio", "quality_score"
    )
    from .dedup import dedup_canonical
    from .text_analysis import unigram_perplexity

    ppl = unigram_perplexity(spark, sf_dir).select("doc_id", "is_low_quality")
    canon = dedup_canonical(spark, sf_dir).select("doc_id", "is_canonical")
    j = sig.join(ppl, "doc_id").join(canon, "doc_id")
    gates = [
        F.col("n_tokens").between(_FN_LEN_LO, _FN_LEN_HI),
        F.col("uniq_ratio") >= _FN_UNIQ,
        F.col("quality_score") >= _FN_QUALITY,
        ~F.col("is_low_quality"),
        F.col("is_canonical"),
    ]
    cum = []
    acc = None
    for g in gates:
        acc = g if acc is None else (acc & g)
        cum.append(acc)
    a = j.agg(
        F.count("*").alias("n0"),
        *[
            F.sum(F.when(c, 1).otherwise(0)).alias(f"n{i + 1}")
            for i, c in enumerate(cum)
        ],
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("stage"),
                F.lit(name).alias("gate"),
                F.col(f"n{i}").cast("bigint").alias("n_in"),
                F.col(f"n{i + 1}").cast("bigint").alias("n_out"),
            )
            for i, name in enumerate(_FN_STAGES)
        ]
    )
    exploded = a.select(F.explode(stages).alias("s")).select("s.*")
    return exploded.select(
        "stage",
        "gate",
        "n_in",
        "n_out",
        (F.col("n_in") - F.col("n_out")).cast("bigint").alias("n_dropped"),
        F.round(
            F.when(
                F.col("n_in") > 0, F.col("n_out").cast("double") / F.col("n_in")
            ),
            6,
        ).alias("pass_rate"),
    ).orderBy("stage")


# ---------------------------------------------------------------------
# Deterministic train/valid/test split
# ---------------------------------------------------------------------

_SPLIT_TRAIN, _SPLIT_VALID = 80, 90  # /100: 80-10-10

_SPLIT_SQL = f"""
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {_SPLIT_VALID} THEN 'valid'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5('split' || doc_id), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
ORDER BY doc_id
"""


@register("train_test_split", oracle=_SPLIT_SQL, tags=("sampling", "pipeline"))
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment by hashed
    doc_id — the split manifest every training corpus needs, with the
    same reproducibility contract as stratified_sample: reruns,
    backfills, and incremental batches land every document in the SAME
    split forever (a rand() split reshuffles and leaks valid into
    train on the next run). One scan, zero shuffles; the manifest can
    be written alongside the shards or recomputed anywhere from
    doc_id alone."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .withColumn(
            "split",
            F.when(F.col("bucket") < _SPLIT_TRAIN, "train")
            .when(F.col("bucket") < _SPLIT_VALID, "valid")
            .otherwise("test"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Snapshot diff (ingest-delta audit / CDC shape)
# ---------------------------------------------------------------------

# Simulated snapshots over the one fixture table: the CURRENT snapshot
# drops doc_id % 11 == 0 (rows the new crawl lost → 'removed'), the
# PREVIOUS lacked doc_id % 7 == 0 ('added') and carried a last-word-
# truncated text for doc_id % 5 == 0 ('changed').
_DIFF_SQL = """
WITH cur AS (SELECT doc_id, md5(coalesce(text, '')) AS h
             FROM documents WHERE doc_id % 11 <> 0),
prev AS (
  SELECT doc_id,
         md5(coalesce(CASE WHEN doc_id % 5 = 0 AND text IS NOT NULL
              THEN array_to_string(
                     (string_split(text, ' '))[1:len(string_split(text, ' ')) - 1],
                     ' ')
              ELSE text END, '')) AS h
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
       CASE WHEN p.doc_id IS NULL THEN 'added'
            WHEN c.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM cur c FULL OUTER JOIN prev p USING (doc_id)
WHERE p.doc_id IS NULL OR c.doc_id IS NULL OR c.h <> p.h
ORDER BY doc_id
"""


@register("snapshot_diff", oracle=_DIFF_SQL, tags=("curation", "audit"))
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-delta audit between two corpus snapshots — the CDC
    primitive a periodically-refreshed training corpus runs before
    promoting a crawl: every document keyed by id, content reduced to
    a hash, and a single full-outer hash-compare join emitting only
    the added / removed / changed rows.

    Scale: both sides reduce scan-side to (id, 16-byte hash) — the
    join shuffles keys and hashes, never bodies, and at 100 TB both
    snapshots would be bucketed by id making the compare co-partitioned
    and exchange-free. The fixture simulates the snapshots from the one
    documents table (see _DIFF_SQL); production passes two real
    directories through the same plan."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    words = F.split(F.col("text"), " ")
    prev_text = F.when(
        (F.col("doc_id") % 5 == 0) & F.col("text").isNotNull(),
        F.concat_ws(" ", F.slice(words, 1, F.size(words) - 1)),
    ).otherwise(F.col("text"))
    prev = docs.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("p_id"),
        F.md5(F.coalesce(prev_text, F.lit(""))).alias("ph"),
    )
    j = cur.join(prev, cur.doc_id == prev.p_id, "full_outer")
    status = (
        F.when(F.col("p_id").isNull(), F.lit("added"))
        .when(F.col("doc_id").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.filter(
            F.col("p_id").isNull()
            | F.col("doc_id").isNull()
            | (F.col("h") != F.col("ph"))
        )
        .select(
            F.coalesce(F.col("doc_id"), F.col("p_id")).alias("doc_id"),
            status.alias("status"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Closed-form distributed linear regression (one-pass GLM probe)
# ---------------------------------------------------------------------

_LINREG_SQL = """
WITH f AS (
  SELECT cast(n_chars AS bigint) AS y,
         cast(len(string_split(text, ' ')) AS bigint) AS x1,
         cast(len(list_filter(string_split(text, ' '), w -> len(w) > 5))
           AS bigint) AS x2
  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
a AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(x1) AS bigint) AS sx1, cast(sum(x2) AS bigint) AS sx2,
         cast(sum(y) AS bigint) AS sy,
         cast(sum(x1*x1) AS bigint) AS s11, cast(sum(x1*x2) AS bigint) AS s12,
         cast(sum(x2*x2) AS bigint) AS s22,
         cast(sum(x1*y) AS bigint) AS s1y, cast(sum(x2*y) AS bigint) AS s2y,
         cast(sum(y*y) AS bigint) AS syy
  FROM f
),
m AS (
  SELECT *,
    cast(n AS double) AS a11, cast(sx1 AS double) AS a12,
    cast(sx2 AS double) AS a13, cast(s11 AS double) AS a22,
    cast(s12 AS double) AS a23, cast(s22 AS double) AS a33,
    cast(sy AS double) AS b1, cast(s1y AS double) AS b2,
    cast(s2y AS double) AS b3
  FROM a
),
d AS (
  SELECT *,
    a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
      + a13*(a12*a23 - a22*a13) AS det,
    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
      + a13*(b2*a23 - a22*b3) AS det0,
    a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
      + a13*(a12*b3 - b2*a13) AS det1,
    a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
      + b1*(a12*a23 - a22*a13) AS det2
  FROM m
)
SELECT cast(n AS bigint) AS n_rows,
       round(CASE WHEN det <> 0 THEN det0/det END, 6) AS beta0,
       round(CASE WHEN det <> 0 THEN det1/det END, 6) AS beta1,
       round(CASE WHEN det <> 0 THEN det2/det END, 6) AS beta2,
       round(CASE WHEN det <> 0 AND (cast(syy AS double)
               - cast(sy AS double)*cast(sy AS double)/cast(n AS double)) > 0
         THEN 1.0 - (cast(syy AS double)
                     - ((det0/det)*b1 + (det1/det)*b2 + (det2/det)*b3))
                    / (cast(syy AS double)
                       - cast(sy AS double)*cast(sy AS double)
                         / cast(n AS double)) END, 6) AS r2
FROM d
"""


@register("linreg_closed_form", oracle=_LINREG_SQL, tags=("curation", "ml", "stats"))
def linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LINEAR REGRESSION in ONE aggregation pass — the
    closed-form normal-equations path (X'X and X'y are plain sums, the
    3×3 solve is Cramer's rule on the driverless aggregate row): how a
    linear probe / quality-regression head actually trains at 100 TB,
    where an iterative optimizer's per-step pass over the corpus is
    the cost to avoid. Here: n_chars regressed on token count and
    long-word count (R² ≈ 0.997 on the fixture — the label is nearly
    linear in the features, which is the point of the smoke model).

    Exactness: every moment (X'X, X'y, y'y entries) is an exact
    BIGINT sum — order-independent under any partitioning; the Cramer
    determinants and divisions are written with IDENTICAL association
    on both engines, so the doubles agree bit-for-bit before the
    6-dp round. Degenerate designs (det = 0) and constant targets
    (SST ≤ 0) yield NULL coefficients/R² on both engines.

    Scale: one scan, ten integer aggregates, one output row — no
    shuffle beyond the map-side-combined partials. Production at
    10^12 rows routes the sums through DECIMAL(38) (functions/exact
    dsum) to dodge bigint overflow; the algebra is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    f = docs.filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        F.col("n_chars").cast("bigint").alias("y"),
        F.size(words).cast("bigint").alias("x1"),
        F.size(F.filter(words, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("x2"),
    )
    a = f.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1"),
        F.sum("x2").cast("bigint").alias("sx2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    c = lambda name: F.col(name)  # noqa: E731
    m = a.select(
        "*",
        c("n").cast("double").alias("a11"),
        c("sx1").cast("double").alias("a12"),
        c("sx2").cast("double").alias("a13"),
        c("s11").cast("double").alias("a22"),
        c("s12").cast("double").alias("a23"),
        c("s22").cast("double").alias("a33"),
        c("sy").cast("double").alias("b1"),
        c("s1y").cast("double").alias("b2"),
        c("s2y").cast("double").alias("b3"),
    )
    # Cramer determinants with the oracle's EXACT association
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    det0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
    )
    det1 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
    )
    det2 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
        - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
        + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = m.select(
        "*",
        det.alias("det"),
        det0.alias("det0"),
        det1.alias("det1"),
        det2.alias("det2"),
    )
    nz = F.col("det") != 0
    syy_d = c("syy").cast("double")
    sst = syy_d - c("sy").cast("double") * c("sy").cast("double") / c("n").cast(
        "double"
    )
    ssr_sub = (
        (c("det0") / c("det")) * c("b1")
        + (c("det1") / c("det")) * c("b2")
    ) + (c("det2") / c("det")) * c("b3")
    r2 = F.when(nz & (sst > 0), F.lit(1.0) - (syy_d - ssr_sub) / sst)
    return d.select(
        c("n").cast("bigint").alias("n_rows"),
        F.round(F.when(nz, c("det0") / c("det")), 6).alias("beta0"),
        F.round(F.when(nz, c("det1") / c("det")), 6).alias("beta1"),
        F.round(F.when(nz, c("det2") / c("det")), 6).alias("beta2"),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------
# Logistic probe via two IRLS steps (classifier-training companion)
# ---------------------------------------------------------------------

_LOGREG_LABEL = 300  # y = (n_chars > LABEL) — near-median split


def _cramer3_sql(prefix: str = "") -> str:
    """The 3×3 Cramer determinant expressions over columns a11..b3 —
    shared association with linreg_closed_form's solve."""
    return f"""
    a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
      + a13*(a12*a23 - a22*a13) AS {prefix}det,
    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
      + a13*(b2*a23 - a22*b3) AS {prefix}det0,
    a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
      + a13*(a12*b3 - b2*a13) AS {prefix}det1,
    a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
      + b1*(a12*a23 - a22*a13) AS {prefix}det2"""


_LOGREG_SQL = f"""
WITH f AS (
  SELECT CASE WHEN cast(n_chars AS bigint) > {_LOGREG_LABEL} THEN 1 ELSE 0 END AS y,
         cast(len(string_split(text, ' ')) AS bigint) AS x1,
         cast(len(list_filter(string_split(text, ' '), w -> len(w) > 5))
           AS bigint) AS x2
  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
m1 AS (
  SELECT cast(count(*) AS double) AS a11,
         cast(sum(x1) AS double) AS a12, cast(sum(x2) AS double) AS a13,
         cast(sum(x1*x1) AS double) AS a22, cast(sum(x1*x2) AS double) AS a23,
         cast(sum(x2*x2) AS double) AS a33,
         cast(sum(4*y - 2) AS double) AS b1,
         cast(sum(x1*(4*y - 2)) AS double) AS b2,
         cast(sum(x2*(4*y - 2)) AS double) AS b3
  FROM f
),
d1 AS (SELECT *, {_cramer3_sql()} FROM m1),
g AS (SELECT det0/det AS g0, det1/det AS g1, det2/det AS g2
      FROM d1 WHERE det <> 0),
s2 AS (SELECT f.y, f.x1, f.x2, b.g0 + b.g1*f.x1 + b.g2*f.x2 AS eta FROM f, g b),
q2 AS (
  SELECT y, x1, x2, eta,
         greatest(1, least(999,
           cast(floor(1000.0/(1.0 + exp(-eta)) + 0.5) AS bigint))) AS pu
  FROM s2
),
r2 AS (
  SELECT y, x1, x2,
         pu*(1000 - pu) AS wu,
         cast(floor((eta + (1000*y - pu)*1000.0/(pu*(1000 - pu)))*1000.0 + 0.5)
           AS bigint) AS zu
  FROM q2
),
m2 AS (
  SELECT cast(sum(wu) AS double) AS a11,
         cast(sum(wu*x1) AS double) AS a12, cast(sum(wu*x2) AS double) AS a13,
         cast(sum(wu*x1*x1) AS double) AS a22, cast(sum(wu*x1*x2) AS double) AS a23,
         cast(sum(wu*x2*x2) AS double) AS a33,
         cast(sum(wu*zu) AS double)/1000.0 AS b1,
         cast(sum(wu*x1*zu) AS double)/1000.0 AS b2,
         cast(sum(wu*x2*zu) AS double)/1000.0 AS b3
  FROM r2
),
d2 AS (SELECT *, {_cramer3_sql()} FROM m2),
b2c AS (SELECT det0/det AS c0, det1/det AS c1, det2/det AS c2
        FROM d2 WHERE det <> 0),
acc AS (
  SELECT cast(count(*) AS bigint) AS n,
         sum(CASE WHEN (b.c0 + b.c1*f.x1 + b.c2*f.x2 >= 0) = (f.y = 1)
                  THEN 1 ELSE 0 END) AS hit
  FROM f, b2c b
)
SELECT acc.n AS n_rows,
       round(b.c0, 6) AS beta0, round(b.c1, 6) AS beta1,
       round(b.c2, 6) AS beta2,
       round(cast(acc.hit AS double) / acc.n, 6) AS train_accuracy
FROM acc, b2c b
"""


@register("logreg_irls_probe", oracle=_LOGREG_SQL, tags=("curation", "ml", "iterative"))
def logreg_irls_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOGISTIC-regression probe trained by TWO IRLS steps — the
    classification companion to linreg_closed_form (quality-gate
    classifiers train exactly like this at scale: each IRLS step is
    one weighted-moment pass + a tiny solve). Step 1 from β=0 has
    constant weights, so it IS the closed-form linear solve on
    z = 4(y−½) — pure integer moments. Step 2 scores η per row,
    micro-quantizes the sigmoid to the 1e-3 grid (clamped [.001,.999]
    — standard IRLS guard), so the reweighted moments are again exact
    INTEGERS under any partitioning; the working response rounds to
    the same grid.

    Cross-engine exactness rides on the JVM's and DuckDB's exp()
    agreeing at each distinct η (the bigram-LM caveat: a 1-ulp libm
    divergence exactly on a floor boundary would flip one pu) — the
    parity suites, not this comment, are the guarantee. Everything
    else (Cramer solves, accuracy pass) uses identical association.

    Scale: two scans + one accuracy pass, each reducing to ≤10
    aggregate values; the model crosses the cluster as a broadcast
    1-row frame. No shuffle beyond map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    f = docs.filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        F.when(F.col("n_chars").cast("bigint") > _LOGREG_LABEL, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
        F.size(words).cast("bigint").alias("x1"),
        F.size(F.filter(words, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("x2"),
    )

    c = F.col

    def cramer(frame):
        det = (
            c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
            - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
            + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
        )
        det0 = (
            c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
            - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
            + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
        )
        det1 = (
            c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
            - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
            + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
        )
        det2 = (
            c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
            - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
            + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
        )
        return frame.select(
            "*",
            det.alias("det"),
            det0.alias("det0"),
            det1.alias("det1"),
            det2.alias("det2"),
        )

    m1 = f.agg(
        F.count("*").cast("double").alias("a11"),
        F.sum("x1").cast("double").alias("a12"),
        F.sum("x2").cast("double").alias("a13"),
        F.sum(c("x1") * c("x1")).cast("double").alias("a22"),
        F.sum(c("x1") * c("x2")).cast("double").alias("a23"),
        F.sum(c("x2") * c("x2")).cast("double").alias("a33"),
        F.sum(4 * c("y") - 2).cast("double").alias("b1"),
        F.sum(c("x1") * (4 * c("y") - 2)).cast("double").alias("b2"),
        F.sum(c("x2") * (4 * c("y") - 2)).cast("double").alias("b3"),
    )
    g = (
        cramer(m1)
        .filter(c("det") != 0)
        .select(
            (c("det0") / c("det")).alias("g0"),
            (c("det1") / c("det")).alias("g1"),
            (c("det2") / c("det")).alias("g2"),
        )
    )
    eta = c("g0") + c("g1") * c("x1") + c("g2") * c("x2")
    s2 = f.crossJoin(F.broadcast(g)).select("y", "x1", "x2", eta.alias("eta"))
    pu = F.greatest(
        F.lit(1).cast("bigint"),
        F.least(
            F.lit(999).cast("bigint"),
            F.floor(
                F.lit(1000.0) / (F.lit(1.0) + F.exp(-c("eta"))) + F.lit(0.5)
            ).cast("bigint"),
        ),
    )
    q2 = s2.select("y", "x1", "x2", "eta", pu.alias("pu"))
    zu = F.floor(
        (
            c("eta")
            + (1000 * c("y") - c("pu"))
            * F.lit(1000.0)
            / (c("pu") * (1000 - c("pu")))
        )
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("bigint")
    r2 = q2.select(
        "y",
        "x1",
        "x2",
        (c("pu") * (1000 - c("pu"))).alias("wu"),
        zu.alias("zu"),
    )
    m2 = r2.agg(
        F.sum("wu").cast("double").alias("a11"),
        F.sum(c("wu") * c("x1")).cast("double").alias("a12"),
        F.sum(c("wu") * c("x2")).cast("double").alias("a13"),
        F.sum(c("wu") * c("x1") * c("x1")).cast("double").alias("a22"),
        F.sum(c("wu") * c("x1") * c("x2")).cast("double").alias("a23"),
        F.sum(c("wu") * c("x2") * c("x2")).cast("double").alias("a33"),
        (F.sum(c("wu") * c("zu")).cast("double") / 1000.0).alias("b1"),
        (F.sum(c("wu") * c("x1") * c("zu")).cast("double") / 1000.0).alias("b2"),
        (F.sum(c("wu") * c("x2") * c("zu")).cast("double") / 1000.0).alias("b3"),
    )
    b2c = (
        cramer(m2)
        .filter(c("det") != 0)
        .select(
            (c("det0") / c("det")).alias("c0"),
            (c("det1") / c("det")).alias("c1"),
            (c("det2") / c("det")).alias("c2"),
        )
    )
    pred_ok = (
        (c("c0") + c("c1") * c("x1") + c("c2") * c("x2") >= 0) == (c("y") == 1)
    )
    acc = (
        f.crossJoin(F.broadcast(b2c))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(pred_ok, 1).otherwise(0)).alias("hit"),
        )
    )
    return acc.crossJoin(F.broadcast(b2c)).select(
        c("n").alias("n_rows"),
        F.round("c0", 6).alias("beta0"),
        F.round("c1", 6).alias("beta1"),
        F.round("c2", 6).alias("beta2"),
        F.round(c("hit").cast("double") / c("n"), 6).alias("train_accuracy"),
    )


# ---------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed-ngram LMs)
# ---------------------------------------------------------------------

_DSIR_B = 4096          # hashed-feature buckets (the paper's "hashed n-grams")
_DSIR_SCALE = 1_000_000  # micro-nat fixed point, same as the perplexity ops
# u ∈ (0,1) strictly: 13 md5 hex chars = 52 uniform bits, +1, / (2^52+2)
_DSIR_U_DEN = (1 << 52) + 2

_DSIR_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         string_split(translate(text, '{{fsrc}}', '{{fdst}}'), ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
tl AS (SELECT min(lang) AS tlang FROM d),
fb AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_B} AS b,
         lang = tlang AS is_t
  FROM (
    SELECT doc_id, lang, unnest(t) AS g FROM d
    UNION ALL
    SELECT doc_id, lang,
           unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS g
    FROM d
  ), tl
),
cnts AS (
  SELECT b, count(*) AS cr, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
  FROM fb GROUP BY b
),
tots AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnts),
lam AS (
  SELECT b,
         CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / (nt + {_DSIR_B}))
                     - ln(CAST(cr + 1 AS DOUBLE) / (nr + {_DSIR_B})))
                    * {_DSIR_SCALE} + 0.5) AS BIGINT) AS lam_u
  FROM cnts, tots
),
s AS (
  SELECT fb.doc_id,
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(lam.lam_u) AS BIGINT) AS logratio_u,
         CAST(max(CASE WHEN fb.is_t THEN 1 ELSE 0 END) AS BOOLEAN) AS is_target
  FROM fb JOIN lam USING (b)
  GROUP BY fb.doc_id
),
g AS (
  SELECT doc_id,
         CAST(floor(-ln(-ln(
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
             / {_DSIR_U_DEN}.0))
             * {_DSIR_SCALE} + 0.5) AS BIGINT) AS g_u
  FROM s
)
SELECT s.doc_id, s.n_feats, s.logratio_u,
       round(CAST(s.logratio_u AS DOUBLE) / (s.n_feats * {_DSIR_SCALE}.0), 6)
         AS avg_logratio,
       CAST(s.logratio_u + g.g_u AS BIGINT) AS resample_key_u,
       s.is_target
FROM s JOIN g USING (doc_id)
ORDER BY s.doc_id
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_SQL.format(fsrc=_F_SRC, fdst=_F_DST),
    tags=("curation", "sampling", "quality"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw document by how much more likely a
    TARGET-domain hashed-ngram language model makes it than the raw-
    corpus model, then emit Gumbel-perturbed resampling keys so a
    top-k over ``resample_key_u`` draws k documents ∝ their importance
    weight without replacement — the standard pretraining-corpus
    selection recipe (select web data that "looks like" the curated
    target).

    Mechanics: features are hashed uni+bigrams (md5 → {_DSIR_B}
    buckets — the portable-hash family the CMS/minhash paths share, so
    both engines bucket identically); the target here is the corpus'
    lexicographically-least ``lang`` slice (a deterministic stand-in
    for "curated target set" — production passes its own target
    table). Per-bucket add-one smoothing over B buckets; the
    log-likelihood-ratio λ(b) = ln p_t(b) − ln p_r(b) is quantized
    ONCE per DISTINCT bucket to integer micro-nats (the perplexity
    ops' exactness recipe) so the per-document Σλ is an
    order-independent bigint sum. The Gumbel key adds
    ⌊−ln(−ln(u))·1e6⌉ with u drawn from 52 md5 bits of doc_id —
    fully deterministic, identical in both engines.

    Scale shape: one token-stream pass builds the B-bucket count
    table (map-side combined; the exchange is ≤ B rows per partition);
    λ broadcasts back to the feature stream (B = {_DSIR_B} rows —
    trivially under any broadcast budget, and CONSTANT in corpus
    size, unlike a word-keyed LM); the only corpus-keyed exchange is
    the final doc_id aggregation. Selection = TakeOrdered on the key
    (no global window). At 100 TB: same plan, B stays 4096.

    Ref coverage: extends SURVEY §6's curation family (sampling/
    quality); no reference §2 counterpart (reference is an ASR
    pipeline) — this is north-star LLM-data tooling.
    """
    from .text_analysis import _bigram_structs

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    t = F.split(F.translate(F.col("text"), _F_SRC, _F_DST), " ")
    d = docs.select("doc_id", "lang", t.alias("t"))
    tl = d.agg(F.min("lang").alias("tlang"))
    uni = d.select("doc_id", "lang", F.explode("t").alias("g"))
    bi = d.select(
        "doc_id",
        "lang",
        F.explode(_bigram_structs(F.col("t"))).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        F.concat(F.col("bg.w1"), F.lit(" "), F.col("bg.w2")).alias("g"),
    )
    fb = (
        uni.unionByName(bi)
        .crossJoin(F.broadcast(tl))
        .select(
            "doc_id",
            F.pmod(
                F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
                F.lit(_DSIR_B),
            ).alias("b"),
            (F.col("lang") == F.col("tlang")).alias("is_t"),
        )
    )
    cnts = fb.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
    )
    tots = cnts.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    lam_u = F.floor(
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + _DSIR_B))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + _DSIR_B))
        )
        * _DSIR_SCALE
        + 0.5
    ).cast("bigint")
    lam = cnts.crossJoin(F.broadcast(tots)).select("b", lam_u.alias("lam_u"))
    s = (
        fb.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("lam_u").cast("bigint").alias("logratio_u"),
            F.max(F.when(F.col("is_t"), 1).otherwise(0))
            .cast("boolean")
            .alias("is_target"),
        )
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
        ).cast("long")
        + 1
    ).cast("double") / float(_DSIR_U_DEN)
    g_u = F.floor(-F.log(-F.log(u)) * _DSIR_SCALE + 0.5).cast("bigint")
    return s.select(
        "doc_id",
        "n_feats",
        "logratio_u",
        F.round(
            F.col("logratio_u").cast("double")
            / (F.col("n_feats") * float(_DSIR_SCALE)),
            6,
        ).alias("avg_logratio"),
        (F.col("logratio_u") + g_u).cast("bigint").alias("resample_key_u"),
        "is_target",
    ).orderBy("doc_id")
