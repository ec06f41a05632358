"""Distinct-counting sketches: portable HyperLogLog and K-minimum-
values, completing the sketch family (Bloom = membership, Misra-Gries
= heavy hitters, CMS = frequencies, HLL = cardinality, KMV = set
overlap).

Why these exist in an LLM-training-data engine: at 100 TB the
questions "how many distinct tokens / users / documents" and "how much
does snapshot B overlap snapshot A" cannot afford COUNT(DISTINCT) —
its shuffle is proportional to the distinct set itself. A register
sketch reduces every partition to a CONSTANT-width partial (64
integers here) that merges by max/min, so the exchange is flat in
corpus size and the merge is associative — the same map-side-combine
thesis measured for the CMS/MG/Bloom trio in SCALING.md.

Engine portability: every hash is an md5 hex chunk (the family shared
with the minhash/simhash/bloom/CMS portable paths), the leading-zero
rank is a generated integer CASE ladder (no libm, no string tricks),
and the ONE transcendental HLL needs (the linear-counting table
m·ln(m/V)) is precomputed at import into a 64-entry integer literal
embedded in BOTH engines' plans — so cross-engine hash-equality is a
property of integer arithmetic, not of two libms agreeing.

References: Flajolet, Fusy, Gandouet, Meunier — "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007); Beyer et al. — "On synopses for distinct-value estimation
under multiset operations" (SIGMOD 2007) for KMV.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.casefold import FOLD_DST, FOLD_SRC
from ..registry import register
from ..sources.tables import load_table

# Tokenization casefold: the generated translate table, NEVER either
# engine's lower() (divergent outside ASCII — İ, final sigma). The
# sketch layer's calibration columns are EXHAUSTIVE over the token set
# (exact COUNT DISTINCT + md5 registers), so a single divergent token
# is a guaranteed hash-fail here where a top-k query would absorb it;
# identical to lower() on pure-ASCII corpora, robust beyond.
FOLD = f"translate(text, '{FOLD_SRC}', '{FOLD_DST}')"


def _fold_text():
    return F.translate(F.col("text"), FOLD_SRC, FOLD_DST)


# ---------------------------------------------------------------------
# HyperLogLog core (p = 6 → m = 64 registers)
# ---------------------------------------------------------------------

_HLL_M = 64  # registers; α_64 = 0.709 (Flajolet et al. 2007, §4)
_ALPHA_MILLI = 709
# finalization numerator: α_milli · m² · 2^33 (registers hold
# rho ∈ [1, 33], so Σ 2^(33-M_j) ≤ m·2^32 + … stays well under 2^40
# and the division below is exact bigint floor division)
_HLL_NUM = _ALPHA_MILLI * _HLL_M * _HLL_M * (1 << 33)
# linear-counting branch: raw estimate ≤ 2.5·m (in milli-units) AND at
# least one empty register → E = m·ln(m/V). The 64 possible values of
# V make the transcendental a PRECOMPUTED integer table (index V,
# milli-units) — identical literals in both engines' plans.
_HLL_LC_THRESH_MILLI = 2500 * _HLL_M
_LC_MILLI = [0] + [
    round(1000 * _HLL_M * math.log(_HLL_M / v)) for v in range(1, _HLL_M + 1)
]


def _rho_case(expr: str) -> str:
    """Engine-neutral CASE ladder: rank of the leftmost 1-bit of a
    uniform 32-bit value (1-based; 33 for zero) — pure integer
    comparisons, valid verbatim in Spark SQL and DuckDB."""
    whens = " ".join(
        f"WHEN {expr} >= {1 << (32 - k)} THEN {k}" for k in range(1, 33)
    )
    return f"CASE {whens} ELSE 33 END"


# hex chunk offsets into md5(w): bucket ← chars 1-8, rho value ← 9-16
# (disjoint 32-bit chunks, same derivation trick as the CMS offsets)
_BUCKET_OFF = 1
_RHO_OFF = 9


def _hll_cols(hx):
    """(bucket, rho) Columns from a staged md5-hex Column."""
    b = F.pmod(
        F.conv(F.substring(hx, _BUCKET_OFF, 8), 16, 10).cast("long"),
        F.lit(_HLL_M),
    )
    v = F.conv(F.substring(hx, _RHO_OFF, 8), 16, 10).cast("long")
    return b, v


def _hll_estimate_cols(s_col: str, v_col: str):
    """Corrected-estimate Column from (S = Σ 2^(33-M_j), V = #zero
    registers) columns — integer floor division end to end."""
    raw_milli = F.expr(f"{_HLL_NUM} div {s_col}")
    raw_est = F.expr(f"{_HLL_NUM} div (1000 * {s_col})")
    lc_est = F.expr(
        f"element_at(array({', '.join(str(x) for x in _LC_MILLI[1:])}),"
        f" cast({v_col} as int)) div 1000"
    )
    est = (
        F.when(
            (F.col(v_col) > 0) & (raw_milli <= F.lit(_HLL_LC_THRESH_MILLI)),
            lc_est,
        )
        .otherwise(raw_est)
        .cast("bigint")
    )
    return raw_milli.cast("bigint"), est


def _hll_finalize_sql(regs: str, keys: str) -> str:
    """Oracle CTE chain finalizing a register relation ``regs(<keys>,
    b, m)`` (all m buckets present, zeros included) into
    ``(<keys>, zero_registers, raw_est_milli, hll_est)``.
    ``keys`` is a comma-joined column list."""
    lc_list = ", ".join(str(x) for x in _LC_MILLI[1:])
    return f"""
  SELECT {keys},
         CAST(v AS BIGINT) AS zero_registers,
         CAST({_HLL_NUM} // s AS BIGINT) AS raw_est_milli,
         CAST(CASE WHEN v > 0 AND {_HLL_NUM} // s <= {_HLL_LC_THRESH_MILLI}
                   THEN (list_extract([{lc_list}], CAST(v AS INT))) // 1000
                   ELSE {_HLL_NUM} // (1000 * s) END AS BIGINT) AS hll_est
  FROM (SELECT {keys},
               SUM(1::BIGINT << (33 - m)) AS s,
               SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM {regs} GROUP BY {keys})
"""


def _hll_regs_sql(src: str, keys: str, key_src: str) -> str:
    """Oracle CTE chain: token relation ``src(<keys>, w)`` → dense
    register relation ``(<keys>, b, m)`` with empty buckets as 0.
    ``keys`` is a comma-joined column list; ``key_src`` supplies the
    distinct key domain for densification."""
    key_list = [k.strip() for k in keys.split(",")]
    k_keys = ", ".join(f"k.{c}" for c in key_list)
    on = " AND ".join(f"r.{c} = k.{c}" for c in key_list)
    return f"""
  SELECT {k_keys}, g.b, COALESCE(r.m, 0) AS m
  FROM (SELECT DISTINCT {keys} FROM {key_src}) k
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS b FROM range(0, {_HLL_M})) g
  LEFT JOIN (
    SELECT {keys}, b, MAX(rho) AS m
    FROM (SELECT {keys},
                 ('0x' || substr(hx, {_BUCKET_OFF}, 8))::BIGINT % {_HLL_M} AS b,
                 {_rho_case(f"('0x' || substr(hx, {_RHO_OFF}, 8))::BIGINT")} AS rho
          FROM (SELECT {keys}, md5(w) AS hx FROM {src}))
    GROUP BY {keys}, b
  ) r ON {on} AND r.b = g.b
"""


_HLL_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(string_split({FOLD}, ' ')) AS w FROM documents
),
regs AS ({_hll_regs_sql('toks', 'lang', 'toks')}),
fin AS ({_hll_finalize_sql('regs', 'lang')}),
exact AS (SELECT lang, CAST(COUNT(DISTINCT w) AS BIGINT) AS exact_distinct
          FROM toks GROUP BY lang)
SELECT e.lang, e.exact_distinct, f.zero_registers, f.raw_est_milli, f.hll_est,
       CAST(abs(f.hll_est - e.exact_distinct) * 1000000 // e.exact_distinct
            AS BIGINT) AS err_ppm
FROM fin f JOIN exact e ON e.lang = f.lang
ORDER BY e.lang
"""


def _token_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, hx) over the raw token stream — md5 staged ONCE per token
    in its own projection (lambda/derived-column bodies get no CSE; the
    CMS scaling work measured 4× repeated md5 at 3× total wall)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(_fold_text(), " ")).alias("w")
    )
    return toks.select("lang", F.md5("w").alias("hx"))


def _dense_registers(hashed: DataFrame, keys: list[str]) -> DataFrame:
    """(keys…, b, m) register frame with every bucket present: the
    sparse max-rho aggregation (map-side combine caps each partition's
    contribution at m rows per key group) joined onto the dense
    key × bucket grid (tiny — |keys| · m rows)."""
    b, v = _hll_cols(F.col("hx"))
    cells = hashed.withColumn("b", b).withColumn("v", v).select(
        *keys, "b", F.expr(_rho_case("v")).alias("rho")
    )
    sparse = cells.groupBy(*keys, "b").agg(F.max("rho").alias("m"))
    grid = (
        hashed.select(*keys)
        .distinct()
        .select(*keys, F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("b"))
        .withColumn("b", F.col("b").cast("long"))
    )
    return grid.join(sparse, [*keys, "b"], "left").fillna({"m": 0})


def _finalize(regs: DataFrame, keys: list[str]) -> DataFrame:
    """(keys…, zero_registers, raw_est_milli, hll_est) from a dense
    register frame."""
    agg = regs.groupBy(*keys).agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 33 - cast(m as int))")).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("bigint").alias("v"),
    )
    raw_milli, est = _hll_estimate_cols("s", "v")
    return agg.select(
        *keys,
        F.col("v").alias("zero_registers"),
        raw_milli.alias("raw_est_milli"),
        est.alias("hll_est"),
    )


@register("hll_distinct", oracle=_HLL_SQL, tags=("sketch", "text", "calibration"))
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG distinct-word count per language with its
    calibration report (estimate vs exact COUNT DISTINCT, error in
    ppm).

    The register build is ONE aggregation whose key domain is
    langs × 64 buckets — map-side combine reduces every partition to a
    constant-width partial, so shuffle volume is FLAT in corpus size
    (COUNT(DISTINCT w) by contrast shuffles the distinct set itself;
    at 100 TB that asymmetry is the whole point). The exact side
    exists to MEASURE the sketch — the audit one runs on a sample
    before trusting estimates fleet-wide; production reads the 64
    integers alone.

    Determinism: md5-chunk bucket/rank (integer CASE ladder, no libm),
    bigint floor-division finalization, and a PRECOMPUTED 64-entry
    linear-counting table (the branch taken when ≥1 register is empty
    and the raw estimate ≤ 2.5·m), so the DuckDB replay is hash-exact
    by construction."""
    hashed = _token_hashes(spark, sf_dir)
    fin = _finalize(_dense_registers(hashed, ["lang"]), ["lang"])
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        docs.select(
            "lang", F.explode(F.split(_fold_text(), " ")).alias("w")
        )
        .groupBy("lang")
        .agg(F.countDistinct("w").cast("bigint").alias("exact_distinct"))
    )
    out = fin.join(exact, "lang")
    return out.select(
        "lang",
        "exact_distinct",
        "zero_registers",
        "raw_est_milli",
        "hll_est",
        F.expr("cast(abs(hll_est - exact_distinct) * 1000000"
               " div exact_distinct as bigint)").alias("err_ppm"),
    ).orderBy("lang")


_HLL_SHARDS = 4

_HLL_MERGE_SQL = f"""
WITH toks AS (
  SELECT lang, doc_id % {_HLL_SHARDS} AS shard,
         unnest(string_split({FOLD}, ' ')) AS w
  FROM documents
),
shard_regs AS ({_hll_regs_sql('toks', 'lang, shard', 'toks')}),
merged AS (SELECT lang, b, MAX(m) AS m FROM shard_regs GROUP BY lang, b),
global_toks AS (SELECT lang, w FROM toks),
global_regs AS ({_hll_regs_sql('global_toks', 'lang', 'global_toks')}),
fin_merged AS ({_hll_finalize_sql('merged', 'lang')}),
fin_global AS ({_hll_finalize_sql('global_regs', 'lang')}),
shard_fin AS ({_hll_finalize_sql('shard_regs', 'lang, shard')}),
spread AS (SELECT lang, MIN(hll_est) AS shard_est_min,
                  MAX(hll_est) AS shard_est_max
           FROM shard_fin GROUP BY lang),
lossless AS (
  SELECT m.lang, BOOL_AND(m.m = g.m) AS merge_is_lossless
  FROM merged m JOIN global_regs g ON g.lang = m.lang AND g.b = m.b
  GROUP BY m.lang
)
SELECT fm.lang, {_HLL_SHARDS}::BIGINT AS n_shards,
       fm.hll_est AS merged_est, fg.hll_est AS global_est,
       l.merge_is_lossless, s.shard_est_min, s.shard_est_max
FROM fin_merged fm
JOIN fin_global fg ON fg.lang = fm.lang
JOIN lossless l ON l.lang = fm.lang
JOIN spread s ON s.lang = fm.lang
ORDER BY fm.lang
"""


@register("hll_merge_shards", oracle=_HLL_MERGE_SQL, tags=("sketch", "text"))
def hll_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY proof: registers built independently per shard
    (doc_id mod {shards}) and max-merged equal the registers built
    over the whole corpus, bucket by bucket — verified cross-engine
    through two DIFFERENT grouping orders rather than assumed from
    max's associativity.

    This property — not the estimate — is why HLL is the 100 TB
    distinct counter: every executor summarizes its split into 64
    integers, the driver (or a reduce tree) folds them with max, and
    re-sharding/backfill never changes the answer. The per-shard
    estimate spread (min/max) shows what a single shard would have
    answered alone."""
    hashed = _token_hashes(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sharded = docs.select(
        "lang",
        (F.col("doc_id") % _HLL_SHARDS).alias("shard"),
        F.explode(F.split(_fold_text(), " ")).alias("w"),
    ).select("lang", "shard", F.md5("w").alias("hx"))
    shard_regs = _dense_registers(sharded, ["lang", "shard"])
    merged = shard_regs.groupBy("lang", "b").agg(F.max("m").alias("m"))
    global_regs = _dense_registers(hashed, ["lang"])
    fin_merged = _finalize(merged, ["lang"])
    fin_global = _finalize(global_regs, ["lang"])
    shard_fin = _finalize(shard_regs, ["lang", "shard"])
    spread = shard_fin.groupBy("lang").agg(
        F.min("hll_est").alias("shard_est_min"),
        F.max("hll_est").alias("shard_est_max"),
    )
    lossless = (
        merged.alias("m")
        .join(
            global_regs.alias("g"),
            (F.col("m.lang") == F.col("g.lang")) & (F.col("m.b") == F.col("g.b")),
        )
        .groupBy(F.col("m.lang").alias("lang"))
        .agg(F.min(F.col("m.m") == F.col("g.m")).alias("merge_is_lossless"))
    )
    return (
        fin_merged.select("lang", F.col("hll_est").alias("merged_est"))
        .join(fin_global.select("lang", F.col("hll_est").alias("global_est")), "lang")
        .join(lossless, "lang")
        .join(spread, "lang")
        .select(
            "lang",
            F.lit(_HLL_SHARDS).cast("bigint").alias("n_shards"),
            "merged_est",
            "global_est",
            "merge_is_lossless",
            "shard_est_min",
            "shard_est_max",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# K-minimum-values: corpus-overlap (Jaccard) + cardinality from one
# bottom-k sketch per corpus
# ---------------------------------------------------------------------

_KMV_K = 128
_KMV_SPACE = 1 << 32  # 32-bit hash space (8 md5 hex chars)

_KMV_SQL = f"""
WITH words AS (
  SELECT DISTINCT doc_id % 2 AS side, unnest(string_split({FOLD}, ' ')) AS w
  FROM documents
),
hashed AS (
  SELECT side, w, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM words
),
ranked AS (
  SELECT side, w, h,
         row_number() OVER (PARTITION BY side ORDER BY h, w) AS rn
  FROM hashed
),
sk AS (SELECT side, w, h FROM ranked WHERE rn <= {_KMV_K}),
union_ranked AS (
  SELECT w, h, row_number() OVER (ORDER BY h, w) AS rn
  FROM (SELECT DISTINCT w, h FROM sk)
),
union_k AS (SELECT w, h FROM union_ranked WHERE rn <= {_KMV_K}),
both_flags AS (
  SELECT u.w,
         MAX(CASE WHEN s.side = 0 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.side = 1 THEN 1 ELSE 0 END) AS in_b
  FROM union_k u JOIN sk s ON s.w = u.w
  GROUP BY u.w
),
tail AS (
  SELECT side, MAX(h) AS h_k, COUNT(*) AS k_eff FROM sk GROUP BY side
),
est AS (
  SELECT side,
         CAST(CASE WHEN k_eff < {_KMV_K} THEN k_eff
              ELSE ({_KMV_K} - 1)::BIGINT * {_KMV_SPACE} // h_k END
              AS BIGINT) AS kmv_est
  FROM tail
),
exact AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN ina > 0 THEN w END) AS BIGINT) AS n_a,
         CAST(COUNT(DISTINCT CASE WHEN inb > 0 THEN w END) AS BIGINT) AS n_b,
         CAST(COUNT(DISTINCT CASE WHEN ina > 0 AND inb > 0 THEN w END) AS BIGINT) AS n_both,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_union
  FROM (SELECT w, MAX(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ina,
               MAX(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS inb
        FROM words GROUP BY w)
)
SELECT {_KMV_K}::BIGINT AS k,
       e.n_a AS exact_a, e.n_b AS exact_b,
       (SELECT kmv_est FROM est WHERE side = 0) AS est_a,
       (SELECT kmv_est FROM est WHERE side = 1) AS est_b,
       CAST(e.n_both * 1000000 // e.n_union AS BIGINT) AS jaccard_exact_ppm,
       CAST((SELECT SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
             FROM both_flags) * 1000000
            // (SELECT COUNT(*) FROM both_flags) AS BIGINT) AS jaccard_est_ppm
FROM exact e
"""


@register("kmv_corpus_overlap", oracle=_KMV_SQL, tags=("sketch", "dedup", "calibration"))
def kmv_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MINIMUM-VALUES corpus overlap (Beyer et al., SIGMOD 2007):
    each corpus half (doc_id parity) keeps its k smallest distinct-word
    hashes; the k smallest of the two sketches' union estimate the
    union's hash density, and the fraction of those union-sketch words
    present in BOTH bottom-k sets estimates vocabulary Jaccard — the
    snapshot-vs-snapshot contamination/overlap probe that at 100 TB
    runs on two k-row sketches instead of a distinct-set join.

    Per-corpus cardinality falls out of the same sketch as
    (k-1)·2^32 / h_k (exact bigint floor division; degenerate
    |corpus| < k answers exactly). The exact sides measure the sketch.

    Scale: the bottom-k per side is an ORDER-BY-limit over distinct
    hashes — Spark's TakeOrderedAndProject ships k rows per partition;
    everything downstream is k-row frames. Shuffle is flat in corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(F.split(_fold_text(), " ")).alias("w"),
    ).distinct()
    hashed = words.select(
        "side",
        "w",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    # bottom-k per side as ORDER BY + LIMIT: Catalyst plans each as
    # TakeOrderedAndProject (every partition ships at most k rows, the
    # merge is a k-way heap) — the flat-shuffle shape; a row_number
    # window would instead shuffle the whole distinct vocabulary into
    # one reducer per side.
    sk = (
        hashed.filter(F.col("side") == 0)
        .orderBy("h", "w")
        .limit(_KMV_K)
        .unionByName(
            hashed.filter(F.col("side") == 1).orderBy("h", "w").limit(_KMV_K)
        )
    )
    union_k = (
        sk.select("w", "h")
        .distinct()
        .orderBy("h", "w")
        .limit(_KMV_K)
        .drop("h")
    )
    both_flags = (
        union_k.join(sk.select("side", "w"), "w")
        .groupBy("w")
        .agg(
            F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("in_b"),
        )
    )
    est_both = both_flags.agg(
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("m"),
        # estimator denominator: the union sketch's ACTUAL size — only
        # < k when the union itself has fewer than k distinct words,
        # in which case the sketch is exact
        F.count("*").alias("u_eff"),
    )
    tail = sk.groupBy("side").agg(
        F.max("h").alias("h_k"), F.count("*").alias("k_eff")
    )
    est = tail.select(
        "side",
        F.when(F.col("k_eff") < _KMV_K, F.col("k_eff"))
        .otherwise(F.expr(f"({_KMV_K} - 1) * {_KMV_SPACE}L div h_k"))
        .cast("bigint")
        .alias("kmv_est"),
    )
    flags = words.groupBy("w").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ina"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("inb"),
    )
    exact = flags.agg(
        F.sum(F.col("ina")).cast("bigint").alias("exact_a"),
        F.sum(F.col("inb")).cast("bigint").alias("exact_b"),
        F.sum(F.col("ina") * F.col("inb")).cast("bigint").alias("n_both"),
        F.count("*").cast("bigint").alias("n_union"),
    )
    est_a = est.filter(F.col("side") == 0).select(
        F.col("kmv_est").alias("est_a")
    )
    est_b = est.filter(F.col("side") == 1).select(
        F.col("kmv_est").alias("est_b")
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_both))
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            "exact_a",
            "exact_b",
            "est_a",
            "est_b",
            F.expr("cast(n_both * 1000000 div n_union as bigint)").alias(
                "jaccard_exact_ppm"
            ),
            F.expr("cast(m * 1000000 div u_eff as bigint)").alias(
                "jaccard_est_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------
# Multi-column distinct profile from one scan (ANALYZE at scale)
# ---------------------------------------------------------------------

_PROFILE_COLS = ("user_id", "event_type", "props")

_HLL_PROFILE_SQL = f"""
WITH stacked AS (
  {" UNION ALL ".join(
      f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS w FROM events WHERE {c} IS NOT NULL"
      for c in _PROFILE_COLS
  )}
),
regs AS ({_hll_regs_sql('stacked', 'col_name', 'stacked')}),
fin AS ({_hll_finalize_sql('regs', 'col_name')}),
exact AS (SELECT col_name, CAST(COUNT(DISTINCT w) AS BIGINT) AS exact_distinct
          FROM stacked GROUP BY col_name)
SELECT e.col_name, e.exact_distinct, f.zero_registers, f.raw_est_milli,
       f.hll_est,
       CAST(abs(f.hll_est - e.exact_distinct) * 1000000 // e.exact_distinct
            AS BIGINT) AS err_ppm
FROM fin f JOIN exact e ON e.col_name = f.col_name
ORDER BY e.col_name
"""


@register(
    "hll_column_profile",
    oracle=_HLL_PROFILE_SQL,
    tags=("sketch", "stats", "audit"),
)
def hll_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-COLUMN distinct profile from ONE scan: the ANALYZE-style
    cardinality report (user_id / event_type / props of the event
    stream) that feeds join-planning and partitioning decisions. The
    row is read once, stack()-unpivoted to (col_name, value), and every
    column's HLL registers build inside the same constant-width
    aggregation — where per-column COUNT(DISTINCT) either runs one
    expand (c× the scan in one pass) or c separate jobs, and ships
    each distinct set through an exchange. At 100 TB this is the
    difference between a metadata sweep and a shuffle the size of the
    key domain.

    Same deterministic register/finalization core as hll_distinct
    (md5-chunk ladder, integer floor division, precomputed LC table);
    exact COUNT(DISTINCT) per column rides along as the calibration
    audit."""
    ev = load_table(spark, sf_dir, "events")
    stack_expr = ", ".join(
        f"'{c}', cast({c} as string)" for c in _PROFILE_COLS
    )
    stacked = ev.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) as (col_name, w)"
        )
    ).filter(F.col("w").isNotNull())
    hashed = stacked.select("col_name", F.md5("w").alias("hx"))
    fin = _finalize(_dense_registers(hashed, ["col_name"]), ["col_name"])
    exact = stacked.groupBy("col_name").agg(
        F.countDistinct("w").cast("bigint").alias("exact_distinct")
    )
    return (
        fin.join(exact, "col_name")
        .select(
            "col_name",
            "exact_distinct",
            "zero_registers",
            "raw_est_milli",
            "hll_est",
            F.expr(
                "cast(abs(hll_est - exact_distinct) * 1000000"
                " div exact_distinct as bigint)"
            ).alias("err_ppm"),
        )
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------
# CMS inner product: join-size estimation from two frequency sketches
# ---------------------------------------------------------------------

from .text_analysis import _CMS_D, _CMS_OFFSETS, _CMS_W, _cms_pos_sql  # noqa: E402


def _cms_join_sql() -> str:
    pos_case = (
        "CASE j "
        + " ".join(
            f"WHEN {j} THEN {_cms_pos_sql('w', j)}" for j in range(_CMS_D - 1)
        )
        + f" ELSE {_cms_pos_sql('w', _CMS_D - 1)} END"
    )
    js = ", ".join(str(j) for j in range(_CMS_D))
    return f"""
WITH toks AS (
  SELECT doc_id % 2 AS half, unnest(string_split({FOLD}, ' ')) AS w
  FROM documents
),
truth AS (
  SELECT CAST(SUM(a.na * b.nb) AS BIGINT) AS true_join_size
  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS na FROM toks WHERE half = 0 GROUP BY w) a
  JOIN (SELECT w, CAST(COUNT(*) AS BIGINT) AS nb FROM toks WHERE half = 1 GROUP BY w) b
    ON a.w = b.w
),
cells AS (
  SELECT half, j, {pos_case} AS p, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, unnest([{js}]) AS u(j)
  GROUP BY half, j, p
),
rows_ AS (
  SELECT a.j, CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM (SELECT j, p, c FROM cells WHERE half = 0) a
  JOIN (SELECT j, p, c FROM cells WHERE half = 1) b ON a.j = b.j AND a.p = b.p
  GROUP BY a.j
),
dots AS (
  SELECT g.j, COALESCE(r.dot, 0) AS dot
  FROM (SELECT CAST(range AS INT) AS j FROM range(0, {_CMS_D})) g
  LEFT JOIN rows_ r ON r.j = g.j
),
est AS (SELECT CAST(MIN(dot) AS BIGINT) AS cms_estimate FROM dots)
SELECT COALESCE(t.true_join_size, 0) AS true_join_size, e.cms_estimate,
       e.cms_estimate >= COALESCE(t.true_join_size, 0) AS is_upper_bound,
       CAST(CASE WHEN COALESCE(t.true_join_size, 0) = 0 THEN 0
                 ELSE (e.cms_estimate - t.true_join_size) * 1000000
                      // t.true_join_size END AS BIGINT) AS err_ppm
FROM truth t, est e
"""


@register(
    "cms_join_size",
    oracle=_cms_join_sql(),
    tags=("sketch", "text", "calibration"),
)
def cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION from two Count-Min sketches (the second
    classic CMS application, Cormode-Muthukrishnan 2005 §4.2): the
    size of an equi-join on word — Σ_k f_A(k)·f_B(k) between two
    corpus halves — estimated as min_j Σ_p A[j][p]·B[j][p], the
    row-wise inner product of the two d×w integer grids. The estimate
    is a guaranteed UPPER BOUND (collisions only add mass), asserted
    in the output; the deliberately undersized fixture grid (w=16)
    makes the overestimate visible, exactly like cms_word_counts'
    calibration framing.

    Why it matters at 100 TB: a cost-based optimizer (or a pipeline
    planner deciding broadcast-vs-shuffle) needs |A ⋈ B| BEFORE
    running the join; with CMS grids maintained per relation the
    answer costs d·w integer multiplies instead of the join itself.
    Both grid builds are ONE map-side-combined aggregation each
    (constant d·w-row partials — the flat-shuffle property measured
    for the sketch trio in SCALING.md); the exact side exists to
    measure the sketch and is the only word-keyed shuffle here."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(_fold_text(), " ")).alias("w"),
    )
    # md5 staged once per token (the no-CSE-in-derived-columns trap —
    # see cms_word_counts' 7.5× measurement)
    hx = toks.select("half", F.md5("w").alias("hx"))
    pos_of = lambda off: F.pmod(  # noqa: E731
        F.conv(F.substring(F.col("hx"), off, 8), 16, 10).cast("long"),
        F.lit(_CMS_W),
    )
    cells = hx.select(
        "half",
        F.posexplode(F.array(*[pos_of(off) for off in _CMS_OFFSETS])).alias(
            "j", "p"
        ),
    ).groupBy("half", "j", "p").agg(F.count("*").cast("bigint").alias("c"))
    ga = cells.filter(F.col("half") == 0).select("j", "p", F.col("c").alias("ca"))
    gb = cells.filter(F.col("half") == 1).select("j", "p", F.col("c").alias("cb"))
    dots = (
        ga.join(gb, ["j", "p"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    # A CMS row whose two halves share no (j,p) cell has a TRUE inner
    # product of 0 — the min_j formula must see that 0, so densify
    # against the d row ids before taking the min (a row absent from
    # the join is not "no information", it is a zero estimate).
    d_ids = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    est = (
        d_ids.join(dots, "j", "left")
        .agg(
            F.min(F.coalesce("dot", F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )
    wa = toks.filter(F.col("half") == 0).groupBy("w").agg(
        F.count("*").cast("bigint").alias("na")
    )
    wb = toks.filter(F.col("half") == 1).groupBy("w").agg(
        F.count("*").cast("bigint").alias("nb")
    )
    truth = (
        wa.join(wb, "w")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("true_join_size"))
    )
    # empty-corpus degradation: the size of an empty join is 0, not
    # NULL — the report stays a clean one-row zero artifact
    return truth.crossJoin(F.broadcast(est)).select(
        F.coalesce("true_join_size", F.lit(0))
        .cast("bigint")
        .alias("true_join_size"),
        "cms_estimate",
        (
            F.col("cms_estimate") >= F.coalesce("true_join_size", F.lit(0))
        ).alias("is_upper_bound"),
        F.expr(
            "cast(case when coalesce(true_join_size, 0) = 0 then 0"
            " else (cms_estimate - true_join_size) * 1000000"
            " div true_join_size end as bigint)"
        ).alias("err_ppm"),
    )
