"""Unit pins for the association / blocking / incremental module
(operators/associations.py). Oracle parity for its registered
queries runs in test_oracle_parity.py like every registry member;
here: the distributed-rank ≡ global row_number equivalence, the
a-priori prune's losslessness, retraction algebra, the
sorted-neighborhood edge cases on a synthetic corpus, the multi-pass
recall win, session-gap transition semantics, and the record-linkage
blocking tradeoffs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.associations import (
    _MIN_PAIR_SUPPORT,
    _TOP_PAIRS,
    aggregate_events,
    distributed_rank,
    merge_group_aggs,
)
from asr_training_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------
# distributed_rank ≡ ROW_NUMBER() OVER (ORDER BY key, id)
# ---------------------------------------------------------------------


def test_distributed_rank_matches_global_row_number(spark):
    """Edge keys included: empty string, keys shorter than the bucket
    prefix, a shared-key tie broken by id, and keys that straddle a
    bucket boundary ('a' vs 'ab': the prefix property must keep
    bucket order consistent with key order)."""
    rows = [
        ("", 10),
        ("a", 2),
        ("a", 1),
        ("ab", 7),
        ("abc", 3),
        ("b", 4),
        ("ba", 8),
        ("z", 6),
        ("zz", 5),
        # non-ASCII: substring() is codepoint-based in Spark, so the
        # prefix property holds for multi-byte keys too
        ("é", 11),
        ("éa", 12),
        ("中文字", 13),
        ("中", 14),
    ]
    df = spark.createDataFrame(rows, "key string, doc_id long")
    got = {r.doc_id: r.rnk for r in distributed_rank(df, "key", "doc_id").collect()}
    expect = {d: i + 1 for i, (_, d) in enumerate(sorted(rows))}
    assert got == expect


def test_distributed_rank_dense_and_bijective(spark, sf_dir):
    """On the real corpus the rank must be a bijection onto 1..n."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.lower("text"), 1, 24).alias("key")
    )
    n = docs.count()
    ranks = distributed_rank(docs, "key", "doc_id")
    stats = ranks.agg(
        F.countDistinct("rnk").alias("d"),
        F.min("rnk").alias("lo"),
        F.max("rnk").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert (stats.d, stats.lo, stats.hi, stats.n) == (n, 1, n, n)


def _bucket_counts(df, key, id_col, n_buckets):
    """Reconstruct distributed_rank's bucket assignment (the sampled-
    boundary interval index) and return per-bucket row counts."""
    from asr_training_data_pipeline_spark.operators.associations import (
        _rank_boundaries,
    )

    bounds = _rank_boundaries(df, key, id_col, n_buckets)
    bkt = F.lit(0)
    for bk, bi in bounds:
        after = (F.col(key) > F.lit(bk)) | (
            (F.col(key) == F.lit(bk)) & (F.col(id_col) >= F.lit(bi))
        )
        bkt = bkt + F.when(after, 1).otherwise(0)
    return [
        r["count"]
        for r in df.withColumn("_bkt", bkt).groupBy("_bkt").count().collect()
    ]


def test_rank_buckets_spread_on_dense_numeric_domain(spark, sf_dir):
    """The r7 regression this pins: rfm's lpad(metric + 2^62) keys all
    start '04', and a dense metric domain (order frequency takes a
    handful of values) defeats ANY key-prefix bucket — 100% of
    customers landed in ONE bucket, making each 'distributed' rank a
    single task. Sampled (key, id) boundaries must spread the rank:
    a data-aware bucket-count floor, not a plan-syntax lock."""
    orders = load_table(spark, sf_dir, "orders")
    pc = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    keyed = pc.select(
        "ck",
        F.lpad((F.col("freq") + F.lit(1 << 62)).cast("string"), 20, "0").alias(
            "key"
        ),
    )
    n = keyed.count()
    counts = _bucket_counts(keyed, "key", "ck", 32)
    assert len(counts) >= 16, f"degenerate bucketing: {len(counts)} buckets"
    assert max(counts) <= max(4 * n // 32, 8), (
        f"hot bucket holds {max(counts)}/{n} rows"
    )


def test_rank_buckets_spread_on_shared_prefix_corpus(spark):
    """Zipf-skewed text keys (every doc opening with the same
    boilerplate 24 chars — worse than the 'th'/'a ' skew a 2-char
    prefix bucket suffers): ties on the HOT key must spread across
    buckets by the id tiebreaker, and the rank must stay the exact
    global row_number."""
    hot = "the quick brown fox jump"  # 24 shared chars
    rows = [(i, hot) for i in range(400)] + [
        (1000 + i, f"zz unique tail {i:05d}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    counts = _bucket_counts(df, "key", "doc_id", 32)
    assert len(counts) >= 16, f"hot key collapsed buckets: {len(counts)}"
    assert max(counts) <= 4 * 500 // 32
    got = {
        r.doc_id: r.rnk for r in distributed_rank(df, "key", "doc_id").collect()
    }
    expect = {d: i + 1 for i, (_, d) in enumerate(sorted((k, d) for d, k in rows))}
    assert got == expect


# ---------------------------------------------------------------------
# basket_lift: the a-priori prune is lossless
# ---------------------------------------------------------------------


def test_apriori_prune_is_lossless(spark, sf_dir):
    """Recompute the pair table WITHOUT the item-support prune (DuckDB,
    brute force) — the pruned Spark result must be identical, because
    pair support is bounded by member support (the monotonicity that
    makes the prune safe)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    brute = con.sql(
        f"""
WITH baskets AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM baskets),
items AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM baskets GROUP BY item),
pruned AS (SELECT b.ok, b.item, i.cnt FROM baskets b JOIN items i ON i.item = b.item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS pair_cnt,
         MAX(a.cnt) AS cnt_a, MAX(b.cnt) AS cnt_b
  FROM pruned a JOIN pruned b ON a.ok = b.ok AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT})
SELECT item_a, item_b, pair_cnt, cnt_a, cnt_b,
       CAST(pair_cnt * 1000000 // n.n_baskets AS BIGINT) AS support_ppm,
       CAST(pair_cnt * 1000000 // cnt_a AS BIGINT) AS conf_ab_ppm,
       CAST(pair_cnt * 1000000 // cnt_b AS BIGINT) AS conf_ba_ppm,
       CAST(pair_cnt * n.n_baskets * 1000 // (cnt_a * cnt_b) AS BIGINT) AS lift_milli
FROM pairs, n
ORDER BY lift_milli DESC, item_a, item_b
LIMIT {_TOP_PAIRS}
"""
    ).fetchall()
    got = [tuple(r) for r in REGISTRY["basket_lift"].fn(spark, sf_dir).collect()]
    assert got == [tuple(r) for r in brute]


# ---------------------------------------------------------------------
# incremental_agg_refresh: merge algebra
# ---------------------------------------------------------------------


def test_empty_delta_is_identity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    base = aggregate_events(ev)
    empty = aggregate_events(ev.filter(F.lit(False)))
    merged = merge_group_aggs(base, empty)
    assert merged.filter(
        (F.col("n_delta") != 0)
        | (F.col("sum_delta_ms") != 0)
        | (F.col("n_total") != F.col("n_base"))
        | (F.col("sum_total_ms") != F.col("sum_base_ms"))
    ).count() == 0
    assert merged.count() == base.count()


def test_retraction_cancels_insert(spark, sf_dir):
    """Insert every odd event then retract it (weight -1): the merged
    totals must equal the base-only aggregate — the monoid-inverse
    property that lets a change log carry deletes."""
    ev = load_table(spark, sf_dir, "events")
    odd = F.col("event_id") % 2 == 1
    base = aggregate_events(ev.filter(~odd))
    churn = (
        ev.filter(odd).withColumn("w", F.lit(1))
        .unionByName(ev.filter(odd).withColumn("w", F.lit(-1)))
    )
    delta = aggregate_events(churn, weight=F.col("w"))
    merged = merge_group_aggs(base, delta)
    assert merged.filter(
        (F.col("n_total") != F.col("n_base"))
        | (F.col("sum_total_ms") != F.col("sum_base_ms"))
    ).count() == 0
    got = {
        (r.user_id, r.event_type): (r.n_total, r.sum_total_ms)
        for r in merged.filter(F.col("n_total") > 0).collect()
    }
    want = {
        (r.user_id, r.event_type): (r.n, r.sum_ms) for r in base.collect()
    }
    assert got == want


# ---------------------------------------------------------------------
# sorted_neighborhood_pairs: synthetic-corpus edge cases
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def snm_dir(spark, tmp_path_factory):
    """A crafted documents table: two near-dups sharing a 24-char
    prefix, one unrelated doc, one doc below the shingle k, and one
    empty text."""
    d = tmp_path_factory.mktemp("snm")
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 60),
        (2, "the quick brown fox jumps over the lazy dog again and again ok", "en", "s", 63),
        (3, "zzz completely unrelated words in this document here", "en", "s", 53),
        (4, "two words", "en", "s", 9),
        (5, "", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_snm_finds_prefix_near_dup_and_skips_short_docs(spark, snm_dir):
    out = REGISTRY["sorted_neighborhood_pairs"].fn(spark, snm_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    # exact integer Jaccard: doc1 has 10 distinct 3-shingles, doc2 has
    # 11, sharing all 10 → 10/11.
    assert pairs[(1, 2)].jac_ppm == 10 * 1_000_000 // 11
    flat = {d for p in pairs for d in p}
    assert 4 not in flat and 5 not in flat  # below shingle k: never verified


# ---------------------------------------------------------------------
# event_transition_matrix: session-gap semantics on a crafted stream
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def trans_dir(spark, tmp_path_factory):
    """user 1: a →(10 min)→ b →(110 min, past the 30-min gap)→ c;
    user 2: a →(1 min)→ a. Cross-user and cross-session transitions
    must not appear."""
    import datetime as dt

    d = tmp_path_factory.mktemp("trans")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, "a"),
        ev(2, 1, 10, "b"),
        ev(3, 1, 120, "c"),
        ev(4, 2, 0, "a"),
        ev(5, 2, 1, "a"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_transition_matrix_respects_session_gap(spark, trans_dir):
    out = {
        (r.src, r.dst): (r.cnt, r.src_total, r.prob_ppm)
        for r in REGISTRY["event_transition_matrix"].fn(spark, trans_dir).collect()
    }
    assert out == {
        ("a", "b"): (1, 2, 500_000),
        ("a", "a"): (1, 2, 500_000),
    }


# ---------------------------------------------------------------------
# record_linkage_fuzzy: cross-source, same-source and blocking edges
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def linkage_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("linkage")
    rows = [
        (1, "the quick brown fox jumps over it", "srcA", "en", 33),
        (2, "the quick brown fox jumps over us", "srcB", "en", 33),
        (3, "the quick brown fox jumps over it", "srcA", "en", 33),
        (4, "completely different text in here", "srcA", "en", 33),
        (5, "xhe quick brown fox jumps over it", "srcB", "en", 33),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_record_linkage_cross_source_best_match(spark, linkage_dir):
    out = {
        r.doc_id: (r.match_doc, r.match_source, r.dist)
        for r in REGISTRY["record_linkage_fuzzy"].fn(spark, linkage_dir).collect()
    }
    # doc 1 and 3 (srcA) link to doc 2 (srcB) at edit distance 2; the
    # same-source exact duplicate (1↔3) is never a link candidate.
    assert out[1] == (2, "srcB", 2)
    assert out[3] == (2, "srcB", 2)
    # doc 2's tie between docs 1 and 3 resolves to the smaller id.
    assert out[2] == (1, "srcA", 2)
    # doc 4: no cross-source candidate — absent.
    assert 4 not in out
    # doc 5 is distance 1 from doc 1 but disagrees on the 4-char
    # block prefix ("xhe " vs "the ") — the documented blocking
    # recall tradeoff: absent.
    assert 5 not in out


# ---------------------------------------------------------------------
# sorted_neighborhood_multikey: the suffix pass earns its keep
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def snm_mk_dir(spark, tmp_path_factory):
    """doc 2 is doc 1 with a PREFIX tag ('zz v1 '), so its first-24
    key sorts far away (four separator docs in between) — single-key
    SNM misses the pair, the suffix key lands them adjacent."""
    d = tmp_path_factory.mktemp("snm_mk")
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, "zz v1 " + base, "en", "s", len(base) + 6),
        (3, "under a different starting letter entirely for separation", "en", "s", 58),
        (4, "very different content again for rank separation purposes", "en", "s", 58),
        (5, "wholly unrelated words placed between the two near dup docs", "en", "s", 59),
        (6, "xenon argon krypton neon helium radon separate this corpus", "en", "s", 58),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_multikey_suffix_pass_catches_prefix_perturbation(spark, snm_mk_dir):
    mk = {
        (r.doc_a, r.doc_b): (r.in_prefix_pass, r.in_suffix_pass)
        for r in REGISTRY["sorted_neighborhood_multikey"].fn(spark, snm_mk_dir).collect()
    }
    assert (1, 2) in mk
    in_prefix, in_suffix = mk[(1, 2)]
    assert in_suffix and not in_prefix
    # the single-key operator misses the same pair on the same corpus
    single = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["sorted_neighborhood_pairs"].fn(spark, snm_mk_dir).collect()
    }
    assert (1, 2) not in single
