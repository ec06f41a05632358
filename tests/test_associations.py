"""Unit pins for the association / blocking / incremental module
(operators/associations.py). Oracle parity for the three registered
queries runs in test_oracle_parity.py like every registry member;
here: the distributed-rank ≡ global row_number equivalence, the
a-priori prune's losslessness, retraction algebra, and the
sorted-neighborhood edge cases on a synthetic corpus."""

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
