"""Adversarial oracle parity for the r7/r8 association-blocking-sketch
wave (VERDICT r7 task 8): the driver fixture is uniform word salad, so
these operators' hard branches never fire there —

  * PPJoin with ALL-IDENTICAL prefixes and tie-dense document
    frequencies (the prefix filter's worst case: every candidate
    shares every prefix token, so only the positional/length filters
    prune);
  * sorted-neighborhood on a corpus where EVERY document shares one
    24+-char boilerplate prefix (the single-key blind spot the suffix
    pass exists for, and the hot-key tie spread of the sampled-
    boundary rank);
  * HLL on single-token (63 empty registers — deep linear-counting
    branch) and all-distinct (raw-estimate branch) corpora in one run,
    plus KMV and the merge proof on the same degenerate registers;
  * basket_lift on single-item baskets (no pairs at all) with a few
    boundary-support pairs and tied lifts.

Every case is an exact compare_frames parity run — if an engine-edge
diverges on these inputs, the repo's exactness contract calls it a
query-design bug, not noise.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

_STAR = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _mkdir_with_star(sf_dir, skip=()):
    d = tempfile.mkdtemp(prefix="adv_r7_")
    for t in _STAR:
        if t not in skip:
            shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


# ---------------------------------------------------------------------
# shared-prefix corpus: SNM + PPJoin
# ---------------------------------------------------------------------

_PREFIX_DOCS = """
SELECT row_number() OVER () - 1 AS doc_id,
       txt AS text,
       'en' AS lang,
       'src' || ((row_number() OVER ()) % 3) AS source,
       length(txt) AS n_chars
FROM (
  SELECT 'terms of service agree section ' ||
         CASE WHEN i % 4 = 0 THEN 'alpha beta gamma delta run ' || i
              WHEN i % 4 = 1 THEN 'alpha beta gamma delta run ' || (i - 1)
              WHEN i % 4 = 2 THEN 'omega psi chi phi row ' || i
              ELSE 'x x x x x x x x'
         END AS txt
  FROM (SELECT unnest(range(40)) AS i)
)
"""

_SHARED_PREFIX_QUERIES = [
    "sorted_neighborhood_pairs",
    "sorted_neighborhood_multikey",
    "snm_recall_eval",
    "dedup_ppjoin",
]


@pytest.fixture(scope="module")
def prefix_sf_dir(sf_dir):
    d = _mkdir_with_star(sf_dir, skip=("documents",))
    duckdb.sql(
        f"COPY ({_PREFIX_DOCS}) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    return d


@pytest.mark.parametrize("name", _SHARED_PREFIX_QUERIES)
def test_shared_prefix_parity(spark, prefix_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, prefix_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], prefix_sf_dir), name)
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# degenerate cardinality corpora: HLL branches + KMV
# ---------------------------------------------------------------------

# lang 'one': a single distinct token corpus-wide (63 empty registers,
# the deepest linear-counting entry). lang 'few': ~40 distinct tokens
# (LC mid-table). lang 'many': ~1500 distinct tokens (raw-estimate
# branch: raw > 2.5·m). doc_ids interleave so the 4-way shard split in
# hll_merge_shards sees every lang in every shard.
_CARD_DOCS = """
SELECT i AS doc_id,
       CASE WHEN i % 3 = 0 THEN 'tok tok tok tok'
            WHEN i % 3 = 1 THEN 'w' || (i % 40) || ' w' || ((i + 7) % 40)
            ELSE 'u' || i || 'a u' || i || 'b u' || i || 'c u' || i || 'd'
       END AS text,
       CASE WHEN i % 3 = 0 THEN 'one'
            WHEN i % 3 = 1 THEN 'few' ELSE 'many' END AS lang,
       'src' || (i % 4) AS source,
       10 AS n_chars
FROM (SELECT unnest(range(1200)) AS i)
UNION ALL
-- non-ASCII lang: mixed-case Cyrillic/Greek tokens — the sketch
-- layer's fold-table tokenization must count 'Москва'/'москва' as ONE
-- distinct token on BOTH engines (lower() here would be
-- engine-divergent; the generated translate is not)
SELECT 2000 + j,
       CASE WHEN j % 2 = 0 THEN 'Москва ΤΕΛΟΣ Дата модель'
            ELSE 'москва τελος дата МОДЕЛЬ' END,
       'uni', 'src' || (j % 4), 10
FROM (SELECT unnest(range(8)) AS j)
"""

_CARD_QUERIES = [
    "hll_distinct",
    "hll_merge_shards",
    "hll_column_profile",
    "kmv_corpus_overlap",
]


@pytest.fixture(scope="module")
def card_sf_dir(sf_dir):
    d = _mkdir_with_star(sf_dir, skip=("documents",))
    duckdb.sql(
        f"COPY ({_CARD_DOCS}) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    return d


@pytest.mark.parametrize("name", _CARD_QUERIES)
def test_degenerate_cardinality_parity(spark, card_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, card_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], card_sf_dir), name)
    spark.catalog.clearCache()


def test_hll_branches_actually_fire(spark, card_sf_dir):
    """The fixture must really exercise both estimator branches: the
    single-token lang leaves ≥60 registers empty (deep LC), the
    all-distinct lang fills enough registers to leave LC."""
    rows = {
        r.lang: r for r in REGISTRY["hll_distinct"].fn(spark, card_sf_dir).collect()
    }
    assert rows["one"].exact_distinct == 1
    assert rows["one"].zero_registers >= 60
    assert rows["many"].zero_registers <= 3
    assert rows["many"].raw_est_milli > 2500 * 64  # raw branch territory
    # fold-table tokenization: mixed-case Cyrillic/Greek unify — 4
    # distinct folded tokens, not 8 case variants
    assert rows["uni"].exact_distinct == 4


# ---------------------------------------------------------------------
# single-item baskets: basket_lift + pagerank on a no-edge graph
# ---------------------------------------------------------------------

_SINGLETON_LINEITEM = """
SELECT * FROM (
  -- 60 single-item baskets: no pairs can exist
  SELECT i AS l_orderkey, 100 + i AS l_partkey
  FROM (SELECT unnest(range(60)) AS i)
  UNION ALL
  -- three baskets with the SAME pair {1, 2} (exactly at support 3)
  SELECT 1000 + j, p FROM (SELECT unnest(range(3)) AS j),
                          (SELECT unnest([1, 2]) AS p)
  UNION ALL
  -- two baskets with pair {3, 4}: below support, must be pruned
  SELECT 2000 + j, p FROM (SELECT unnest(range(2)) AS j),
                          (SELECT unnest([3, 4]) AS p)
)
"""


@pytest.fixture(scope="module")
def singleton_sf_dir(sf_dir):
    d = _mkdir_with_star(sf_dir, skip=("lineitem",))
    duckdb.sql(
        f"COPY ({_SINGLETON_LINEITEM}) TO '{d}/lineitem.parquet'"
        " (FORMAT PARQUET)"
    )
    return d


@pytest.mark.parametrize("name", ["basket_lift", "pagerank_coorder"])
def test_singleton_baskets_parity(spark, singleton_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, singleton_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], singleton_sf_dir), name)
    spark.catalog.clearCache()


def test_singleton_baskets_semantics(spark, singleton_sf_dir):
    lift = REGISTRY["basket_lift"].fn(spark, singleton_sf_dir).collect()
    assert len(lift) == 1  # only {1,2} reaches support 3
    assert (lift[0].item_a, lift[0].item_b, lift[0].pair_cnt) == (1, 2, 3)
    pr = REGISTRY["pagerank_coorder"].fn(spark, singleton_sf_dir).collect()
    # the graph is the single 1-2 edge pair: two nodes, symmetric ranks
    assert {r.part for r in pr} == {1, 2, 3, 4}  # {3,4} edges exist too
