"""Round-8 scaling rows (VERDICT r7 tasks 2+7): the unmeasured r7 tail
(snm_recall_eval, hll_column_profile, linkage_entities at the big
fixtures), the retraction path (incremental_agg_retract IS that path),
the r8-new operators (pagerank_coorder, sampled_quantiles_orders,
bpe_fertility_by_lang), and the sampled-boundary rank's parallelism
proof (rfm_segments on a 100×-wide customer fixture, measured against
a deliberately degenerate single-bucket rank — the shape the r7 prefix
bucket silently produced).

Run: PYTHONPATH=.:scripts python scripts/scaling_r8.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

BASE = "/root/testdata/sf0.1"
LINK50K = "/tmp/sf_r8_link50k"  # 10 key-preserving copies (tail suffix)
WIDE = "/tmp/sf_r8_widecust"  # 100× customers for the rank study


def build_link50k() -> None:
    os.makedirs(LINK50K, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT d.doc_id + c.i * 1000000 AS doc_id,
         CASE WHEN c.i = 0 THEN d.text
              ELSE d.text || ' tail' || c.i END AS text,
         d.lang,
         'src' || (c.i % 5) AS source, d.n_chars
  FROM '{BASE}/documents.parquet' d,
       (SELECT unnest(range(10)) AS i) c
) TO '{LINK50K}/documents.parquet' (FORMAT PARQUET)
""")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{LINK50K}/{t}.parquet")


def build_widecust() -> None:
    os.makedirs(WIDE, exist_ok=True)
    con = duckdb.connect()
    # 100× customers, each copy re-keyed; order dates/prices jittered
    # deterministically so the three rfm metrics keep dense+wide domains
    con.sql(f"""
COPY (
  SELECT o_orderkey + c.i * 10000000 AS o_orderkey,
         o_custkey + c.i * 1000000 AS o_custkey,
         o_orderstatus, o_totalprice + c.i AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM '{BASE}/orders.parquet',
       (SELECT unnest(range(100)) AS i) c
) TO '{WIDE}/orders.parquet' (FORMAT PARQUET)
""")
    con.sql(f"""
COPY (
  SELECT c_custkey + i.i * 1000000 AS c_custkey, c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{BASE}/customer.parquet',
       (SELECT unnest(range(100)) AS i) i
) TO '{WIDE}/customer.parquet' (FORMAT PARQUET)
""")
    for t in ("region", "nation", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{WIDE}/{t}.parquet")


def timed(spark, name: str, sf: str) -> tuple[float, float, int]:
    fn = REGISTRY[name].fn
    w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    n = fn(spark, sf).count()
    t = time.perf_counter() - t0
    w1 = shuffle_totals(spark)
    spark.catalog.clearCache()
    return t, (w1 - w0) / 1e6, n


def main() -> None:
    build_fixture()  # 500k docs (+ copied star tables)
    build_link50k()
    build_widecust()
    spark = get_spark(
        app_name="scaling_r8",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| query | scale | wall (s) | shuffle write | rows |")
    print("|---|---|---|---|---|")
    ladder = [
        ("pagerank_coorder", "/root/testdata/sf0.001"),
        ("pagerank_coorder", "/root/testdata/sf0.01"),
        ("pagerank_coorder", "/root/testdata/sf0.1"),
        ("incremental_agg_retract", "/root/testdata/sf0.1"),
        ("sampled_quantiles_orders", "/root/testdata/sf0.1"),
        ("sampled_quantiles_orders", WIDE),  # 100× orders
        ("bpe_fertility_by_lang", "/root/testdata/sf0.1"),
        ("bpe_fertility_by_lang", BIG),  # 500k docs
        ("hll_column_profile", BIG),
        ("snm_recall_eval", LINK50K),  # truth side is Σdf² — sample scale
        ("linkage_entities", BIG),  # 500k docs, 34-copy exact cliques
        # second r8 wave
        ("dedup_tf_cosine", "/root/testdata/sf0.1"),
        ("dedup_tf_cosine", BIG),  # df-capped postings at 500k docs
        ("top_event_paths", "/root/testdata/sf0.1"),
        ("gopher_quality_flags", BIG),  # one pruned scan, zero exchanges
        ("dedup_paragraph", BIG),  # paragraph-key groupBy at 500k docs
    ]
    for name, sf in ladder:
        t, mb, n = timed(spark, name, sf)
        label = {BIG: "500k docs", LINK50K: "50k docs", WIDE: "100x cust"}.get(
            sf, sf.rsplit("/", 1)[-1]
        )
        print(f"| {name} | {label} | {t:.1f} | {mb:.2f} MB | {n} |")
        sys.stdout.flush()

    # rank-parallelism proof: the same rfm_segments plan with the real
    # sampled-boundary buckets vs a forced single bucket (the shape the
    # r7 prefix key degenerated to)
    from asr_training_data_pipeline_spark.operators import associations as assoc

    t_par, mb_par, n_par = timed(spark, "rfm_segments", WIDE)
    real_boundaries = assoc._rank_boundaries
    assoc._rank_boundaries = lambda df, key, id_col, n_buckets: []
    try:
        t_ser, mb_ser, n_ser = timed(spark, "rfm_segments", WIDE)
    finally:
        assoc._rank_boundaries = real_boundaries
    print(f"| rfm_segments | 100x cust, sampled buckets | {t_par:.1f} | "
          f"{mb_par:.2f} MB | {n_par} |")
    print(f"| rfm_segments | 100x cust, FORCED 1 bucket | {t_ser:.1f} | "
          f"{mb_ser:.2f} MB | {n_ser} |")


if __name__ == "__main__":
    main()
