"""sf1-equivalent dry run for the round-6 sketch/PQ additions: build
the same 500k-document perturbed corpus and 200k-vector jittered
embedding expansion the r5/r6 studies used, then time each new
operator once with UI-REST shuffle accounting.

Run: python scripts/scaling_r6_sketch.py  (markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sfbig_r6_sketch"

DOC_QUERIES = ["dedup_bloom_probe", "bloom_calibration", "cms_word_counts"]
EMB_QUERIES = ["ann_pq_topk", "ann_pq_rerank"]


def build_fixture() -> None:
    import os

    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    # 100 perturbed copies: every 3rd copy keeps the text EXACTLY (the
    # ~34-exact-duplicate groups), the rest prepend a copy-unique token
    con.sql(f"""
COPY (
  SELECT d.doc_id + c.i * 1000000 AS doc_id,
         CASE WHEN c.i % 3 = 0 THEN d.text
              ELSE 'v' || c.i || ' ' || d.text END AS text,
         d.lang, d.source, d.n_chars
  FROM '{BASE}/documents.parquet' d,
       (SELECT unnest(range(100)) AS i) c
) TO '{BIG}/documents.parquet' (FORMAT PARQUET)
""")
    # 200k vectors: jittered 100-copy expansion (deterministic jitter)
    con.sql(f"""
COPY (
  SELECT e.vec_id + c.i * 1000000 AS vec_id,
         [x + 0.001 * c.i for x in e.embedding]::FLOAT[] AS embedding,
         e.label
  FROM '{BASE}/embeddings.parquet' e,
       (SELECT unnest(range(100)) AS i) c
) TO '{BIG}/embeddings.parquet' (FORMAT PARQUET)
""")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        import shutil

        shutil.copyfile(f"{BASE}/{t}.parquet", f"{BIG}/{t}.parquet")


def shuffle_totals(spark) -> int:
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as f:
        stages = json.load(f)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r6_sketch",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| query | wall (s) | shuffle write | rows |")
    print("|---|---|---|---|")
    for name in DOC_QUERIES + EMB_QUERIES:
        fn = REGISTRY[name].fn
        w0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        n = fn(spark, BIG).count()
        t = time.perf_counter() - t0
        w1 = shuffle_totals(spark)
        print(f"| {name} | {t:.1f} | {(w1 - w0) / 1e6:.2f} MB | {n} |")
        sys.stdout.flush()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
