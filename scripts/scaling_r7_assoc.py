"""Scaling rows for the late-r7 association/blocking/IVM operators:
basket_lift and incremental_agg_refresh across the 100× SF span
(their input tables grow with SF), sorted_neighborhood_pairs on the
500k-document perturbed fixture (documents are SF-constant in the
testdata, so the sketch-study corpus is the scale probe).

Run: PYTHONPATH=.:scripts python scripts/scaling_r7_assoc.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

SF_SPAN = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def time_one(spark, name: str, sf_dir: str):
    fn = REGISTRY[name].fn
    w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    t = time.perf_counter() - t0
    w1 = shuffle_totals(spark)
    return t, (w1 - w0) / 1e6, n


LINK_BIG = "/tmp/sfbig_r7_linkage"


def build_linkage_fixture() -> None:
    """50k docs: 10 TAIL-suffix copies of sf0.1 documents (suffixes
    keep the 40-char match key and the 4-char block of the original,
    so block populations scale ×10 and candidates ×100 — the
    quadratic-in-block-size behavior the row is meant to show)."""
    import os

    import duckdb

    os.makedirs(LINK_BIG, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT d.doc_id + c.i * 1000000 AS doc_id,
         d.text || ' v' || c.i AS text, d.lang, d.source, d.n_chars
  FROM '/root/testdata/sf0.1/documents.parquet' d,
       (SELECT unnest(range(10)) AS i) c
) TO '{LINK_BIG}/documents.parquet' (FORMAT PARQUET)
""")
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(
            f"/root/testdata/sf0.1/{t}.parquet", f"{LINK_BIG}/{t}.parquet"
        )


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r7_assoc",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| query | scale | wall (s) | shuffle write | rows |")
    print("|---|---|---|---|---|")
    for name in ("basket_lift", "incremental_agg_refresh", "rfm_segments"):
        for label, sf_dir in SF_SPAN:
            t, mb, n = time_one(spark, name, sf_dir)
            print(f"| {name} | {label} | {t:.2f} | {mb:.2f} MB | {n} |")
            sys.stdout.flush()
            spark.catalog.clearCache()
    for name in ("sorted_neighborhood_pairs",):
        for label, sf_dir in [("sf0.1 (500 docs)", "/root/testdata/sf0.1"),
                              ("500k docs", BIG)]:
            t, mb, n = time_one(spark, name, sf_dir)
            print(f"| {name} | {label} | {t:.2f} | {mb:.2f} MB | {n} |")
            sys.stdout.flush()
            spark.catalog.clearCache()
    for name in ("sorted_neighborhood_multikey",):
        for label, sf_dir in [("sf0.1 (5k docs)", "/root/testdata/sf0.1"),
                              ("500k docs", BIG)]:
            t, mb, n = time_one(spark, name, sf_dir)
            print(f"| {name} | {label} | {t:.2f} | {mb:.2f} MB | {n} |")
            sys.stdout.flush()
            spark.catalog.clearCache()
    for name in ("event_transition_matrix",):
        for label, sf_dir in SF_SPAN:
            t, mb, n = time_one(spark, name, sf_dir)
            print(f"| {name} | {label} | {t:.2f} | {mb:.2f} MB | {n} |")
            sys.stdout.flush()
            spark.catalog.clearCache()
    build_linkage_fixture()
    for name in ("record_linkage_fuzzy", "linkage_entities"):
        for label, sf_dir in [("sf0.1 (5k docs)", "/root/testdata/sf0.1"),
                              ("50k docs (10 key-preserving copies)", LINK_BIG)]:
            t, mb, n = time_one(spark, name, sf_dir)
            print(f"| {name} | {label} | {t:.2f} | {mb:.2f} MB | {n} |")
            sys.stdout.flush()
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
