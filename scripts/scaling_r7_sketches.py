"""sf1-equivalent rows for the r7 distinct-count sketch layer
(hll_distinct, hll_merge_shards, kmv_corpus_overlap,
pmi_collocations) on the same 500k-document fixture as
scaling_r6_sketch.py — the flat-shuffle claims (constant-width
register partials, TakeOrdered bottom-k) measured, not argued.

Run: PYTHONPATH=.:scripts python scripts/scaling_r7_sketches.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

QUERIES = [
    "hll_distinct",
    "hll_merge_shards",
    "kmv_corpus_overlap",
    "pmi_collocations",
]


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r7_sketches",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| query | wall (s) | shuffle write | rows |")
    print("|---|---|---|---|")
    for name in QUERIES:
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
