"""Round-9 late-wave scaling rows, part 2: the tokenizer/retrieval/
gate operators added after scaling_r9b.

* unigram_lm_vocab / unigram_lm_fertility at sf0.1 and 500k docs —
  the bpe_merges thesis for the EM family: the corpus reduces ONCE to
  word types; EM rounds run on the type table (the BIG fixture's
  'v{i}'-prefixed copies grow the type table ~100×, the honest
  stressor); the driver holds only the bounded piece model;
* bm25_topk at sf0.1 and 500k docs — tf/df/dl are map-side-combined
  aggregations; the candidate join is inverted-index-thin (docs
  containing a query term only);
* streaming_simhash_gate at sf0.1 — the micro-batch machinery plus
  the broadcast band index (state: ZERO);
* window_rank_functions at sf0.1 — one partition-key exchange.

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r9c.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

BASE = "/root/testdata/sf0.1"


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r9c",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    cases = [
        ("unigram_lm_vocab", BASE, 2),
        ("unigram_lm_vocab", BIG, 1),
        ("unigram_lm_fertility", BASE, 2),
        ("bm25_topk", BASE, 2),
        ("bm25_topk", BIG, 1),
        ("streaming_simhash_gate", BASE, 2),
        ("window_rank_functions", BASE, 2),
    ]
    print("| query | fixture | wall (s, min of N) | shuffle write | rows |")
    print("|---|---|---|---|---|")
    for name, sf, samples in cases:
        fn = REGISTRY[name].fn
        walls = []
        n = None
        w0 = shuffle_totals(spark)
        for _ in range(samples):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            walls.append(time.perf_counter() - t0)
        w1 = shuffle_totals(spark)
        tag = "sf0.1" if sf == BASE else "500k docs"
        print(
            f"| {name} | {tag} | {min(walls):.1f} "
            f"(samples {[round(w, 1) for w in walls]}) "
            f"| {(w1 - w0) / (samples * 1e6):.2f} MB/run | {n} |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
