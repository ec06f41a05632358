"""sf1-equivalent dry run for the r7 exact-duplicate pre-collapse
(VERDICT r6 task 3): rebuild the same 500k-document fixture the r6
study used (34 exact copies + 66 near-copies per base doc) and
measure the collapsed dedup chain — wall, shuffle, and the size of
the pair set that actually enters the iterative clustering loop
(rep-level) vs the pair set the uncollapsed chain would push through
it (full expansion, which the public queries still emit unchanged).

Run: python scripts/scaling_r7_collapse.py  (markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

QUERIES = ["dedup_minhash_lsh", "dedup_components", "curation_funnel"]


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r7_collapse",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    from asr_training_data_pipeline_spark.operators.dedup import (
        collapse_exact_text,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, BIG, "documents")
    reps, members = collapse_exact_text(docs)
    n_docs, n_reps = docs.count(), reps.count()
    print(f"docs: {n_docs}, distinct texts (reps): {n_reps} "
          f"({n_docs / n_reps:.2f}x collapse)", flush=True)
    spark.catalog.clearCache()
    print()
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
