"""Round-9 late-wave scaling rows: the five operators added after the
wave-6 rotation.

* multimodal_phash_dedup at sf0.1 (5k images) and the 500k-image
  fixture — the claim under test: pixels never shuffle; the exchange
  carries 8-byte hashes + band keys, and the BIG wall is the pair
  OUTPUT (the fixture's exact-dup cliques hash identically), the same
  output-bound economics as the minhash collapse study;
* dedup_rate_by_source at sf0.1 and BIG — the analytics layer on top
  of the portable-MinHash pair set: its own cost is two doc_id-keyed
  (doc_id, source) projections joined to the pair frame + a broadcast
  of the per-source count table, so the delta over the pair set
  itself is what to measure (BIG is min-of-1: the pair set alone is a
  multi-minute output-bound run, already characterized in the r6/r8
  minhash rows);
* q7/q21/q22 at sf0.1 — the relational decorrelation shapes: q21's
  two self-probes must reuse the orderkey partitioning (one exchange
  feeds join + semi + anti), q7/q22 broadcast every dimension.

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r9b.py
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
        app_name="scaling_r9b",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    cases = [
        ("multimodal_phash_dedup", BASE, 2),
        ("multimodal_phash_dedup", BIG, 1),
        ("dedup_rate_by_source", BASE, 2),
        ("dedup_rate_by_source", BIG, 1),
        ("q7_volume_shipping", BASE, 2),
        ("q21_waiting_supplier", BASE, 2),
        ("q22_global_sales_opportunity", BASE, 2),
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
