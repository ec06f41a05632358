"""Round-10 scaling re-measure: the cases whose first-pass numbers were
taken under heavy external load (loadavg 15-20, same-case sample
spreads of 3x) plus the two post-fix re-runs:

* canonical manifests after the `hold` fix (the fingerprint frame was
  consumed twice — rep groups + manifest join — so the Arrow
  decode/FFT kernel ran twice in the first pass);
* dedup_rate_by_source_fast after switching to the UNSORTED
  minhash_lsh_pairs provider (the registered pair query's final
  orderBy is a range exchange of the whole 27M-pair set that buys
  nothing ahead of the matrix aggregation).

Each case records the scheduler-health probe (spark.range(10).count()
latency) next to its samples so a stalled window is visible in the row.

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r10b.py
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
        app_name="scaling_r10b",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )

    def probe_ms() -> float:
        t0 = time.perf_counter()
        spark.range(10).count()
        return (time.perf_counter() - t0) * 1000.0

    print("| case | wall (s, min of N) | probes (ms) | shuffle write | rows |")
    print("|---|---|---|---|---|")
    for name, sf, tag, samples in [
        ("multimodal_audio_canonical", BASE, "sf0.1 post-hold", 2),
        ("dedup_rate_by_source_fast", BASE, "sf0.1 unsorted-pairs", 2),
        ("multimodal_audio_canonical", BIG, "500k clips post-hold", 1),
        ("multimodal_phash_canonical", BIG, "500k images post-hold", 1),
        ("dedup_rate_by_source_fast", BIG, "500k docs unsorted-pairs", 1),
    ]:
        fn = REGISTRY[name].fn
        walls, probes = [], []
        n = None
        w0 = shuffle_totals(spark)
        for _ in range(samples):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            walls.append(time.perf_counter() - t0)
            probes.append(probe_ms())
        w1 = shuffle_totals(spark)
        print(
            f"| {name} | {tag} | {min(walls):.1f} "
            f"(samples {[round(w, 1) for w in walls]}) "
            f"| {[round(p) for p in probes]} "
            f"| {(w1 - w0) / (samples * 1e6):.2f} MB/run | {n} |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
