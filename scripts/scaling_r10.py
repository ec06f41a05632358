"""Round-10 scaling rows (VERDICT r9 tasks 3-6):

* multimodal_audio_canonical at 500k clips — the bounded audio dedup
  artifact on the dense-dup fixture where the raw pair dump projected
  ~1.9 B pairs and was killed (SCALING.md r9). canonical_manifest's
  rep-collapse (identical fingerprints -> one vertex) must make this
  finish: the 34-copy exact cliques contribute ONE vertex each to the
  banded join instead of C(34,2) pairs each.
* multimodal_phash_canonical at 500k images — same machinery, image
  kernel, for cross-modality comparison.
* dedup_rate_by_source_fast at 500k docs — the xxhash64 production
  matrix vs the md5 portable form's 898.5 s (r9 row: ~all portable-
  signature cost).
* unigram_lm_train at 2000 pieces / 3 EM rounds on 500k docs — the
  honest-scale tokenizer row: does the type-table economics hold as
  the piece set quadruples and rounds go 2->3?
* kcenter_coreset at sf0.1 — re-measure after the one-scan-per-round
  selection fold (was 2 scans/round).

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r10.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

BASE = "/root/testdata/sf0.1"


def timed(spark, label, thunk, samples=1):
    walls, n = [], None
    w0 = shuffle_totals(spark)
    for _ in range(samples):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = thunk()
        walls.append(time.perf_counter() - t0)
    w1 = shuffle_totals(spark)
    print(
        f"| {label} | {min(walls):.1f} "
        f"(samples {[round(w, 1) for w in walls]}) "
        f"| {(w1 - w0) / (samples * 1e6):.2f} MB/run | {n} |"
    )
    sys.stdout.flush()


def main() -> None:
    build_fixture()
    spark = get_spark(
        app_name="scaling_r10",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| case | wall (s, min of N) | shuffle write | rows |")
    print("|---|---|---|---|")

    for name, sf, tag, samples in [
        ("multimodal_audio_canonical", BASE, "sf0.1", 2),
        ("multimodal_audio_canonical", BIG, "500k clips", 1),
        ("multimodal_phash_canonical", BIG, "500k images", 1),
        ("dedup_rate_by_source_fast", BASE, "sf0.1", 2),
        ("dedup_rate_by_source_fast", BIG, "500k docs", 1),
        ("kcenter_coreset", BASE, "sf0.1 post-fold", 2),
    ]:
        fn = REGISTRY[name].fn
        timed(
            spark,
            f"{name} | {tag}",
            lambda fn=fn, sf=sf: fn(spark, sf).count(),
            samples,
        )

    # Tokenizer at honest scale: 2000 seed pieces, 3 hard-EM rounds,
    # 500k docs (the registered query trains 500/2 — a toy; this row
    # shows the type-table economics as the model grows).
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        unigram_lm_train,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, BIG, "documents")
    timed(
        spark,
        "unigram_lm_train(topk=2000, rounds=3) | 500k docs",
        lambda: unigram_lm_train(spark, docs, rounds=3, topk=2000).count(),
        1,
    )


if __name__ == "__main__":
    main()
