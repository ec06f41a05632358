"""Measured data-scaling report: times representative queries at
sf0.01 and sf0.1 (10× the rows) and prints the wall-clock ratio per
query. A scan-bound linear operator should come in well under 10×
(fixed per-query overhead amortizes); the declared-quadratic
calibration operators are expected near 100× and are labeled as such.

Run: python scripts/scaling_report.py  (writes markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    # (name, declared complexity)
    ("word_coverage", "linear"),
    ("q1_pricing_summary", "linear"),
    ("sessionize_events", "linear"),
    ("dedup_exact", "linear"),
    ("dedup_ngram_jaccard", "index-bounded"),
    ("dedup_minhash_lsh", "linear (bands)"),
    ("corpus_curation", "linear"),
    ("curation_signals_fused", "linear"),
    ("unigram_perplexity", "linear"),
    ("contamination_check", "linear"),
    ("zorder_layout_events", "n log n (sort)"),
    ("ann_cosine_topk", "linear (n·Q)"),
    ("ann_sq8_topk", "linear (n·Q)"),
    ("embedding_cosine_pairs", "QUADRATIC (calibration-only)"),
    ("asr_pipeline_clips", "linear (per-pair kernels)"),
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def time_query(spark, fn, sf, runs=2):
    fn(spark, sf).count()  # warm-up
    spark.catalog.clearCache()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return min(samples)


def main() -> None:
    spark = get_spark(app_name="scaling_report")
    spark.range(1000).selectExpr("sum(id)").collect()
    rows = []
    for name, kind in QUERIES:
        fn = REGISTRY[name].fn
        runs = 1 if "QUADRATIC" in kind else 2
        t_small = time_query(spark, fn, SFS[0], runs)
        t_big = time_query(spark, fn, SFS[1], runs)
        rows.append((name, kind, t_small, t_big, t_big / max(t_small, 1e-9)))
        print(
            f"# {name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(x{t_big / max(t_small, 1e-9):.1f})",
            file=sys.stderr,
        )
    print("| query | declared complexity | sf0.01 (s) | sf0.1 (s) | ratio at 10x data |")
    print("|---|---|---|---|---|")
    for name, kind, ts, tb, r in rows:
        print(f"| {name} | {kind} | {ts:.2f} | {tb:.2f} | {r:.1f}x |")


if __name__ == "__main__":
    main()
