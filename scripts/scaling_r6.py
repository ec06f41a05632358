"""100×-span scaling study for the round-5/6 additions: times each
query at sf0.001 → sf0.01 → sf0.1 AND records the shuffle-write bytes
of every run (AppStatusStore deltas — works with the UI disabled).

The headline claim under test: ``heavy_hitter_words``'s two-pass
sketch-then-recount keeps shuffle volume NEAR-FLAT as data grows
(pass 1 is map-side only and emits O(capacity·partitions) rows; pass
2 shuffles candidate tokens alone), while a naive groupBy's shuffle
grows with the distinct-word count.

Run: python scripts/scaling_r6.py  (markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    # (name, declared complexity / shuffle shape)
    ("heavy_hitter_words", "linear; shuffle O(capacity·partitions)"),
    ("bigram_perplexity", "linear; shuffle O(vocab) + doc_id agg"),
    ("dedup_incremental", "linear; hash-key shuffle only"),
    ("pack_sequences", "linear; single range partition"),
    ("train_test_split", "linear; scan-side hash, no shuffle"),
    ("exact_quantiles_orders", "linear; shuffle O(groups·buckets)"),
    ("ann_pq_topk", "linear (n·M·K train + n·M score); shuffle O(M·K·d_sub) sums + scored scalars"),
    ("dedup_bloom_probe", "linear; shuffle ≤256 sketch words + probe positions"),
    ("bloom_calibration", "linear; sketch + batch-only hash join"),
    ("ann_pq_rerank", "linear + R·Q rerank; shortlist broadcast back, corpus never shuffles"),
    ("cms_word_counts", "linear; shuffle O(d·w) counter grid (flat)"),
    ("bpe_merges", "corpus reduced once to word types; N rounds × (pair,count) partials"),
    ("snapshot_diff", "linear; (id, hash) full-outer compare, keys-only shuffle"),
    ("fk_integrity_audit", "linear; distinct-parent anti-probe, bare-key shuffle"),
    ("embedding_drift", "linear; 2·d fixed-point aggregate rows"),
    ("dedup_method_eval", "candidate-gen dominated; eval join is pair-keys only"),
    ("linreg_closed_form", "linear; one pass, ten integer aggregates, one row"),
    ("logreg_irls_probe", "linear; 2 IRLS passes + accuracy pass, broadcast 1-row model"),
]

SFS = [
    ("/root/testdata/sf0.001", "sf0.001"),
    ("/root/testdata/sf0.01", "sf0.01"),
    ("/root/testdata/sf0.1", "sf0.1"),
]


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over every
    stage the app has run so far (Spark UI REST API — the scaling
    session enables the UI just for this)."""
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as f:
        stages = json.load(f)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def measure(spark, fn, sf, runs=3):
    fn(spark, sf).count()  # warm-up (plan compile, code cache)
    spark.catalog.clearCache()
    best = float("inf")
    w0, _ = shuffle_totals(spark)
    fn(spark, sf).count()
    w1, _ = shuffle_totals(spark)
    spark.catalog.clearCache()
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best, w1 - w0


def main() -> None:
    spark = get_spark(
        app_name="scaling_r6",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print("| query | declared | " + " | ".join(
        f"{label} s / shuffle" for _, label in SFS
    ) + " | t ratio 100× | shuffle ratio 100× |")
    print("|---|---|" + "---|" * (len(SFS) + 2))
    only = set(sys.argv[1:])
    for name, decl in QUERIES:
        if only and name not in only:
            continue
        fn = REGISTRY[name].fn
        cells, ts, ws = [], [], []
        for sf, _label in SFS:
            t, w = measure(spark, fn, sf)
            ts.append(t)
            ws.append(w)
            cells.append(f"{t:.2f} / {w / 1e6:.2f} MB")
        tr = ts[-1] / ts[0] if ts[0] else float("inf")
        wr = ws[-1] / ws[0] if ws[0] else float("inf")
        print(
            f"| {name} | {decl} | " + " | ".join(cells)
            + f" | {tr:.1f}× | {wr:.1f}× |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
