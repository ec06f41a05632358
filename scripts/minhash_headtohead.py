#!/usr/bin/env python
"""Interleaved head-to-head of the two LSH candidate-join persist
shapes (VERDICT r4 task 1).

Commit 9f79a74 moved the persist in ``_band_pairs`` from the exploded
band frame ("band", r3 shape) to the compact per-doc fingerprint frame
("doc", r4 shape). The r4 driver bench said 8.22 s vs r3's 3.01 s; the
builder's cleared-cache measure said 3.76 s. Single-block samples on
this host are untrustworthy (multi-second external load bursts), so
this harness alternates the two shapes run-for-run on ONE session —
doc, band, doc, band, … — min-of-N each, cache cleared between runs.
Interleaving means any burst hits both shapes equally in expectation.

Usage: python scripts/minhash_headtohead.py [rounds]  (default 6)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

from asr_training_data_pipeline_spark.operators import dedup
from asr_training_data_pipeline_spark.session import get_spark


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="minhash_headtohead", cpus=cpus)

    # Same warm-up as bench.py: JVM codegen + Python worker pool.
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy  # noqa: F401

        return s

    spark.range(cpus * 4, numPartitions=cpus).select(_warm("id")).count()

    # One untimed warm-up per shape (plan-specific codegen compile).
    for mode in ("doc", "band"):
        dedup._BAND_PERSIST_DEFAULT = mode
        dedup.dedup_minhash_lsh(spark, sf_dir).count()
        spark.catalog.clearCache()

    samples: dict[str, list[float]] = {"doc": [], "band": []}
    for r in range(rounds):
        for mode in ("doc", "band"):
            dedup._BAND_PERSIST_DEFAULT = mode
            t0 = time.perf_counter()
            n = dedup.dedup_minhash_lsh(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            samples[mode].append(round(dt, 3))
            print(f"round {r} {mode:4s} {dt:7.3f}s rows={n}", flush=True)

    dedup._BAND_PERSIST_DEFAULT = "doc"
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "samples": samples,
        "min": {m: min(v) for m, v in samples.items()},
        "median": {m: sorted(v)[len(v) // 2] for m, v in samples.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
