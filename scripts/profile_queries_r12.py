"""Isolated per-query timing probe (r12 optimization round).

Runs the named queries (default: the headline bench set) at the given
sf_dir with the SAME action as bench.py (.count()), one untimed
warm-up then N timed samples with scheduler-health probes between, on
one session. Prints per-query sample arrays so a quiet floor can be
read directly. Optionally times the noop sink too (guide §1.4) so
column-pruned counts can be compared against full materialization.

Run: python scripts/profile_queries_r12.py [sf_dir] [q1,q2,...] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY, bench_queries
from asr_training_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2 and sys.argv[2] != "-"
        else sorted(bench_queries())
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    noop = os.environ.get("R12_NOOP", "0") == "1"
    spark = get_spark(app_name="profile_r12")
    spark.range(1000).selectExpr("sum(id)").collect()

    def probe() -> float:
        t0 = time.time()
        spark.range(10).count()
        return (time.time() - t0) * 1000.0

    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"r12-profile:{name}")
        df = fn(spark, sf_dir)
        df.count()  # warm-up
        spark.catalog.clearCache()
        samples, probes = [], []
        for _ in range(runs):
            t0 = time.time()
            if noop:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            probes.append(probe())
            spark.catalog.clearCache()
        print(
            f"{name}\tmin={min(samples):.3f}\t"
            f"samples={[round(s, 2) for s in samples]}\t"
            f"probes={[round(p) for p in probes]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
