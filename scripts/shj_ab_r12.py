"""A/B: sort-merge vs shuffled-hash join preference (guide §3.1/§9).

Times the named queries twice on ONE session pair — baseline session
config vs preferSortMergeJoin=false (+ AQE SMJ→SHJ rewrite threshold)
— alternating runs so host weather hits both arms. Each arm: one
untimed warm-up, then N timed .count() samples (bench methodology).

Run: python scripts/shj_ab_r12.py [sf_dir] [q1,q2,...] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark(app_name="shj_ab_r12")
    spark.range(1000).selectExpr("sum(id)").collect()

    def set_shj(on: bool) -> None:
        spark.conf.set(
            "spark.sql.join.preferSortMergeJoin", "false" if on else "true"
        )
        # AQE runtime SMJ→SHJ rewrite: partitions under this build a
        # hash table instead of sorting. 0 = off (default).
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m" if on else "0",
        )

    for name in names:
        fn = REGISTRY[name].fn
        res: dict[str, list[float]] = {"smj": [], "shj": []}
        for arm, on in (("smj", False), ("shj", True)):
            set_shj(on)
            fn(spark, sf_dir).count()  # warm-up per arm
            spark.catalog.clearCache()
        for i in range(runs):
            for arm, on in (("smj", False), ("shj", True)):
                set_shj(on)
                t0 = time.time()
                fn(spark, sf_dir).count()
                res[arm].append(time.time() - t0)
                spark.catalog.clearCache()
        print(
            f"{name}\tsmj_min={min(res['smj']):.3f} {[round(s,2) for s in res['smj']]}"
            f"\tshj_min={min(res['shj']):.3f} {[round(s,2) for s in res['shj']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
