"""min-of-N timing of asr_pipeline_clips (bench protocol: warm-up then
timed samples, cache cleared between runs)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="time_clips")
    from asr_training_data_pipeline_spark.plans.pipeline import asr_pipeline_clips_q

    asr_pipeline_clips_q(spark, sf_dir).count()
    spark.catalog.clearCache()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        asr_pipeline_clips_q(spark, sf_dir).count()
        samples.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
    print(f"samples={samples} min={min(samples)}")
    spark.stop()


if __name__ == "__main__":
    main()
