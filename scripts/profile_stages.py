"""Stage-level profile of asr_pipeline_clips: runs the registered
query end-to-end, then dumps the top stages by executor run time from
the Spark status API. Run: python scripts/profile_stages.py"""

from __future__ import annotations

import sys
import time
import urllib.request
import json

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="profile_stages", extra_conf={"spark.ui.enabled": "true"}
    )
    from asr_training_data_pipeline_spark.plans.pipeline import asr_pipeline_clips_q

    # warm-up (workers, codegen)
    asr_pipeline_clips_q(spark, sf_dir).count()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    n = asr_pipeline_clips_q(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    print(f"end-to-end: {n} rows in {wall:.2f} s")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)
    # keep only stages submitted after t0 (the timed run)
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"{'stage':>6} {'runTime_ms':>10} {'cpuTime_ms':>10} {'tasks':>5}  name")
    for s in stages[:18]:
        cpu = (s.get("executorCpuTime") or 0) // 1_000_000
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0):>10} {cpu:>10} "
            f"{s.get('numCompleteTasks'):>5}  {s['name'][:90]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
