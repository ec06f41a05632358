"""Profile asr_pipeline_clips stage-by-stage at sf0.1.

Times each materialization point of plans.pipeline.full_pipeline
separately so the expensive stage is identified by measurement, not
guesswork. Not part of the test suite; run manually:

    python scripts/profile_clips.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:7.2f} s   ({out})")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile_clips")
    from pyspark import StorageLevel

    from asr_training_data_pipeline_spark.operators.alignment import lcs_runs_fused
    from asr_training_data_pipeline_spark.plans import pipeline as pl
    from asr_training_data_pipeline_spark.sources import fixtures

    p = pl.P

    arrays = fixtures.doc_word_arrays(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t("doc_word_arrays cache fill", lambda: arrays.count())
    pair_words = arrays.select("pair_id", "norms", "starts", "ends", "texts", "confs")

    runs = lcs_runs_fused(arrays, min_run=p.min_run).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t("runs cache fill (LCS align)", lambda: runs.count())

    groups = pl.bridged_groups(runs, p)
    clips = pl.assemble_clips_arrays(groups, pair_words, p)
    base = clips.filter("clip_len_ms > 0").persist(StorageLevel.MEMORY_AND_DISK)
    t("assemble_clips_arrays fill", lambda: base.count())

    validated = pl.validated_clips(spark, base, p).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t("validator consensus fill", lambda: validated.count())

    kept = validated.filter("e_ms - s_ms >= 1500")
    t("final filter+orderBy+collect", lambda: len(kept.orderBy("pair_id", "group_id").collect()))

    # End-to-end, as registered (fresh lineage, own persists)
    spark.catalog.clearCache()
    from asr_training_data_pipeline_spark.plans.pipeline import asr_pipeline_clips_q

    t("end-to-end asr_pipeline_clips", lambda: len(asr_pipeline_clips_q(spark, sf_dir).collect()))
    spark.catalog.clearCache()
    t("end-to-end again (warm JVM)", lambda: len(asr_pipeline_clips_q(spark, sf_dir).collect()))
    spark.stop()


if __name__ == "__main__":
    main()
