"""Sub-stage timing split for the expensive headline queries (r12).

Materializes each intermediate frame with the noop sink (guide §1.4)
on a fresh-cache session, in dependency order, so each line reads as
"cumulative cost up to this stage". Labeled via setJobDescription.

Run: python scripts/stage_split_r12.py [sf_dir] [pipeline|jaccard|minhash]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.session import get_spark


def timed(spark, label, df, runs=3):
    spark.sparkContext.setJobDescription(f"r12-split:{label}")
    df.write.format("noop").mode("overwrite").save()  # warm-up
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    print(f"{label}\tmin={min(samples):.3f}\t{[round(s, 2) for s in samples]}", flush=True)


def split_pipeline(spark, sf_dir):
    from asr_training_data_pipeline_spark.operators.alignment import lcs_runs_fused
    from asr_training_data_pipeline_spark.plans import pipeline as pl
    from asr_training_data_pipeline_spark.sources import fixtures

    arrays = fixtures.doc_word_arrays(spark, sf_dir)
    timed(spark, "1.arrays(narrow scan+derive)", arrays)
    runs = lcs_runs_fused(arrays, min_run=pl.P.min_run)
    timed(spark, "2.runs(+LCS python)", runs)
    # downstream of runs, uncached full pipeline pieces
    stages = pl.full_pipeline(spark, sf_dir, persist=False)
    timed(spark, "3.groups(+bridge window)", stages["groups"])
    timed(spark, "4.clips(+assemble arrays)", stages["clips"])
    timed(spark, "5.exported(+validator python)", stages["exported"])
    # and the registered query itself (with persist)
    from asr_training_data_pipeline_spark.api import REGISTRY

    timed(spark, "6.asr_pipeline_clips(full,persist)", REGISTRY["asr_pipeline_clips"].fn(spark, sf_dir))


def split_jaccard(spark, sf_dir):
    from asr_training_data_pipeline_spark.operators import dedup
    from asr_training_data_pipeline_spark.operators.shingles import shingles_col, tokens_attr
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    reps, multi_members = dedup.collapse_exact_text(docs)
    timed(spark, "1.collapse(reps)", reps)
    toked, toks = tokens_attr(reps.select("doc_id", "text"))
    sh = toked.select(
        "doc_id", F.explode(shingles_col(toks, dedup._SHINGLE_K)).alias("shingle")
    )
    timed(spark, "2.shingle explode", sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    timed(spark, "3.sizes groupBy", sizes)
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    timed(spark, "4.selfjoin+pairagg", shared)
    pairs = dedup._ngram_jaccard_pairs(reps.select("doc_id", "text"))
    timed(spark, "5.pairs(+sizes joins)", pairs)
    from asr_training_data_pipeline_spark.api import REGISTRY

    timed(spark, "6.dedup_ngram_jaccard(full)", REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir))


def split_minhash(spark, sf_dir):
    from asr_training_data_pipeline_spark.operators import dedup
    from asr_training_data_pipeline_spark.operators.shingles import shingles_col, tokens_attr
    from asr_training_data_pipeline_spark.partitioning import spread_for_kernel
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toked, toks = tokens_attr(spread_for_kernel(docs))
    hashed = toked.filter(F.size(toks) >= dedup._SHINGLE_K).withColumn(
        dedup._MH_HASHES,
        F.transform(
            shingles_col(toks, dedup._SHINGLE_K),
            lambda sh: F.pmod(F.xxhash64(sh), F.lit(dedup._MERSENNE)).cast("long"),
        ),
    )
    timed(spark, "1.hash arrays", hashed.select("doc_id", dedup._MH_HASHES))
    sigs = hashed.select(
        "doc_id", dedup.minhash_sig_from_hashes(F.col(dedup._MH_HASHES)).alias("sig")
    )
    timed(spark, "2.signatures(64 HOF mins)", sigs)
    from asr_training_data_pipeline_spark.api import REGISTRY

    timed(spark, "3.dedup_minhash_lsh(full)", REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "pipeline"
    spark = get_spark(app_name="stage_split_r12")
    spark.range(1000).selectExpr("sum(id)").collect()
    {"pipeline": split_pipeline, "jaccard": split_jaccard, "minhash": split_minhash}[
        which
    ](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
