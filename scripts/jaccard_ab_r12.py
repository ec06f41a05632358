"""Interleaved A/B: sizes-join vs carried-n exact-Jaccard pair core
(r12). Both arms build the FULL dedup_ngram_jaccard shape (exact-text
collapse -> pair core -> expand -> orderBy); arms alternate run-for-run
on one session with a scheduler probe beside every sample, so host
weather hits both arms equally (house A/B method).

Run: python scripts/jaccard_ab_r12.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.operators import dedup
from asr_training_data_pipeline_spark.operators.shingles import (
    shingles_col,
    tokens_attr,
)
from asr_training_data_pipeline_spark.session import get_spark
from asr_training_data_pipeline_spark.sources.tables import load_table


def pairs_old(docs: DataFrame) -> DataFrame:
    """The pre-r12 core: separate sizes aggregation, joined back to
    the pair set twice (4 shingle-chain evaluations total)."""
    toked, toks = tokens_attr(docs)
    sh = toked.select(
        "doc_id", F.explode(shingles_col(toks, dedup._SHINGLE_K)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
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
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("inter")
    )
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= dedup._JACCARD_THRESHOLD)
    )


def full_query(spark, sf_dir, core) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reps, multi_members = dedup.collapse_exact_text(docs)
    rep_pairs = core(reps.select("doc_id", "text"))
    conn_reps = reps.filter(
        F.size(F.split(F.col("text"), " ")) >= dedup._SHINGLE_K
    ).select(F.col("doc_id").alias("rep_id"))
    intra = multi_members.join(conn_reps, "rep_id", "left_semi")
    return dedup.expand_rep_pairs(
        rep_pairs, multi_members, "jaccard", intra, 1.0
    ).orderBy("doc_a", "doc_b")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="jaccard_ab_r12")
    spark.range(1000).selectExpr("sum(id)").collect()

    def probe() -> float:
        t0 = time.time()
        spark.range(10).count()
        return (time.time() - t0) * 1000.0

    arms = {"old(sizes-joins)": pairs_old, "new(carried-n)": dedup._ngram_jaccard_pairs}
    # untimed warm-up per arm (codegen/JIT)
    for label, core in arms.items():
        full_query(spark, sf_dir, core).count()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {k: [] for k in arms}
    probes: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(rounds):
        for label, core in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{label}:{r}")
            t0 = time.time()
            n = full_query(spark, sf_dir, core).count()
            samples[label].append(time.time() - t0)
            probes[label].append(probe())
    for label in arms:
        s, p = samples[label], probes[label]
        print(
            f"{label}\tmin={min(s):.3f}\trows={n}\t"
            f"samples={[round(x, 2) for x in s]}\tprobes={[round(x) for x in p]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
