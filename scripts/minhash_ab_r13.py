"""Interleaved A/B for the r13 MinHash-LSH collapse restructure
(VERDICT r12 task 3): old shape = eager-persisted signature cache +
groupBy(skey) collapse + sigs⋈multi member join-back; new shape (the
registered one) = ONE skey exchange with rep_id/group_size as window
functions, no persist barriers.

Both arms run the registered report form (pairs + orderBy) on the
same session, arms alternated run-for-run, scheduler probe beside
every sample. Pair-set parity asserted first.

Run (quiet host): PYTHONPATH=. python scripts/minhash_ab_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asr_training_data_pipeline_spark.caching import hold  # noqa: E402
from asr_training_data_pipeline_spark.operators import dedup  # noqa: E402
from asr_training_data_pipeline_spark.operators.shingles import (  # noqa: E402
    shingles_col,
    tokens_attr,
)
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from asr_training_data_pipeline_spark.sources.tables import load_table  # noqa: E402


def minhash_old(spark, sf_dir):
    """Pre-r13 shape, verbatim from the r12 tree."""
    docs = load_table(spark, sf_dir, "documents")
    toked, toks = tokens_attr(dedup.spread_for_kernel(docs))
    hashed = toked.filter(F.size(toks) >= dedup._SHINGLE_K).withColumn(
        dedup._MH_HASHES,
        F.transform(
            shingles_col(toks, dedup._SHINGLE_K),
            lambda sh: F.pmod(F.xxhash64(sh), F.lit(dedup._MERSENNE)).cast("long"),
        ),
    )
    sigs = hold(
        "ab_minhash_sigs",
        hashed.select(
            "doc_id",
            dedup.minhash_sig_from_hashes(F.col(dedup._MH_HASHES)).alias("sig"),
        ).withColumn("skey", F.md5(F.concat_ws(",", "sig"))),
        eager=True,
    )
    groups = hold(
        "ab_minhash_groups",
        sigs.groupBy("skey").agg(
            F.min("doc_id").alias("rep_id"),
            F.count("*").cast("bigint").alias("group_size"),
            F.first("sig").alias("sig"),
        ),
    )
    reps = groups.select(F.col("rep_id").alias("doc_id"), "sig")
    multi = groups.filter(F.col("group_size") > 1).select(
        "skey", "rep_id", "group_size"
    )
    multi_members = (
        sigs.select("doc_id", "skey")
        .join(multi, "skey")
        .select("doc_id", "rep_id", "group_size")
    )
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(dedup._N_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(
                            F.col("sig"),
                            b * dedup._ROWS_PER_BAND + 1,
                            dedup._ROWS_PER_BAND,
                        ),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("band_key"),
        ),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("x.sig"), F.col("y.sig"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / dedup._N_HASHES
    )
    rep_pairs = (
        dedup._band_pairs(reps, band_structs, "sig", persist_mode="none")
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= dedup._EST_THRESHOLD)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return dedup.expand_rep_pairs(
        rep_pairs, multi_members, "est_jaccard", multi_members, 1.0
    ).orderBy("doc_a", "doc_b")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="minhash_ab_r13")
    spark.range(1000).selectExpr("sum(id)").collect()

    arms = {
        "old(persist+groupBy+joinback)": lambda: minhash_old(spark, sf_dir),
        "new(window-over-one-exchange)": lambda: dedup.dedup_minhash_lsh(
            spark, sf_dir
        ),
    }
    # pair-set parity + warm-up
    sets = {}
    for label, mk in arms.items():
        sets[label] = {
            (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in mk().collect()
        }
        spark.catalog.clearCache()
    a, b = sets.values()
    assert a == b, f"pair sets differ: {len(a)} vs {len(b)}"
    print(f"pair parity: {len(a)} pairs identical", flush=True)

    def probe() -> float:
        t0 = time.time()
        spark.range(10).count()
        return (time.time() - t0) * 1000.0

    walls = {k: [] for k in arms}
    probes = {k: [] for k in arms}
    for _ in range(rounds):
        for label, mk in arms.items():
            spark.catalog.clearCache()
            t0 = time.time()
            mk().count()
            walls[label].append(time.time() - t0)
            probes[label].append(probe())
    for label in arms:
        print(
            f"{label}\twall_min={min(walls[label]):.2f}\t"
            f"walls={[round(x, 2) for x in walls[label]]}\t"
            f"probes_ms={[round(p) for p in probes[label]]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
