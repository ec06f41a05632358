"""Scale evidence for the r13 carried-n WINDOW form on the
df-capped pair cores (VERDICT r12 task 2 / OPTIMIZATION_r13):
dedup_ngram_jaccard_stopshingle and dedup_tf_cosine previously
aggregated per-doc post-cap sizes/norms separately and joined the
CANDIDATE PAIR SET back against them twice; the r13 form attaches
them to the posting frame via one doc_id-keyed window and lifts them
into the pair-groupBy keys.

The tradeoff is geometric — one extra index-sized exchange (plus the
join re-exchange) against two candidate-pair-sized exchanges — so the
fixture is the PAIR-HEAVY regime the verdict asked for: the sf0.1
corpus x 10 perturbed variants (copy-unique prefix token), giving
every original a 10-variant near-dup clique. Candidate pairs (the
pre-threshold groupBy output the old form re-shuffled twice) number
in the millions; the posting index is ~10x smaller.

Both arms run the FULL registered shape (explode -> df-cap -> self-
join -> threshold -> orderBy), interleaved run-for-run on one session,
in BOTH join regimes (sizes joins broadcastable / broadcasts forced
off — the 100 TB shape, where a per-doc sizes table is far beyond any
broadcast threshold).

Run (quiet host): PYTHONPATH=. python scripts/stopshingle_scale_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import duckdb

sys.path.insert(0, ".")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from asr_training_data_pipeline_spark.operators import dedup  # noqa: E402
from asr_training_data_pipeline_spark.operators.shingles import (  # noqa: E402
    shingles_col,
    tokens_attr,
)
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from asr_training_data_pipeline_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
FIX = "/tmp/sfstop_r13"

# Two corpus geometries (the decision variable is |distinct candidate
# pairs| vs |posting index|):
#  - "indexheavy": full-length docs x 10 variants (the r12 jaccard
#    fixture shape) — index rows ~ 10x distinct pairs;
#  - "pairheavy": docs truncated to 18 tokens x 30 variants (30 <=
#    the df cap 32, so clique shingles SURVIVE the cap) — per
#    original: C(30,2)=435 distinct pairs vs 30x14=420 index rows,
#    i.e. |pairs| >~ |index|, the verdict's target regime.
FIXTURES = {
    "indexheavy": (10, None),
    "pairheavy": (30, 18),
}


def build_fixture(variants: int, trunc_tokens: int | None) -> None:
    os.makedirs(FIX, exist_ok=True)
    text = (
        "array_to_string((string_split(d.text, ' '))"
        f"[1:{trunc_tokens}], ' ')"
        if trunc_tokens
        else "d.text"
    )
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT d.doc_id + c.i * 1000000 AS doc_id,
         'v' || c.i || ' ' || {text} AS text,
         d.lang, d.source, d.n_chars
  FROM '{BASE}/documents.parquet' d,
       (SELECT unnest(range({variants})) AS i) c
) TO '{FIX}/documents.parquet' (FORMAT PARQUET, OVERWRITE_OR_IGNORE)
""")


def stopshingle_old(spark, sf_dir):
    """Pre-r13 stopshingle: separate sizes agg + two pair join-backs."""
    docs = load_table(spark, sf_dir, "documents")
    toked, toks = tokens_attr(dedup.spread_for_kernel(docs))
    sh = toked.select(
        "doc_id", F.explode(shingles_col(toks, dedup._SHINGLE_K)).alias("shingle")
    )
    kept = sh.withColumn(
        "dfq", F.count("*").over(W.partitionBy("shingle"))
    ).filter(F.col("dfq") <= dedup._STOP_DF)
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = kept.alias("a"), kept.alias("b")
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
        .orderBy("doc_a", "doc_b")
    )


def tf_cosine_old(spark, sf_dir):
    """Pre-r13 tf-cosine: separate norms agg + two pair join-backs."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    grams = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", t.alias("t"))
        .filter(F.size("t") >= dedup._TFC_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (dedup._TFC_K - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, dedup._TFC_K)),
                )
            ).alias("w"),
        )
    )
    tf = grams.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("tf"))
    kept = tf.withColumn(
        "dfq", F.count("*").over(W.partitionBy("w"))
    ).filter(F.col("dfq") <= dedup._TFC_STOP_DF)
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    a, b = kept.alias("a"), kept.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("norm2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("norm2_b"))
    cos2 = F.expr(
        "cast(cast(dot as decimal(38,0)) * dot * 1000000"
        " div (cast(norm2_a as decimal(38,0)) * norm2_b) as bigint)"
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cos2_ppm", cos2)
        .filter(F.col("cos2_ppm") >= dedup._TFC_MIN_COS2_PPM)
        .select("doc_a", "doc_b", "dot", "norm2_a", "norm2_b", "cos2_ppm")
        .orderBy("doc_a", "doc_b")
    )


def shuffle_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as f:
        stages = json.load(f)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "pairheavy"
    build_fixture(*FIXTURES[which])
    spark = get_spark(
        app_name="stopshingle_scale_r13",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    suites = {
        "stopshingle": {
            "old(sizes-joins)": lambda: stopshingle_old(spark, FIX),
            "new(window-n)": lambda: dedup.dedup_ngram_jaccard_stopshingle(spark, FIX),
        },
        "tf_cosine": {
            "old(norms-joins)": lambda: tf_cosine_old(spark, FIX),
            "new(window-n2)": lambda: dedup.dedup_tf_cosine(spark, FIX),
        },
    }
    for regime, bc in (("broadcast-on", None), ("broadcast-off", "-1")):
        if bc is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
        for qname, arms in suites.items():
            counts = {}
            for label, mk in arms.items():  # warm-up + row-count parity
                counts[label] = mk().count()
            assert len(set(counts.values())) == 1, counts
            print(f"[{which}|{regime}] {qname} row parity: {counts}", flush=True)
            walls: dict[str, list[float]] = {k: [] for k in arms}
            rw: dict[str, list[tuple[int, int]]] = {k: [] for k in arms}
            for _ in range(3):
                for label, mk in arms.items():
                    spark.catalog.clearCache()
                    r0, w0 = shuffle_totals(spark)
                    t0 = time.time()
                    mk().count()
                    walls[label].append(time.time() - t0)
                    r1, w1 = shuffle_totals(spark)
                    rw[label].append((r1 - r0, w1 - w0))
            for label in arms:
                mb = [(round(a / 1e6, 1), round(b / 1e6, 1)) for a, b in rw[label]]
                print(
                    f"[{which}|{regime}] {qname} {label}\twall_min={min(walls[label]):.2f}\t"
                    f"walls={[round(x, 2) for x in walls[label]]}\t"
                    f"shuffle(read,write)MB per run={mb}",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
