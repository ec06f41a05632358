"""Scale evidence for the r12 carried-n Jaccard core (OPTIMIZATION_r12
change #3): the removed work is TWO pair-set-wide join exchanges (plus
two extra shingle passes), which sf0.1's 255-pair output cannot show.

Fixture: 50k docs = the sf0.1 corpus x 10 copies, EVERY copy perturbed
with a copy-unique prefix token, so there is no exact-dup collapse
shrink and every original yields a 10-variant near-dup clique
(j ~ 0.85 between variants) -> ~225k output pairs, ~27M candidate
rows through the inverted index: the pair-set-heavy regime where the
sizes join-backs cost real shuffle.

Both arms run the FULL registered shape (collapse -> core -> expand ->
orderBy), interleaved run-for-run on one session; wall min-of-N plus
per-run shuffle read/write deltas from the stages REST API.

Run (quiet host): PYTHONPATH=. python scripts/jaccard_scale_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import duckdb

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asr_training_data_pipeline_spark.operators import dedup  # noqa: E402
from asr_training_data_pipeline_spark.operators.shingles import (  # noqa: E402
    shingles_col,
    tokens_attr,
)
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from asr_training_data_pipeline_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
FIX = "/tmp/sfjacc_r12"


def build_fixture() -> None:
    os.makedirs(FIX, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT d.doc_id + c.i * 1000000 AS doc_id,
         'v' || c.i || ' ' || d.text AS text,
         d.lang, d.source, d.n_chars
  FROM '{BASE}/documents.parquet' d,
       (SELECT unnest(range(10)) AS i) c
) TO '{FIX}/documents.parquet' (FORMAT PARQUET)
""")


def pairs_old(docs):
    """Pre-r12 core: separate sizes agg + two pair-set join-backs."""
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


def full_query(spark, core):
    docs = load_table(spark, FIX, "documents")
    reps, multi_members = dedup.collapse_exact_text(docs)
    rep_pairs = core(reps.select("doc_id", "text"))
    conn_reps = reps.filter(
        F.size(F.split(F.col("text"), " ")) >= dedup._SHINGLE_K
    ).select(F.col("doc_id").alias("rep_id"))
    intra = multi_members.join(conn_reps, "rep_id", "left_semi")
    return dedup.expand_rep_pairs(
        rep_pairs, multi_members, "jaccard", intra, 1.0
    ).orderBy("doc_a", "doc_b")


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
    build_fixture()
    spark = get_spark(
        app_name="jaccard_scale_r12",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    arms = {"old(sizes-joins)": pairs_old, "new(carried-n)": dedup._ngram_jaccard_pairs}
    counts = {}
    for label, core in arms.items():  # warm-up + row-count parity
        counts[label] = full_query(spark, core).count()
        spark.catalog.clearCache()
    print("row parity:", counts, flush=True)

    walls: dict[str, list[float]] = {k: [] for k in arms}
    rw: dict[str, list[tuple[int, int]]] = {k: [] for k in arms}
    for r in range(3):
        for label, core in arms.items():
            spark.catalog.clearCache()
            r0, w0 = shuffle_totals(spark)
            t0 = time.time()
            full_query(spark, core).count()
            walls[label].append(time.time() - t0)
            r1, w1 = shuffle_totals(spark)
            rw[label].append((r1 - r0, w1 - w0))
    for label in arms:
        mb = [(round(a / 1e6, 1), round(b / 1e6, 1)) for a, b in rw[label]]
        print(
            f"{label}\twall_min={min(walls[label]):.2f}\t"
            f"walls={[round(x, 2) for x in walls[label]]}\t"
            f"shuffle(read,write)MB per run={mb}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
