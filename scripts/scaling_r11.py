"""Round-11 scaling rows (VERDICT r10 tasks 3 + 7):

* MinHash signature kernel A/B at 500k docs — the one Arrow-Python
  roundtrip in the bench hot path (dedup_minhash_lsh) vs two JVM-only
  forms, both honoring the r10 attribute-contract lesson (the hash
  array is bound to a real column BEFORE any HOF lambda references
  it):
    - python/numpy  : the production kernel (vectorized reduceat)
    - jvm-hof       : array(array_min(transform(h, (h*a+b)%p)) x 64)
                      — interpreted HOF path, zero Python workers
    - jvm-agg       : explode(h) -> groupBy(doc_id).agg(min x 64)
                      — whole-stage-codegen aggregates, one extra
                      doc_id exchange of 64x8B rows
  Parity between all three is asserted at sf0.001 before timing.
* dedup_canonical on an engineered MANY-SMALL-CLUSTERS 500k-doc
  fixture (40% of docs in exact 2-copy clusters) — the regime where
  the manifest is O(corpus) and the pre-r11 forced broadcast would
  have OOMed; records the join strategy AQE actually picks now that
  the hint is gone (task 2's plan lock, exercised at scale).

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r11.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from pyspark.sql import functions as F  # noqa: E402

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _MERSENNE,
    _MINHASH_PARAMS,
    _SHINGLE_K,
    minhash_signature_col,
)
from asr_training_data_pipeline_spark.operators.shingles import (  # noqa: E402
    shingles_col,
    tokens_attr,
)
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

BASE = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.001"
PAIRY = "/tmp/sfpairy_r11"


def build_pairy_fixture() -> None:
    """500k docs, 40% in EXACT 2-copy clusters (100k pairs), the rest
    unique — the many-small-clusters regime where dedup_canonical's
    manifest is corpus-proportional (200k rows), NOT sketch-sized.

    Texts are GROUP-SYNTHETIC (20 copies of one group-unique token),
    not perturbed base texts: a perturbed copy shares ~all shingles
    with every other copy of the same base doc, which silently turns
    the fixture into the dense-clique regime (one 100-member cluster
    per base doc — the r6 BIG fixture). Group-unique tokens share NO
    shingles across groups, so the ONLY duplication is the engineered
    exact pair."""
    os.makedirs(PAIRY, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  WITH b AS (SELECT * FROM '{BASE}/documents.parquet'),
       c AS (SELECT unnest(range(100)) AS i)
  SELECT b.doc_id + c.i * 1000000 AS doc_id,
         -- copies 0-39 pair up (i//2): 40 docs in 20 exact 2-copy
         -- clusters; copies 40-99 get singleton groups
         repeat('t' || (b.doc_id * 1000 +
                        CASE WHEN c.i < 40 THEN c.i // 2
                             ELSE 500 + c.i END) || ' ', 20) AS text,
         b.lang, b.source, b.n_chars
  FROM b, c
) TO '{PAIRY}/documents.parquet' (FORMAT PARQUET)
""")
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{PAIRY}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)


# ---------------------------------------------------------------------
# candidate JVM signature kernels (attribute contract honored: the
# hash array is projected to a real column before any lambda reads it)
# ---------------------------------------------------------------------

_H = "__mh_hashes"


def _hashed(spark, sf_dir):
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    toked, toks = tokens_attr(docs.repartition(n_part))
    # token-count pre-filter per shingles.py's r11 second contract —
    # the original A/B variants filtered sig/hash columns post-hoc,
    # which pushdown turned into a scan filter with the whole HOF
    # chain inlined (SCALING.md r11 forensics)
    return toked.filter(F.size(toks) >= _SHINGLE_K).withColumn(
        _H,
        F.transform(
            shingles_col(toks, _SHINGLE_K),
            lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)).cast("long"),
        ),
    )


def sig_python(spark, sf_dir):
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    toked, toks = tokens_attr(docs.repartition(n_part))
    return toked.filter(F.size(toks) >= _SHINGLE_K).select(
        "doc_id",
        minhash_signature_col(shingles_col(toks, _SHINGLE_K)).alias("sig"),
    )


def sig_jvm_hof(spark, sf_dir):
    h = F.col(_H)

    def slot(a, b):  # PySpark reads lambda arity: keep it unary
        return F.array_min(
            F.transform(h, lambda x: (x * F.lit(a) + F.lit(b)) % _MERSENNE)
        )

    slots = [slot(a, b) for a, b in _MINHASH_PARAMS]
    return _hashed(spark, sf_dir).select(
        "doc_id",
        F.when(F.size(h) >= 1, F.array(*slots)).alias("sig"),
    )


def sig_jvm_agg(spark, sf_dir):
    h = F.col("h")
    exploded = _hashed(spark, sf_dir).select(
        "doc_id", F.explode(_H).alias("h")
    )
    slots = [
        F.min((h * F.lit(a) + F.lit(b)) % _MERSENNE).alias(f"s{k}")
        for k, (a, b) in enumerate(_MINHASH_PARAMS)
    ]
    return (
        exploded.groupBy("doc_id")
        .agg(*slots)
        .select(
            "doc_id",
            F.array(*[F.col(f"s{k}") for k in range(len(slots))]).alias("sig"),
        )
    )


VARIANTS = {
    "python/numpy": sig_python,
    "jvm-hof": sig_jvm_hof,
    "jvm-agg": sig_jvm_agg,
}


def fold(df):
    """Materialize the full signature frame without driver collect:
    fold every slot into one checksum row."""
    return df.select(
        # pmod keeps the 500k-row sum far below 2^63 (ANSI overflow)
        F.sum(
            F.pmod(F.xxhash64(F.concat_ws(",", "sig")), F.lit(1_000_000_007))
        ).alias("chk"),
        F.count("*").alias("n"),
    ).collect()[0]


def timed(spark, label, thunk, samples=2):
    walls, out = [], None
    w0 = shuffle_totals(spark)
    for _ in range(samples):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = thunk()
        walls.append(time.perf_counter() - t0)
    w1 = shuffle_totals(spark)
    print(
        f"| {label} | {min(walls):.1f} "
        f"(samples {[round(w, 1) for w in walls]}) "
        f"| {(w1 - w0) / (samples * 1e6):.2f} MB/run | {out} |"
    )
    sys.stdout.flush()
    return min(walls)


def main() -> None:
    build_fixture()
    build_pairy_fixture()
    spark = get_spark(
        app_name="scaling_r11",
        extra_conf={
            "spark.ui.enabled": "true",  # shuffle_totals reads the REST API
            "spark.ui.retainedStages": "100000",
        },
    )

    # ---- parity first: all three kernels must emit identical sigs
    frames = {
        name: {r["doc_id"]: list(r["sig"]) for r in fn(spark, SMALL).collect()}
        for name, fn in VARIANTS.items()
    }
    base = frames["python/numpy"]
    for name, got in frames.items():
        assert got == base, f"{name} diverges from the numpy kernel"
    print(f"# parity OK: {len(base)} docs, 3 kernels identical at sf0.001")

    print("| case | wall (s, min of N) | shuffle write | result |")
    print("|---|---|---|---|")
    for name, fn in VARIANTS.items():
        timed(
            spark,
            f"minhash signatures {name} | 500k docs",
            lambda fn=fn: fold(fn(spark, BIG)),
            samples=2,
        )

    # ---- many-small-clusters canonical (task 2 at scale)
    def canon():
        df = REGISTRY["dedup_canonical"].fn(spark, PAIRY)
        n = df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        fb = "forced-bcast" if "ResolvedHint" in plan else ""
        joins = [
            j
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
            if j in plan
        ]
        return f"{n} rows; joins={joins} {fb}"

    timed(
        spark,
        "dedup_canonical | 500k docs, 40% in 2-copy clusters",
        canon,
        samples=1,
    )
    spark.stop()


if __name__ == "__main__":
    main()
