"""MLlib feature-engineering variants (north star approach:
"DataFrame transformations + MLlib feature engineering").

The engine's native operators hand-roll their kernels where that wins
(exact oracles, JVM codegen, batched numpy). These queries expose the
SAME capabilities through Spark MLlib's feature-engineering estimators
— the stock path a Spark user reaches for first — and pin them against
the native/exact implementations in tests:

- ``mllib_tfidf_features``  — Tokenizer → StopWordsRemover →
  HashingTF → IDF (vs native ``tfidf_top_terms``)
- ``mllib_minhash_pairs``   — shingles → HashingTF(binary) →
  MinHashLSH.approxSimilarityJoin (vs exact ``dedup_ngram_jaccard``)
- ``mllib_brp_ann_topk``    — unit-normalized embeddings →
  BucketedRandomProjectionLSH top-k (vs exact ``ann_cosine_topk``)

All three are rows-only driver checks (hash-table/seed specific);
recall against the exact counterparts is pinned in
``tests/test_mllib_fe.py``.

Scale notes (100 TB): HashingTF is stateless (fixed 2^18 dim — no
vocabulary broadcast); IDF's fit is one treeAggregate over document
frequencies; ``approxSimilarityJoin`` is the banded-bucket join —
O(n·tables + candidates) shuffle exactly like the native LSH paths,
never O(n²). Seeds are fixed so results are deterministic across
runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .dedup import _SHINGLE_K  # same shingles as dedup_ngram_jaccard
from .shingles import shingles_col, tokens_attr
from .similarity import _N_QUERIES, _TOPK  # same query set / k as ann_cosine_topk

_HASH_DIM = 1 << 18
_JACCARD_THRESHOLD = 0.5


@register("mllib_tfidf_features", tags=("text", "mllib"))
def mllib_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via the stock MLlib chain. Output: per-doc vector stats
    (non-zero count, L1/L2 norms, max weight) — stable scalars rather
    than the hash-indexed vector itself."""
    from pyspark.ml.feature import IDF, HashingTF, StopWordsRemover, Tokenizer
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text_lc")
    )
    toks = Tokenizer(inputCol="text_lc", outputCol="raw_tokens").transform(docs)
    kept = StopWordsRemover(inputCol="raw_tokens", outputCol="tokens").transform(toks)
    tf = HashingTF(
        inputCol="tokens", outputCol="tf", numFeatures=_HASH_DIM
    ).transform(kept)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    vecs = idf_model.transform(tf).select(
        "doc_id", vector_to_array("tfidf").alias("v")
    )
    nz = F.filter("v", lambda x: x != 0.0)
    return vecs.select(
        "doc_id",
        F.size(nz).cast("bigint").alias("n_terms"),
        F.round(F.aggregate(nz, F.lit(0.0), lambda a, x: a + x), 6).alias("l1"),
        F.round(
            F.sqrt(F.aggregate(nz, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("l2"),
        F.round(F.array_max("v"), 6).alias("max_w"),
    ).orderBy("doc_id")


@register("mllib_minhash_pairs", tags=("dedup", "lsh", "mllib"))
def mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH over binary shingle
    vectors — the stock equivalent of ``dedup_minhash_lsh``.
    ``approxSimilarityJoin``'s distance is exact Jaccard distance on
    the candidate pairs, so ``1 − dist`` is the exact similarity (the
    approximation is only in candidate recall)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    toked, toks = tokens_attr(docs)
    # token-count pre-filter, NOT size(shingles) > 0: a shingle-
    # column filter pushes to the scan with the HOF chain inlined
    # (r11 forensics, SCALING.md)
    sh = toked.filter(F.size(toks) >= _SHINGLE_K).select(
        "doc_id",
        shingles_col(toks, _SHINGLE_K).alias("shingles"),
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="v", numFeatures=_HASH_DIM, binary=True
    ).transform(sh)
    # Persist barrier: approxSimilarityJoin's internals explode the
    # hash attribute, and InferFiltersFromGenerate's inferred filters
    # push through MLlib's projections with the whole shingle+TF+LSH
    # chain inlined into the scan filter (shingles.py second
    # contract). An InMemoryRelation is a hard pushdown boundary —
    # and the self-join reads tf twice anyway.
    from ..caching import hold

    tf = hold("mllib_minhash_tf", tf.select("doc_id", "v"), eager=True)
    model = MinHashLSH(inputCol="v", outputCol="bands", numHashTables=16, seed=1217).fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, 1.0 - _JACCARD_THRESHOLD, distCol="d")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("d"), 6).alias("jaccard"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .orderBy("doc_a", "doc_b")
    )


@register("mllib_brp_ann_topk", tags=("similarity", "lsh", "mllib"))
def mllib_brp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via BucketedRandomProjectionLSH on unit-normalized
    embeddings — the stock equivalent of ``ann_lsh_topk``. On unit
    vectors euclidean distance is monotone in cosine
    (d² = 2 − 2·cos), so the reported score is exact cosine and only
    candidate recall is approximate."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from .similarity import load_embeddings

    emb = load_embeddings(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = emb.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double") / norm)
        ).alias("v"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="buckets", bucketLength=0.5, numHashTables=4, seed=1217
    ).fit(unit)
    q = unit.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # generous radius: d ≤ 1.2 ⟺ cos ≥ 0.28 — candidates beyond that
    # aren't plausible top-k on this data
    joined = model.approxSimilarityJoin(
        q.withColumnRenamed("qv", "v"), unit, 1.2, distCol="d"
    )
    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.round(1.0 - F.col("d") * F.col("d") / 2.0, 6).alias("score"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )
