"""Dedup-family semantics beyond the oracle: recall of the
approximate paths (MinHash-LSH, SimHash) against exact ground truth."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.dedup import (
    minhash_signature_col,
    simhash_col,
)
from asr_training_data_pipeline_spark.operators.shingles import shingles_col


def _pairs(df: pd.DataFrame, a: str = "doc_a", b: str = "doc_b") -> set[tuple]:
    return set(zip(df[a], df[b]))


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """LSH candidates must recover (almost) all exact-Jaccard≥0.8
    pairs; at 16 bands × 4 rows the detection prob at j=0.8 is
    1-(1-0.8^4)^16 ≈ 0.9997, so demand full recall here."""
    exact = _pairs(REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas())
    approx = _pairs(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).toPandas())
    assert exact, "fixture should contain near-dup pairs"
    missed = exact - approx
    assert not missed, f"LSH missed exact pairs: {missed}"


def test_minhash_estimate_tracks_exact(spark, sf_dir):
    exact = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    approx = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).toPandas()
    merged = exact.merge(approx, on=["doc_a", "doc_b"])
    assert not merged.empty
    err = (merged.jaccard - merged.est_jaccard).abs()
    assert err.max() < 0.25, f"minhash estimate off by {err.max()}"


def test_simhash_separates_near_dups_from_random(spark, sf_dir):
    """SimHash is a statistical fingerprint: near-dup pairs (exact
    jaccard≥0.8) must sit far below random pairs in hamming distance
    on average (individual pairs can flip many bits when per-bit sums
    hover near zero — tiny-vocab word soup does that)."""
    import itertools
    import statistics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = docs.select(
        "doc_id",
        simhash_col(F.split(F.lower(F.col("text")), r"\s+")).alias("fp"),
    ).toPandas()
    by_id = dict(zip(fp.doc_id, fp.fp))
    exact = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    assert not exact.empty
    near = [
        bin(by_id[a] ^ by_id[b]).count("1") for a, b in zip(exact.doc_a, exact.doc_b)
    ]
    ids = sorted(by_id)[:60]
    near_set = set(zip(exact.doc_a, exact.doc_b))
    rand = [
        bin(by_id[a] ^ by_id[b]).count("1")
        for a, b in itertools.combinations(ids, 2)
        if (a, b) not in near_set
    ]
    assert statistics.median(near) <= 8
    assert statistics.mean(near) < statistics.mean(rand) / 2, (
        f"near mean {statistics.mean(near):.1f} vs random {statistics.mean(rand):.1f}"
    )


def test_minhash_signature_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    sig = docs.select(
        minhash_signature_col(
            shingles_col(F.split(F.col("text"), " "), 5)
        ).alias("sig")
    ).toPandas()
    assert all(len(s) == 64 for s in sig.sig)
    assert all(all(0 <= int(x) < (1 << 31) for x in s) for s in sig.sig)


def test_batch_segments_kernel_equivalence():
    """The batch-level reduceat kernels must equal the per-doc
    reference computation for every layout: empty docs, docs larger
    than a chunk, and chunk boundaries splitting mid-batch."""
    import numpy as np

    from asr_training_data_pipeline_spark.operators.dedup import (
        _MERSENNE,
        _MINHASH_PARAMS,
        _N_HASHES,
        _batch_segments,
    )

    rng = np.random.default_rng(7)
    docs = [
        rng.integers(0, _MERSENNE, size=n, dtype=np.uint64)
        for n in (0, 3, 17, 0, 64, 5, 0)
    ]
    A = np.array([a for a, _ in _MINHASH_PARAMS], dtype=np.uint64)[None, :]
    B = np.array([b for _, b in _MINHASH_PARAMS], dtype=np.uint64)[None, :]

    def reference(h):
        if h.size == 0:
            return np.full(_N_HASHES, _MERSENNE, dtype=np.int64)
        return ((h[:, None] * A + B) % _MERSENNE).min(axis=0).astype(np.int64)

    expected = np.stack([reference(h) for h in docs])

    for chunk in (1, 7, 16, 10_000):  # forces every split layout
        sigs = np.full((len(docs), _N_HASHES), _MERSENNE, dtype=np.int64)
        for doc_idx, flat, seg_starts in _batch_segments(docs, chunk):
            perms = (flat[:, None] * A + B) % _MERSENNE
            sigs[doc_idx] = np.minimum.reduceat(perms, seg_starts, axis=0).astype(
                np.int64
            )
        assert (sigs == expected).all(), f"chunk={chunk}"

    # all-empty batch: generator yields nothing, identity rows remain
    assert list(_batch_segments([np.empty(0, dtype=np.uint64)] * 3, 8)) == []


def test_batch_segments_property_random_layouts():
    """Property: for ANY doc-length layout and chunk size, the batched
    reduceat MinHash kernel equals the per-doc reference."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from asr_training_data_pipeline_spark.operators.dedup import (
        _MERSENNE,
        _MINHASH_PARAMS,
        _N_HASHES,
        _batch_segments,
    )

    A = np.array([a for a, _ in _MINHASH_PARAMS], dtype=np.uint64)[None, :]
    B = np.array([b for _, b in _MINHASH_PARAMS], dtype=np.uint64)[None, :]

    @settings(max_examples=40, deadline=None)
    @given(
        lens=st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=25),
        chunk=st.integers(min_value=1, max_value=120),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(lens, chunk, seed):
        rng = np.random.default_rng(seed)
        docs = [
            rng.integers(0, _MERSENNE, size=n, dtype=np.uint64) for n in lens
        ]
        expected = np.stack(
            [
                ((h[:, None] * A + B) % _MERSENNE).min(axis=0).astype(np.int64)
                if h.size
                else np.full(_N_HASHES, _MERSENNE, dtype=np.int64)
                for h in docs
            ]
        ) if docs else np.empty((0, _N_HASHES), dtype=np.int64)
        sigs = np.full((len(docs), _N_HASHES), _MERSENNE, dtype=np.int64)
        for doc_idx, flat, seg_starts in _batch_segments(docs, chunk):
            perms = (flat[:, None] * A + B) % _MERSENNE
            sigs[doc_idx] = np.minimum.reduceat(perms, seg_starts, axis=0).astype(
                np.int64
            )
        assert (sigs == expected).all()

    check()


def test_minhash_simhash_handle_null_and_short_docs(spark):
    """shingles_col yields NULL for docs shorter than k tokens; both
    fingerprint kernels must fold that to their empty identity instead
    of crashing, and the LSH query path must drop such docs."""
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.operators.dedup import (
        _MERSENNE,
        _SHINGLE_K,
        minhash_signature_col,
        simhash_col,
    )
    from asr_training_data_pipeline_spark.operators.shingles import shingles_col

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h i j k l m n o p"), (3, "")],
        "doc_id long, text string",
    )
    sig = docs.select(
        "doc_id",
        minhash_signature_col(
            shingles_col(F.split(F.col("text"), " "), _SHINGLE_K)
        ).alias("sig"),
        simhash_col(F.array()).alias("fp_empty"),
    ).toPandas()
    by_id = {r.doc_id: r for r in sig.itertuples()}
    # null shingle array -> identity signature, not a crash
    assert list(by_id[1].sig) == [_MERSENNE] * 64
    assert list(by_id[3].sig) == [_MERSENNE] * 64
    assert any(s != _MERSENNE for s in by_id[2].sig)
    assert (sig.fp_empty == 0).all()


# ---------------------------------------------------------------------
# Connected components: min-label main path + star-contraction fallback
# ---------------------------------------------------------------------


def _cc_labels(spark, edges, **kw):
    from asr_training_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(pairs, **kw).toPandas()
    return dict(zip(out.v, out.label))


def test_cc_chain_deeper_than_cap_auto_escalates(spark):
    """A chain of diameter 40 exceeds max_rounds=5 of min-label
    propagation; the operator must auto-escalate to large-star/
    small-star contraction and still return exact component minima —
    NOT raise (a 100 TB job must survive one pathological cluster)."""
    chain = [(i, i + 1) for i in range(40)]  # 0-1-2-...-40
    labels = _cc_labels(spark, chain, max_rounds=5)
    assert labels == {v: 0 for v in range(41)}


def test_cc_star_fallback_matches_main_path(spark):
    """Star contraction and min-label propagation must agree on a
    multi-component graph (deterministic expected labels)."""
    import random

    rng = random.Random(7)
    edges = []
    base = 0
    expected = {}
    for comp in range(6):
        n = rng.randint(2, 12)
        vs = list(range(base, base + n))
        # random spanning tree + a few extra edges
        for i in range(1, n):
            edges.append((vs[rng.randrange(i)], vs[i]))
        for _ in range(rng.randrange(3)):
            a, b = rng.sample(vs, 2)
            edges.append((min(a, b), max(a, b)))
        for v in vs:
            expected[v] = base
        base += n + rng.randrange(3)  # gaps so ids aren't contiguous
    main = _cc_labels(spark, edges, max_rounds=25)
    fallback = _cc_labels(spark, edges, max_rounds=0)  # force escalation
    assert main == expected
    assert fallback == expected


def test_cc_leaves_nothing_persisted(spark):
    """connected_components must not leave persist-pinned frames
    behind (ADVICE r3): repeated registry invocations would accrete
    executor storage that only clearCache could free."""
    spark.catalog.clearCache()
    chain = [(i, i + 1) for i in range(30)]
    _cc_labels(spark, chain, max_rounds=5)   # escalation path
    _cc_labels(spark, chain, max_rounds=50)  # main path
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty()


def test_substring_spans_planted(spark):
    """Planted cross-doc repeated substring: the shared 6-token run
    marks exactly its token span in both docs; the unique doc reports
    zero. Overlapping windows must union, not double-count."""
    import unittest.mock as mock

    import asr_training_data_pipeline_spark.operators.dedup as dd

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 2 windows of 5
    docs = spark.createDataFrame(
        [
            (1, shared + " one two three four"),
            (2, "x y " + shared + " p q"),
            (3, "u v w a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(dd, "load_table", lambda s, d, n: docs):
        out = {r.doc_id: r for r in dd.dedup_substring_spans(spark, "x").collect()}
    # 6 shared tokens = 2 overlapping 5-windows → union = 6 tokens
    assert out[1].n_dup_windows == 2 and out[1].dup_token_count == 6
    assert out[2].n_dup_windows == 2 and out[2].dup_token_count == 6
    assert out[3].n_dup_windows == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - 6 / 10) < 1e-12


def test_connected_components_property_random_graphs(spark):
    """Hypothesis: on random edge lists, both regimes (min-label and
    forced star-contraction escalation) must agree with a plain
    union-find — labels are each component's smallest vertex."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from asr_training_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: smallest vertex per component
        return {v: find(v) for v in parent}

    edges_strategy = st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=12, deadline=None)
    @given(edges=edges_strategy)
    def check(edges):
        expect = union_find(edges)
        # resolve to true minimum (path compression may be partial)
        def resolve(m, v):
            while m[v] != v:
                v = m[v]
            return v

        expect = {v: resolve(expect, v) for v in expect}
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        for max_rounds in (25, 1):  # 1 forces the star-contraction path
            got = {
                r.v: r.label
                for r in connected_components(df, max_rounds=max_rounds).collect()
            }
            assert got == expect, (max_rounds, sorted(edges))

    check()

def test_canonical_survivor_policy(spark, sf_dir):
    """The keep/drop manifest must (a) cover every document exactly
    once, (b) pick per cluster exactly the policy argmin — lowest
    src_rank, then longest text, then smallest doc_id — and (c) make
    every singleton its own canonical."""
    m = REGISTRY["dedup_canonical"].fn(spark, sf_dir).toPandas()
    n_docs = REGISTRY["dedup_canonical"].fn(spark, sf_dir).count()
    assert len(m) == n_docs == m.doc_id.nunique()

    multi = m[m.cluster_size > 1]
    assert not multi.empty, "fixture should contain duplicate clusters"
    for comp, grp in multi.groupby("component"):
        expect = grp.sort_values(
            ["src_rank", "n_chars", "doc_id"], ascending=[True, False, True]
        ).doc_id.iloc[0]
        assert (grp.canonical_doc == expect).all()
        assert set(grp[grp.is_canonical].doc_id) == {expect}

    singles = m[m.cluster_size == 1]
    assert (singles.canonical_doc == singles.doc_id).all()
    assert singles.is_canonical.all()
    # exactly one survivor per cluster
    assert m.is_canonical.sum() == m.component.nunique()


def test_semantic_clustered_subset_of_bruteforce(spark, sf_dir):
    """SemDeDup's within-cluster pairs are a SUBSET of the brute-force
    cosine pairs (it can only miss boundary-straddlers, never invent),
    and on this fixture the KMeans partition must retain most of them."""
    from asr_training_data_pipeline_spark.operators.similarity import (
        kmeans_assignment_frame,
    )
    from asr_training_data_pipeline_spark.operators.dedup import _PAIRS_THRESHOLD
    from asr_training_data_pipeline_spark.operators.similarity import cosine_col

    brute = _pairs(
        REGISTRY["embedding_cosine_pairs"].fn(spark, sf_dir).toPandas(),
        "vec_a", "vec_b",
    )
    fa = kmeans_assignment_frame(spark, sf_dir)
    a = fa.select(F.col("cluster").alias("cid"), F.col("vec_id").alias("vec_a"),
                  F.col("e").alias("ea"))
    b = fa.select(F.col("cluster").alias("cid"), F.col("vec_id").alias("vec_b"),
                  F.col("e").alias("eb"))
    clustered = _pairs(
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cosine_col(F.col("ea"), F.col("eb")) >= _PAIRS_THRESHOLD)
        .select("vec_a", "vec_b")
        .toPandas(),
        "vec_a", "vec_b",
    )
    assert brute, "fixture should contain semantic-dup pairs"
    assert clustered <= brute
    # The fixture's pairs sit at cosine ≈ the 0.4 cut (near-random
    # vectors), where k-means co-clustering is weakest; real near-dups
    # (cosine ≥ 0.9) virtually always co-cluster. Pin that the
    # partition still finds a meaningful share here.
    assert len(clustered) >= 0.2 * len(brute), (len(clustered), len(brute))


def test_minhash_portable_recall_and_agreement(spark, sf_dir):
    """The portable-hash variant must keep the same recall property as
    the fast path (all exact-Jaccard≥0.8 pairs recovered) and agree
    with it on the vast majority of candidates (different hash, same
    algorithm and banding)."""
    exact = _pairs(REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas())
    fast = _pairs(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).toPandas())
    portable = _pairs(REGISTRY["dedup_minhash_portable"].fn(spark, sf_dir).toPandas())
    assert exact - portable == set(), f"portable missed: {exact - portable}"
    inter = len(fast & portable)
    union = len(fast | portable)
    assert union and inter / union > 0.9, (inter, union)


# ---------------------------------------------------------------------
# r7 exact-dup pre-collapse: output-equality pins
# ---------------------------------------------------------------------


def test_minhash_collapse_equals_bruteforce_banding(spark, tmp_path):
    """The collapsed LSH pipeline must emit EXACTLY the pair set the
    per-doc definition implies: (a, b, est) for every doc pair that
    shares ≥1 of 16 signature bands with est = equal-slots/64 ≥ 0.5 —
    over docs AT OR ABOVE the shingle floor. Adversarial fixture: two
    exact-dup cliques (one spanning a near-dup bridge to a distinct
    text), null texts, empty texts, and sub-k short docs. Since r11's
    JVM signature kernel the sub-floor docs are DROPPED (null sig, as
    the LSH-path docstring always promised) instead of collapsing into
    a shared identity-signature group that pairwise emitted spurious
    est=1.0 pairs between docs sharing no text — the exact-Jaccard
    ground truth gives such docs no pairs, so this is the honest
    semantics. The exact-dup collapse is still stressed by the 5-copy
    and 3-copy real-text cliques."""
    import itertools

    import duckdb

    from asr_training_data_pipeline_spark.operators.dedup import (
        _EST_THRESHOLD,
        _MERSENNE,
        _N_BANDS,
        _ROWS_PER_BAND,
        _SHINGLE_K,
    )

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    near = base.replace("today", "tonight")
    other = "completely different words about spark shuffles and parquet column pruning here"
    rows = (
        [(i, base) for i in range(1, 6)]          # 5-copy clique
        + [(10 + i, near) for i in range(3)]      # 3-copy clique, near-dup of base
        + [(20, other), (21, other)]              # 2-copy distinct clique
        + [(30, None), (31, None)]                # null texts
        + [(40, ""), (41, "tiny doc")]            # below shingle floor
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        "COPY (SELECT doc_id, text, 'en' AS lang, 'src1' AS source,"
        " coalesce(length(text), 0) AS n_chars FROM d)"
        f" TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )

    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, str(tmp_path)).collect()
    }

    # Brute-force reference with the same sub-floor drop: identity
    # signatures (no shingles) never enter banding.
    ident = (_MERSENNE,) * 64
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in spark.read.parquet(f"{tmp_path}/documents.parquet")
        .select(
            "doc_id",
            minhash_signature_col(
                shingles_col(F.split(F.col("text"), " "), _SHINGLE_K)
            ).alias("sig"),
        )
        .collect()
        if tuple(r.sig) != ident
    }
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        bands = any(
            sa[i * _ROWS_PER_BAND : (i + 1) * _ROWS_PER_BAND]
            == sb[i * _ROWS_PER_BAND : (i + 1) * _ROWS_PER_BAND]
            for i in range(_N_BANDS)
        )
        est = sum(x == y for x, y in zip(sa, sb)) / 64.0
        if bands and est >= _EST_THRESHOLD:
            want[(a, b)] = est
    # sub-floor docs (nulls + empties + short) must NOT pair — the
    # fixture keeps them to prove the drop, not the grouping
    assert (30, 31) not in want and (30, 40) not in want
    assert not any(a in (30, 31, 40, 41) or b in (30, 31, 40, 41) for a, b in got)
    assert (1, 2) in want and want[(1, 2)] == 1.0
    assert got == want


def test_ngram_collapse_reps_shrink_pair_join(spark, tmp_path):
    """The collapsed exact-Jaccard graph hands connected components a
    rep-level graph: a 6-copy clique must reach the iterative loop as
    ONE vertex (the pre-pass is the point), while the public outputs
    still carry every member."""
    import duckdb

    from asr_training_data_pipeline_spark.operators.dedup import (
        _ngram_collapsed_state,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text) for i in range(6)] + [(10, "one two three four five six")]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        "COPY (SELECT doc_id, text, 'en' AS lang, 'src1' AS source,"
        " length(text) AS n_chars FROM d)"
        f" TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )
    rep_pairs, members, conn = _ngram_collapsed_state(spark, str(tmp_path))
    assert rep_pairs.count() == 0  # no cross-text near dups → no edges
    comps = REGISTRY["dedup_components"].fn(spark, str(tmp_path)).toPandas()
    assert sorted(comps.doc_id) == list(range(6))
    assert set(comps.component) == {0} and set(comps.cluster_size) == {6}
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, str(tmp_path)).toPandas()
    assert len(pairs) == 15 and set(pairs.jaccard) == {1.0}


def test_ppjoin_prefix_index_is_thin(spark, sf_dir):
    """The measurable win of the prefix filter: at t=0.8 the indexed
    token occurrences are ~1/5 of the full inverted index (n - ceil(
    0.8n) + 1 per doc), and the pair set is IDENTICAL to the
    brute-force oracle (proven by dedup_ppjoin's oracle compare every
    run). Here: pin the index reduction and the candidate-set
    equality with the full-index method's output."""
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.operators.dedup import (
        _SHINGLE_K,
        dedup_ngram_jaccard,
        dedup_ppjoin,
    )
    from asr_training_data_pipeline_spark.operators.shingles import shingles_col
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            shingles_col(F.split(F.col("text"), " "), _SHINGLE_K)
        ).alias("shingle"),
    )
    full_rows = sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    prefix_rows = sizes.agg(
        F.sum(F.expr("n - ((4 * n + 4) div 5) + 1"))
    ).collect()[0][0]
    assert prefix_rows * 4 < full_rows  # > 4× thinner

    pp = {(r.doc_a, r.doc_b) for r in dedup_ppjoin(spark, sf_dir).collect()}
    full = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert pp == full


def test_streaming_simhash_gate_equals_batch_twin(spark, sf_dir):
    """The near-dup ingest gate: the streamed frame must EQUAL the
    batch twin built from the same expressions (stateless-plan
    unification, as the Bloom gate), and every flagged pair must
    verify at hamming <= radius against the static fingerprint."""
    from asr_training_data_pipeline_spark.operators.dedup import _HAMMING_MAX
    from asr_training_data_pipeline_spark.streaming.windows import (
        _SIMGATE_MOD,
        streaming_simhash_gate_frames,
    )

    streamed, twin = streaming_simhash_gate_frames(spark, sf_dir)
    got = [tuple(r) for r in streamed.collect()]
    want = [tuple(r) for r in twin.collect()]
    assert got == want
    assert got  # the fixture flags real near-dups; equality isn't vacuous
    for doc_id, _band, matched_id, hamming in got:
        assert doc_id % _SIMGATE_MOD == 0
        assert matched_id % _SIMGATE_MOD != 0
        assert 0 <= hamming <= _HAMMING_MAX


def test_rate_by_source_fast_matrix_algebra(spark, sf_dir):
    """dedup_rate_by_source_fast: the production (xxhash64) matrix
    must equal an independent pandas recomputation of the labelling /
    normalization / aggregation algebra from its OWN collected pair
    set — the matrix layer is shared with the oracle-green portable
    form, so this pins that swapping the pair provider changed the
    inputs only, not the algebra."""
    from decimal import Decimal

    from asr_training_data_pipeline_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_rate_by_source_fast,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    n_docs: dict[str, int] = {}
    for s in docs.values():
        n_docs[s] = n_docs.get(s, 0) + 1
    agg: dict[tuple[str, str], list] = {}
    for r in pairs:
        key = tuple(sorted((docs[r["doc_a"]], docs[r["doc_b"]])))
        cell = agg.setdefault(key, [0, Decimal(0)])
        cell[0] += 1
        # davg semantics: decimal(27,6) sum / count, cast to double
        cell[1] += Decimal(f"{r['est_jaccard']:.6f}")
    want = {
        key: (
            n,
            round(float(total / n), 6),
            n_docs[key[0]],
            n_docs[key[1]],
        )
        for key, (n, total) in agg.items()
    }
    got = {
        (r["source_a"], r["source_b"]): (
            r["dup_pairs"],
            r["avg_est"],
            r["docs_a"],
            r["docs_b"],
        )
        for r in dedup_rate_by_source_fast(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # fixture has real cross/within-source dups
