"""Capability/property pins for the r9 operator wave (exact oracle
parity is covered automatically by test_oracle_parity's registry
sweep; these pin the SEMANTIC claims the oracles can't express):

* dsir_importance_weights — on a corpus with a distinct target-domain
  vocabulary, target-vocab documents must score HIGHER than off-target
  documents (the whole point of importance weighting), the feature
  count must equal 2n-1 (uni+bigrams), and the Gumbel keys must be a
  deterministic function of doc_id;
* kcenter_coreset — a pure-Python replay of the greedy farthest-point
  traversal (same sequential double folds) must reproduce the exact
  center set, selection order and assignment; duplicate points must
  never produce duplicate centers.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY

# ---------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsir_sf_dir(sf_dir):
    """Two 'domains': target lang 'aa' (lexicographic min) talks about
    alpha/gamma; raw majority lang 'zz' talks about beta/delta; one
    'zz' doc uses the TARGET vocabulary and must outscore its peers."""
    d = tempfile.mkdtemp(prefix="dsir_sf_")
    rows = []
    for i in range(20):
        rows.append((i, "alpha gamma alpha corpus gamma alpha", "aa", "src_a", 30))
    for i in range(20, 80):
        rows.append((i, "beta delta beta corpus delta beta", "zz", "src_b", 30))
    # the interesting row: raw-lang doc with target-domain content
    rows.append((80, "alpha gamma alpha corpus gamma alpha", "zz", "src_b", 30))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY documents TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def test_dsir_target_domain_docs_outscore(spark, dsir_sf_dir):
    rows = {
        r.doc_id: r
        for r in REGISTRY["dsir_importance_weights"].fn(spark, dsir_sf_dir).collect()
    }
    assert len(rows) == 81
    # every target doc scores above every off-target doc
    tgt = [rows[i].avg_logratio for i in range(20)]
    off = [rows[i].avg_logratio for i in range(20, 80)]
    assert min(tgt) > max(off)
    # target-like content wins regardless of its lang label
    assert rows[80].avg_logratio > max(off)
    assert rows[80].avg_logratio == pytest.approx(min(tgt), abs=1e-6)
    # NOTE: absolute sign is NOT a DSIR property — add-one smoothing
    # over B=4096 buckets dilutes the small target LM more than the
    # raw LM, shifting all log-ratios down; only the RANKING matters
    # for resampling. Require a real separation margin instead.
    assert min(tgt) - max(off) > 0.5
    assert all(rows[i].is_target for i in range(20))
    assert not any(rows[i].is_target for i in range(20, 81))


def test_dsir_feature_count_and_key_determinism(spark, sf_dir):
    out = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir)
    from asr_training_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    joined = out.join(n_tok, "doc_id")
    # uni + bigrams = n + (n-1)
    bad = joined.filter(F.col("n_feats") != 2 * F.col("n") - 1).count()
    assert bad == 0
    # the Gumbel perturbation is a pure function of doc_id: re-running
    # yields identical keys
    a = {r.doc_id: r.resample_key_u for r in out.collect()}
    b = {
        r.doc_id: r.resample_key_u
        for r in REGISTRY["dsir_importance_weights"].fn(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------
# k-center coreset
# ---------------------------------------------------------------------

_KC_K = 8


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _py_gonzalez(vecs: dict, k: int):
    """Reference greedy farthest-point with the engine's exact float
    recipe: d2 = (ee - 2*dot) + cc over sequential folds."""
    if not vecs:
        return []
    ee = {i: _fold_dot(e, e) for i, e in vecs.items()}

    def d2(i, c):
        return ee[i] - 2 * _fold_dot(vecs[i], vecs[c]) + ee[c]

    cents = [min(vecs)]
    for _ in range(1, k):
        best = None
        for i in sorted(vecs):
            md2 = min(d2(i, c) for c in cents)
            if md2 > 0 and (best is None or md2 > best[0]):
                best = (md2, i)
        if best is None:
            break
        cents.append(best[1])
    assign = {}
    for i in sorted(vecs):
        assign[i] = min((d2(i, c), c) for c in cents)
    return cents, assign


def _load_vecs(sf_dir):
    con = duckdb.connect()
    try:
        rows = con.sql(
            "SELECT vec_id, cast(embedding AS double[]) AS e"
            f" FROM '{sf_dir}/embeddings.parquet'"
            " WHERE len(cast(embedding AS double[])) = 64"
            "   AND len(list_filter(cast(embedding AS double[]),"
            "       x -> NOT (abs(x) <= 1000000.0))) = 0"
            "   AND list_dot_product(cast(embedding AS double[]),"
            "       cast(embedding AS double[])) > 0"
        ).fetchall()
    finally:
        con.close()
    return {int(i): list(e) for i, e in rows}


def test_kcenter_matches_python_replay(spark, sf_dir):
    vecs = _load_vecs(sf_dir)
    cents, assign = _py_gonzalez(vecs, _KC_K)
    rows = {
        r.vec_id: r
        for r in REGISTRY["kcenter_coreset"].fn(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert len(rows) == len(vecs)
    got_cents = sorted(
        (r.sel_idx, r.vec_id) for r in rows.values() if r.sel_idx is not None
    )
    assert got_cents == [(i, c) for i, c in enumerate(cents)]
    for i, (d2v, c) in assign.items():
        assert rows[i].center_id == c, (i, rows[i], c)
        assert rows[i].d2 == pytest.approx(round(d2v, 6), abs=1e-9)


def test_kcenter_duplicates_never_duplicate_centers(spark, sf_dir):
    """3 distinct points × many copies, k=8: exactly 3 centers."""
    d = tempfile.mkdtemp(prefix="kc_dup_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    base = [[0.0] * 64, [1.0] + [0.0] * 63, [0.0, 2.0] + [0.0] * 62]
    base[0][0] = 0.5  # keep norms nonzero
    rows = []
    for i in range(12):
        rows.append((i, base[i % 3], i % 3))
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    con.execute(f"COPY embeddings TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    out = REGISTRY["kcenter_coreset"].fn(spark, d).collect()
    spark.catalog.clearCache()
    cents = [r for r in out if r.sel_idx is not None]
    assert len(cents) == 3
    assert len({r.vec_id for r in cents}) == 3
    # every duplicate sits at d2 == 0 on its own prototype
    assert all(r.d2 == 0.0 for r in out)


def test_kcenter_farthest_property(spark, sf_dir):
    """Each selected center (idx >= 1) was, at selection time, at
    least as far from the prior set as every other point."""
    vecs = _load_vecs(sf_dir)
    cents, _ = _py_gonzalez(vecs, _KC_K)
    ee = {i: _fold_dot(e, e) for i, e in vecs.items()}

    def d2(i, c):
        return ee[i] - 2 * _fold_dot(vecs[i], vecs[c]) + ee[c]

    for idx in range(1, len(cents)):
        prior = cents[:idx]
        chosen = min(d2(cents[idx], c) for c in prior)
        for i in vecs:
            assert min(d2(i, c) for c in prior) <= chosen or i in prior


# ---------------------------------------------------------------------
# token PSI drift
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def psi_sf_dir(sf_dir):
    """lang 'dr' drifts hard between the doc_id-parity snapshots
    (disjoint vocabularies); lang 'st' is token-identical across them."""
    d = tempfile.mkdtemp(prefix="psi_sf_")
    rows = []
    for i in range(0, 200, 2):
        rows.append((i, "alpha beta gamma delta epsilon", "dr", "s", 30))
        rows.append((i + 1, "zeta eta theta iota kappa", "dr", "s", 26))
        rows.append((1000 + i, "stable corpus words here now", "st", "s", 29))
        rows.append((1001 + i, "stable corpus words here now", "st", "s", 29))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY documents TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def test_psi_separates_drifted_from_stable(spark, psi_sf_dir):
    rows = {
        r.lang: r
        for r in REGISTRY["token_psi_drift"].fn(spark, psi_sf_dir).collect()
    }
    # disjoint-vocabulary drift fires well past the 0.25 alarm line
    assert rows["dr"].psi_micro > 250_000, rows["dr"]
    # token-identical halves sit essentially at zero (smoothing residue
    # only — n_a == n_b makes even that vanish)
    assert rows["st"].psi_micro < 10_000, rows["st"]
    assert rows["dr"].psi_micro > 50 * max(rows["st"].psi_micro, 1)
    # the top contributor is a real constituent of the PSI sum
    for r in rows.values():
        assert 0 <= r.top_contrib_micro <= r.psi_micro


def test_psi_nonnegative_everywhere(spark, sf_dir):
    out = REGISTRY["token_psi_drift"].fn(spark, sf_dir)
    assert out.filter(
        (F.col("psi_micro") < 0) | (F.col("top_contrib_micro") < 0)
    ).count() == 0
    assert out.count() > 0


def test_streaming_psi_equals_batch(spark, sf_dir):
    """The stateless-plan unification guarantee: the streaming monitor
    (odd half streamed, even half as batch reference) must equal the
    batch token_psi_drift frame row-for-row."""
    batch = sorted(
        map(tuple, REGISTRY["token_psi_drift"].fn(spark, sf_dir).collect())
    )
    stream = sorted(
        map(tuple, REGISTRY["streaming_psi_monitor"].fn(spark, sf_dir).collect())
    )
    assert batch == stream and len(batch) > 0
