"""Independent golden for bigram_perplexity: a constructed corpus
where every scoring path fires — seen bigram, backoff to a seen
unigram, backoff to OOV — checked against a from-scratch Python
reimplementation of the documented semantics (not the Spark code, not
the oracle SQL)."""

from __future__ import annotations

import math
import shutil
import tempfile
from collections import Counter

import duckdb
import pytest

from asr_training_data_pipeline_spark.operators.text_analysis import (
    _BI_BACKOFF,
    _BI_TRAIN_MOD,
    _LM_SCALE,
    bigram_perplexity,
)

# doc_id % 5 == 0 → score-only (unseen material lands there)
_DOCS = [
    (0, "a b unseen_word b a"),        # unseen unigram + unseen bigrams
    (1, "a b a b a"),
    (2, "b a b a b"),
    (3, "a a b b a"),
    (4, "c a b c"),
    (5, "b c"),                        # seen words, bigram b→c seen via doc 4? no: 'b c' in doc 4 ("b c" at tail) → seen
    (6, "a b c a"),
    (10, "c c"),                       # bigram c→c never in train → backoff to seen unigram
]


@pytest.fixture(scope="module")
def lm_sf_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="bigram_lm_")
    vals = ", ".join(
        f"({i}, '{t}', 'en', 'src{i}', {len(t)})" for i, t in _DOCS
    )
    duckdb.sql(
        f"COPY (SELECT * FROM (VALUES {vals}) "
        "AS t(doc_id, text, lang, source, n_chars)) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def _expected():
    q = lambda x: math.floor(x * _LM_SCALE + 0.5)  # noqa: E731
    train = [t.split(" ") for i, t in _DOCS if i % _BI_TRAIN_MOD != 0]
    u = Counter(w for t in train for w in t)
    total = sum(u.values())
    bi = Counter((t[i], t[i + 1]) for t in train for i in range(len(t) - 1))
    lq_u = {w: q(-math.log(c / total)) for w, c in u.items()}
    lq_oov = q(math.log(total + 1))
    lq_alpha = q(-math.log(_BI_BACKOFF))

    out = {}
    for doc_id, text in _DOCS:
        t = text.split(" ")
        terms = [lq_u.get(t[0], lq_oov)]
        for w1, w2 in zip(t, t[1:]):
            if (w1, w2) in bi:
                terms.append(q(-math.log(bi[(w1, w2)] / u[w1])))
            else:
                terms.append(lq_alpha + lq_u.get(w2, lq_oov))
        out[doc_id] = (len(terms), sum(terms))
    return out


def test_all_three_scoring_paths_fire():
    """The fixture must exercise seen-bigram, backoff-to-seen-unigram,
    and backoff-to-OOV — otherwise the golden proves less than it
    claims."""
    train = [t.split(" ") for i, t in _DOCS if i % _BI_TRAIN_MOD != 0]
    u = Counter(w for t in train for w in t)
    bi = Counter((t[i], t[i + 1]) for t in train for i in range(len(t) - 1))
    score_bigrams = [
        (t[i], t[i + 1])
        for doc_id, text in _DOCS
        for t in [text.split(" ")]
        for i in range(len(t) - 1)
    ]
    assert any(b in bi for b in score_bigrams)
    assert any(b not in bi and b[1] in u for b in score_bigrams)
    assert any(b not in bi and b[1] not in u for b in score_bigrams)


def test_bigram_perplexity_matches_independent_golden(spark, lm_sf_dir):
    got = {
        r["doc_id"]: (r["n_terms"], r["avg_neglogp"])
        for r in bigram_perplexity(spark, lm_sf_dir).collect()
    }
    for doc_id, (n, sum_u) in _expected().items():
        assert got[doc_id][0] == n
        # ±1 micro-nat per term: Python's math.log and the JVM's can
        # differ by 1 ulp, which flips a ⌊x·1e6+½⌋ quantization when x
        # lands exactly on a boundary. Spark↔DuckDB parity stays EXACT
        # (the oracle suite pins it); the independent golden checks
        # semantics, not libm bit-identity.
        want = sum_u / (n * _LM_SCALE)
        assert abs(got[doc_id][1] - want) <= (n + 0.5) / (n * _LM_SCALE), doc_id


def _boundary_margin(x: float) -> float:
    """Distance of x·S + ½ from the nearest floor() boundary, in units
    of 1 micro-nat."""
    v = x * _LM_SCALE + 0.5
    f = v - math.floor(v)
    return min(f, 1.0 - f)


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_quantization_boundaries_have_libm_margin(sf):
    """The cross-engine exactness of the micro-nat tables relies on
    the JVM's and DuckDB's libm agreeing on ln() at every distinct
    input; a 1-ulp divergence only matters if a quantized value lands
    within ~|x|·2⁻⁵² of a ⌊x·1e6+½⌋ boundary. Measure the actual
    margin for EVERY distinct unigram, bigram, and constant the driver
    fixtures produce: requiring ≥1e-6 micro-nats (≈10³× a 1-ulp
    perturbation of x≈20) turns the ADVICE-flagged boundary risk into
    a checked property of the fixture rather than an assumption."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, lower(text) AS t FROM '{sf}/documents.parquet'"
        " WHERE text IS NOT NULL"
    ).fetchall()
    cu: dict = {}
    cb: dict = {}
    for doc_id, t in rows:
        if doc_id % 5 == 0:
            continue
        toks = t.split(" ")
        for w in toks:
            cu[w] = cu.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    total = sum(cu.values())
    xs = [-math.log(c / total) for c in cu.values()]
    xs += [-math.log(c / cu[a]) for (a, _b), c in cb.items()]
    xs += [math.log(total + 1), -math.log(0.4)]
    worst = min(_boundary_margin(x) for x in xs)
    # 1-ulp of ln at x≈20 perturbs x·1e6 by ≈ 20·2⁻⁵²·1e6 ≈ 4.4e-9
    assert worst > 1e-6, f"quantization margin too tight: {worst}"
