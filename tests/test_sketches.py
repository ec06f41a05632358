"""Distinct-counting sketch family (HLL / KMV / streaming HLL):
property checks against Python references, degenerate corpora, and
the scale-shape locks. Oracle parity for the registered queries runs
in test_oracle_parity.py like every other registry member."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.api import REGISTRY
from asr_training_data_pipeline_spark.operators.sketches import (
    _HLL_LC_THRESH_MILLI,
    _HLL_M,
    _HLL_NUM,
    _LC_MILLI,
    _dense_registers,
    _finalize,
)


def _py_hll(values: list[str]) -> tuple[list[int], int]:
    """Reference HLL: registers + corrected integer estimate from
    Python ints and hashlib.md5 — no Spark, no DuckDB."""
    regs = [0] * _HLL_M
    for w in values:
        hx = hashlib.md5(w.encode()).hexdigest()
        b = int(hx[0:8], 16) % _HLL_M
        v = int(hx[8:16], 16)
        rho = 33 if v == 0 else (32 - v.bit_length() + 1)
        regs[b] = max(regs[b], rho)
    s = sum(1 << (33 - m) for m in regs)
    vzero = sum(1 for m in regs if m == 0)
    raw_milli = _HLL_NUM // s
    if vzero > 0 and raw_milli <= _HLL_LC_THRESH_MILLI:
        est = _LC_MILLI[vzero] // 1000
    else:
        est = _HLL_NUM // (1000 * s)
    return regs, est


def test_lc_table_matches_formula():
    for v in range(1, _HLL_M + 1):
        assert _LC_MILLI[v] == round(1000 * _HLL_M * math.log(_HLL_M / v))
    assert _LC_MILLI[_HLL_M] == 0  # all registers empty → estimate 0


def test_registers_and_estimate_match_python_reference(spark):
    words = [f"tok{i}" for i in range(500)] + ["tok0", "tok1"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        F.lit("x").alias("lang"), F.md5("w").alias("hx")
    )
    regs = {
        int(r["b"]): int(r["m"])
        for r in _dense_registers(df, ["lang"]).collect()
    }
    py_regs, py_est = _py_hll(words)
    assert [regs[b] for b in range(_HLL_M)] == py_regs
    fin = _finalize(_dense_registers(df, ["lang"]), ["lang"]).collect()[0]
    assert int(fin["hll_est"]) == py_est


def test_hll_estimate_within_published_error(spark, sf_dir):
    """σ ≈ 1.04/√64 = 13%; assert a loose 3σ envelope so the test
    pins gross breakage (wrong bucketing, wrong table) rather than
    the fixture's luck."""
    rows = REGISTRY["hll_distinct"].fn(spark, sf_dir).collect()
    assert rows, "fixture has languages"
    for r in rows:
        assert abs(r["hll_est"] - r["exact_distinct"]) <= max(
            0.4 * r["exact_distinct"], 10
        ), dict(r.asDict())


def test_hll_merge_always_lossless(spark, sf_dir):
    rows = REGISTRY["hll_merge_shards"].fn(spark, sf_dir).collect()
    assert rows and all(r["merge_is_lossless"] for r in rows)
    for r in rows:
        # each shard alone sees ≤ the merged estimate's domain; the
        # spread brackets are sanity, not tight bounds
        assert r["shard_est_min"] <= r["shard_est_max"]


def test_kmv_exact_when_corpus_smaller_than_k(spark):
    """|corpus| < k ⇒ the sketch IS the distinct set: estimates and
    Jaccard are exact by construction."""
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "c d e f"), (2, "a b"), (3, "e f g")],
        "doc_id bigint, text string",
    )
    docs.createOrReplaceTempView("__kmv_tiny")
    import duckdb

    from asr_training_data_pipeline_spark.operators.sketches import (
        kmv_corpus_overlap,
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="kmv_tiny_")
    docs.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
    row = kmv_corpus_overlap(spark, d).collect()[0]
    # side 0 = docs 0,2 → {a,b,c,d}; side 1 = docs 1,3 → {c,d,e,f,g}
    assert row["exact_a"] == 4 and row["est_a"] == 4
    assert row["exact_b"] == 5 and row["est_b"] == 5
    assert row["jaccard_est_ppm"] == row["jaccard_exact_ppm"] == 2 * 1000000 // 7


def test_degenerate_single_word_corpus(spark, tmp_path):
    """One distinct token: linear-counting branch with V = 63, every
    estimate exactly 1; merge still lossless; PMI empty (no pair
    reaches min support with distinct count 1? one pair repeated —
    support holds, lift = N exactly)."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["w w w w w w", "w w w"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [11, 5],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    d = str(tmp_path)
    hll = REGISTRY["hll_distinct"].fn(spark, d).collect()
    assert len(hll) == 1 and hll[0]["hll_est"] == 1 and hll[0]["err_ppm"] == 0
    assert hll[0]["zero_registers"] == _HLL_M - 1
    merge = REGISTRY["hll_merge_shards"].fn(spark, d).collect()
    assert merge[0]["merge_is_lossless"] and merge[0]["merged_est"] == 1
    pmi = REGISTRY["pmi_collocations"].fn(spark, d).collect()
    # 7 (w,w) pairs; marginals 7·7; lift = 7·7·10^6/(7·7) = 10^6
    assert len(pmi) == 1 and pmi[0]["lift_ppm"] == 1000000


def test_pmi_reference_on_known_corpus(spark, tmp_path):
    """Hand-checked lift on a 3-doc corpus."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "new york new york new york new york new york",
                "in new york in new york",
                "york new york new",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1, 1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        (r["w1"], r["w2"]): r
        for r in REGISTRY["pmi_collocations"].fn(spark, str(tmp_path)).collect()
    }
    # doc0 (n y ×5, 9 pairs): (n,y)×5 (y,n)×4; doc1 (i n y i n y,
    # 5 pairs): (i,n)×2 (n,y)×2 (y,i)×1; doc2 (y n y n, 3 pairs):
    # (y,n)×2 (n,y)×1 → (n,y)=8 (y,n)=6 (i,n)=2 (y,i)=1, N=17
    ny = out[("new", "york")]
    assert ny["pair_count"] == 8
    # as-first marginal c1(new)=5+2+1=8; as-second c2(york)=8
    assert ny["w1_count"] == 8 and ny["w2_count"] == 8
    assert ny["lift_ppm"] == 1000000 * 8 * 17 // (8 * 8)


def test_streaming_hll_matches_batch_registers(spark, sf_dir):
    rows = REGISTRY["streaming_distinct_hll"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["live_registers"] <= _HLL_M
        assert abs(r["hll_users"] - r["exact_users"]) <= max(
            0.4 * r["exact_users"], 10
        )


# ------------------------------------------------------------------
# scale-shape locks
# ------------------------------------------------------------------

def _executed_plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_register_exchange_is_constant_width(spark, sf_dir):
    """The register aggregation must partial-aggregate BEFORE its
    exchange (map-side combine caps each partition's contribution at
    |langs|·64 rows) — the flat-shuffle property that distinguishes
    the sketch from COUNT(DISTINCT)."""
    plan = _executed_plan(spark, sf_dir, "hll_distinct")
    # every exchange keyed by the bucket agg must sit above a partial
    # HashAggregate (keys lang, b) — i.e. no exchange ships raw tokens
    m = re.search(
        r"Exchange hashpartitioning\(lang[^)]*\bb#\d+L?[^)]*\)", plan
    )
    assert m, plan[:2000]
    before = plan[: m.start()]
    assert "HashAggregate" in before, "no partial aggregate before register exchange"


def test_kmv_bottomk_is_take_ordered(spark, sf_dir):
    """The per-side bottom-k must plan as TakeOrderedAndProject —
    k rows per partition — not a windowed row_number over the whole
    vocabulary."""
    plan = _executed_plan(spark, sf_dir, "kmv_corpus_overlap")
    assert "TakeOrderedAndProject" in plan
    assert "RunningWindowFunction" not in plan and "Window" not in plan


def test_column_profile_covers_all_columns(spark, sf_dir):
    rows = {r["col_name"]: r for r in
            REGISTRY["hll_column_profile"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"user_id", "event_type", "props"}
    for r in rows.values():
        assert abs(r["hll_est"] - r["exact_distinct"]) <= max(
            0.4 * r["exact_distinct"], 10
        ), dict(r.asDict())


def test_hll_registers_match_reference_on_random_corpora(spark):
    """Hypothesis: for arbitrary word multisets (including unicode and
    collision-prone short strings), the Spark register frame and
    integer estimate equal the hashlib/Python-int reference — pinning
    bucketing, the rho ladder, and finalization against drift."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=[" "]
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=60,
    )

    @settings(max_examples=15, deadline=None)
    @given(ws=words)
    def check(ws):
        df = spark.createDataFrame([(w,) for w in ws], "w string").select(
            F.lit("x").alias("lang"), F.md5("w").alias("hx")
        )
        regs = {
            int(r["b"]): int(r["m"])
            for r in _dense_registers(df, ["lang"]).collect()
        }
        py_regs, py_est = _py_hll(ws)
        assert [regs[b] for b in range(_HLL_M)] == py_regs
        fin = _finalize(_dense_registers(df, ["lang"]), ["lang"]).collect()[0]
        assert int(fin["hll_est"]) == py_est

    check()


def test_pmi_matches_bruteforce_on_random_corpora(spark, tmp_path):
    """Hypothesis: lift_ppm equals a collections.Counter brute force
    for random small corpora (min-support floor lowered by density:
    short alphabets force repeated pairs)."""
    import collections

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _PMI_MIN,
        pmi_collocations,
    )

    docs = st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=2, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )

    counter = [0]

    @settings(max_examples=10, deadline=None)
    @given(texts=docs)
    def check(texts):
        counter[0] += 1
        d = tmp_path / f"pmi_hyp_{counter[0]}"
        d.mkdir()
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(d / "documents.parquet")
        got = {
            (r["w1"], r["w2"]): r["lift_ppm"]
            for r in pmi_collocations(spark, str(d)).collect()
        }
        pairs = collections.Counter()
        for t in texts:
            ws = t.split(" ")
            pairs.update(zip(ws, ws[1:]))
        n = sum(pairs.values())
        c1 = collections.Counter()
        c2 = collections.Counter()
        for (a, b), c in pairs.items():
            c1[a] += c
            c2[b] += c
        want = {
            (a, b): 1000000 * c * n // (c1[a] * c2[b])
            for (a, b), c in pairs.items()
            if c >= _PMI_MIN
        }
        # pmi query returns top-50; the random corpora stay below 50
        # qualifying pairs so the sets must match exactly
        assert got == want

    check()
