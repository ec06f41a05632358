"""BPE merge-training invariants beyond oracle parity: the argmax
sequence must be structurally valid (max pair count non-increasing —
a new pair can never beat the max that created it) and each merge must
compose from the alphabet plus earlier merges."""

from __future__ import annotations

from asr_training_data_pipeline_spark.api import REGISTRY


def _merges(spark, sf_dir):
    return (
        REGISTRY["bpe_merges"].fn(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    )


def test_bpe_counts_non_increasing(spark, sf_dir):
    rows = _merges(spark, sf_dir)
    assert len(rows) > 0
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)


def test_bpe_merges_compose(spark, sf_dir):
    """merged = pair minus the space, and every symbol in a pair is a
    single char or an earlier merge's output."""
    rows = _merges(spark, sf_dir)
    known: set[str] = set()
    for r in rows:
        a, b = r.pair.split(" ")
        assert r.merged == a + b
        for sym in (a, b):
            assert len(sym) == 1 or sym in known, (r.merge_rank, sym)
        known.add(r.merged)


def test_bpe_ranks_dense(spark, sf_dir):
    rows = _merges(spark, sf_dir)
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))


def test_bpe_vocab_conserves_chars(spark, sf_dir):
    """Merging never creates or destroys characters: Σ n_tokens·len(
    symbol) over the vocabulary equals Σ cnt·len(word) over the
    training word types."""
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _ASCII_LO,
        _ASCII_UP,
    )
    from asr_training_data_pipeline_spark.sources.tables import load_table

    vocab = REGISTRY["bpe_vocab"].fn(spark, sf_dir).toPandas()
    assert len(vocab) > 0
    got = int((vocab.n_tokens * vocab.symbol.str.len()).sum())
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.select(
            F.explode(
                F.split(F.translate("text", _ASCII_UP, _ASCII_LO), " ")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
    )
    want = w.agg(F.sum(F.length("w"))).collect()[0][0]
    assert got == int(want)
    # and at least one merge-produced symbol survives in the corpus
    assert bool(vocab.is_merged.any())


def test_bpe_replace_semantics_match_reference(spark):
    """The documented merge semantic — leftmost, non-overlapping,
    continue-after-replacement over the sentinel-delimited spaced form
    — pinned against a pure-Python reference on hypothesis-generated
    words (runs of one char are the hard case: 'a a a a' must become
    'aa a a', not 'aa aa')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    def py_merge(spaced: str, pair: str) -> str:
        # str.replace IS leftmost/non-overlapping/continue-after
        return spaced.replace(f" {pair} ", f" {pair.replace(' ', '')} ")

    words = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=5
    )

    @settings(max_examples=30, deadline=None)
    @given(ws=words, pa=st.sampled_from(["a", "b", "ab"]),
           pb=st.sampled_from(["a", "b", "ba"]))
    def check(ws, pa, pb):
        pair = f"{pa} {pb}"
        spaced = [" " + " ".join(w) + " " for w in ws]
        want = [py_merge(s, pair) for s in spaced]
        df = spark.createDataFrame([(s,) for s in spaced], "sp string")
        got = [
            r.m
            for r in df.select(
                F.replace(
                    F.col("sp"),
                    F.lit(f" {pair} "),
                    F.lit(" " + pair.replace(" ", "") + " "),
                ).alias("m")
            ).collect()
        ]
        assert sorted(got) == sorted(want)

    check()
