"""Unigram-LM tokenizer (unigram_lm_vocab): engine vs an independent
Python EM implementation on engineered corpora (multilingual,
adversarial ties), plus the segmentation-reconstruction invariant.
The sf fixtures' oracle parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest

from asr_training_data_pipeline_spark.operators.text_analysis import (
    _ULM_MAXLEN,
    _ULM_MAXPIECE,
    _ULM_ROUNDS,
    _ULM_TOPK,
    unigram_lm_train,
)


# ---------- independent reference (no engine code reused) -----------

def _ref_em(word_counts: dict[str, int]) -> dict[str, tuple[int, bool]]:
    words = {
        w: c for w, c in word_counts.items() if 1 <= len(w) <= _ULM_MAXLEN
    }
    chars: dict[str, int] = {}
    subs: dict[str, int] = {}
    for w, c in words.items():
        for i, ch in enumerate(w):
            chars[ch] = chars.get(ch, 0) + c
            for ln in range(2, _ULM_MAXPIECE + 1):
                if i + ln <= len(w):
                    subs[w[i:i + ln]] = subs.get(w[i:i + ln], 0) + c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:_ULM_TOPK]
    vocab = dict(top)
    for ch, c in chars.items():
        vocab[ch] = max(vocab.get(ch, 0), c)

    def segment(w: str, cost: dict[str, float]) -> list[str]:
        # DP over prefix lengths; state (neg_prob, joined_path)
        sep = "\x1f"
        best = {0: (-1.0, "")}
        for i in range(1, len(w) + 1):
            options = []
            for j in range(max(0, i - _ULM_MAXPIECE), i):
                if j in best and w[j:i] in cost:
                    d, p = best[j]
                    options.append(
                        (d * cost[w[j:i]], (p + sep + w[j:i]) if p else w[j:i])
                    )
            if options:
                best[i] = min(options)
        return best[len(w)][1].split("\x1f")

    for _ in range(_ULM_ROUNDS):
        total = sum(vocab.values())
        cost = {p: c / total for p, c in vocab.items()}
        new: dict[str, int] = {}
        for w, c in words.items():
            for p in segment(w, cost):
                new[p] = new.get(p, 0) + c
        vocab = {p: c for p, c in new.items() if len(p) >= 2 and c > 0}
        for ch in chars:
            vocab[ch] = new.get(ch, 0) + 1
    return {p: (c, p in chars) for p, c in vocab.items()}


def _docs_from_words(spark, word_counts: dict[str, int]):
    text = " ".join(
        " ".join([w] * c) for w, c in sorted(word_counts.items())
    )
    return spark.createDataFrame(
        [(1, text, "xx", "srcT", len(text))],
        "doc_id long, text string, lang string, source string, n_chars bigint",
    )


CORPORA = {
    "english": {
        "hello": 5, "help": 3, "hell": 2, "low": 4, "lower": 2,
        "newest": 3, "widest": 1, "wide": 2, "new": 6, "est": 1,
    },
    "multilingual": {
        "привет": 4, "приветик": 2, "мир": 5,
        "你好世界": 3, "你好": 6, "世界和平": 1,
        "ñandú": 2, "ñoño": 3, "café": 4, "cafetería": 1,
    },
    "tie-heavy": {  # every piece count engineered equal
        "abab": 2, "baba": 2, "abba": 2, "baab": 2, "aabb": 2,
    },
    "long-tail": {
        "a" * 20: 3,          # over MAXLEN: excluded from training
        "a" * 16: 2,          # exactly at the bound: included
        "b": 1,
    },
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_engine_matches_independent_reference(spark, name):
    words = CORPORA[name]
    got = {
        r["piece"]: (r["token_count"], r["is_char"])
        for r in unigram_lm_train(spark, _docs_from_words(spark, words)).collect()
    }
    assert got == _ref_em(words), name


def test_paths_reconstruct_words(spark):
    """Invariant: the final vocabulary must segment every trained word
    type exactly (concatenation identity) — chars are always present,
    so reachability can never be lost."""
    from asr_training_data_pipeline_spark.operators.text_analysis import (
        _ulm_viterbi_path,
    )

    words = CORPORA["english"]
    vocab = {
        r["piece"]: r["token_count"]
        for r in unigram_lm_train(
            spark, _docs_from_words(spark, words)
        ).collect()
    }
    total = sum(vocab.values())
    cost = {p: c / total for p, c in vocab.items()}
    for w in words:
        path = _ulm_viterbi_path(w, cost)
        assert path is not None and path.replace("\x1f", "") == w


def test_empty_corpus_yields_empty_vocab(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars bigint"
    )
    df = unigram_lm_train(spark, empty)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "piece", "token_count", "is_char",
    ]
