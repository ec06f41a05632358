"""LCS sequence-alignment join (SURVEY §2.4 J1/J2) — the reference's
core operator: an ordered subsequence-alignment "join" between the
transcript word sequence and the ASR word sequence
(/root/reference/claude_research_optimal.py:283-289, 365-371).

No relational operator expresses order-sensitive LCS, so this is a
cogrouped ``applyInPandas``: each pair's two token sequences meet in
one pandas group, ``difflib.SequenceMatcher(autojunk=False)`` (the
exact algorithm the reference calls — parity by construction) emits
equal blocks, and blocks of length ≥ min_run become EqualRun rows
(bi*/ai* half-open index spans, claude_research_optimal.py:104-106).

Scale: pairs are independent — the cogroup shuffles each pair's
tokens to one task and alignment parallelizes across pairs. Token
payloads are small (norms only). Skew = one enormous document; the
mitigation at 100 TB is chunked alignment (align per chapter /
window), which composes from this same operator over a finer pair
key.
"""

from __future__ import annotations

import difflib

import pandas as pd

from pyspark.sql import DataFrame

EQUAL_RUNS_SCHEMA = "pair_id long, bi0 long, bi1 long, ai0 long, ai1 long"


def lcs_equal_runs(
    book: DataFrame,
    asr: DataFrame,
    min_run: int = 4,
    book_order: str = "pos",
    asr_order: str = "idx",
) -> DataFrame:
    """J1: equal runs of length ≥ min_run between two keyed token
    sequences. ``book``: (pair_id, pos, norm); ``asr``:
    (pair_id, idx, norm)."""

    def align(key: tuple, book_pdf: pd.DataFrame, asr_pdf: pd.DataFrame) -> pd.DataFrame:
        a = book_pdf.sort_values(book_order)["norm"].tolist()
        b = asr_pdf.sort_values(asr_order)["norm"].tolist()
        if not a or not b:
            return pd.DataFrame(columns=["pair_id", "bi0", "bi1", "ai0", "ai1"])
        sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
        rows = [
            (key[0], i1, i2, j1, j2)
            for tag, i1, i2, j1, j2 in sm.get_opcodes()
            if tag == "equal" and (i2 - i1) >= min_run
        ]
        return pd.DataFrame(rows, columns=["pair_id", "bi0", "bi1", "ai0", "ai1"])

    return (
        book.groupBy("pair_id")
        .cogroup(asr.groupBy("pair_id"))
        .applyInPandas(align, EQUAL_RUNS_SCHEMA)
    )


def lcs_pairs_consensus(
    clip_words: DataFrame,
    validator_words: DataFrame,
    key_cols: tuple[str, str] = ("pair_id", "group_id"),
) -> DataFrame:
    """J2: consensus alignment between an assembled clip's words and
    the validator's re-transcription, min_run=1 (every equal block
    counts, claude_research_optimal.py:365-371). Keyed by
    (pair_id, group_id) — one clip per group."""

    def align(key: tuple, cw: pd.DataFrame, vw: pd.DataFrame) -> pd.DataFrame:
        a = cw.sort_values("word_pos")["norm"].tolist()
        b = vw.sort_values("start")["norm"].tolist()
        if not a or not b:
            return pd.DataFrame(
                columns=["pair_id", "group_id", "bi0", "bi1", "ai0", "ai1"]
            )
        sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
        rows = [
            (key[0], key[1], i1, i2, j1, j2)
            for tag, i1, i2, j1, j2 in sm.get_opcodes()
            if tag == "equal"
        ]
        return pd.DataFrame(
            rows, columns=["pair_id", "group_id", "bi0", "bi1", "ai0", "ai1"]
        )

    return (
        clip_words.groupBy(*key_cols)
        .cogroup(validator_words.groupBy(*key_cols))
        .applyInPandas(
            align, "pair_id long, group_id long, bi0 long, bi1 long, ai0 long, ai1 long"
        )
    )
