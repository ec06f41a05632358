"""Golden tests for the scalar-function layer (SURVEY §2.9)."""

from __future__ import annotations

import pytest

from asr_training_data_pipeline_spark.functions.text import num_to_words

# C2 semantics (claude_research_optimal.py:37-64): English words up to
# billions, 0 and negatives included.
GOLDEN = {
    0: "zero",
    5: "five",
    13: "thirteen",
    19: "nineteen",
    20: "twenty",
    42: "forty two",
    99: "ninety nine",
    100: "one hundred",
    101: "one hundred one",
    999: "nine hundred ninety nine",
    1000: "one thousand",
    1215: "one thousand two hundred fifteen",
    1_000_000: "one million",
    2_000_001: "two million one",
    1_000_000_000: "one billion",
    -7: "negative seven",
}


@pytest.mark.parametrize("n,words", sorted(GOLDEN.items()))
def test_num_to_words_golden(n, words):
    assert num_to_words(n) == words
