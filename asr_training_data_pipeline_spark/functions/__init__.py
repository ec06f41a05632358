from .exact import dsum, davg
from .text import (
    normalize_word_col,
    num_to_words,
    num_to_words_udf,
    tokenize_col,
)

__all__ = [
    "dsum",
    "davg",
    "normalize_word_col",
    "num_to_words",
    "num_to_words_udf",
    "tokenize_col",
]
