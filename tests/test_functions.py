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


def test_sql_function_surface_matches_column_layer(spark):
    """register_sql_functions exposes the scalar layer to spark.sql;
    the SQL UDF bodies must agree with the Column helpers on every
    probe string (same Catalyst expressions, locked here)."""
    from pyspark.sql import functions as F

    from asr_training_data_pipeline_spark.api import register_sql_functions
    from asr_training_data_pipeline_spark.functions.text import (
        normalize_word_col,
        tokenize_col,
        whitespace_tokens_col,
    )

    register_sql_functions(spark)
    probes = [
        "Hello, World!", "Don't-stop", "  ", "", "a-b c", "42", "naïve",
        "MIXED case\tTAB", "x'y-z", "1,000", None,
    ]
    df = spark.createDataFrame([(p,) for p in probes], "x string")
    both = df.select(
        normalize_word_col("x").alias("c_norm"),
        F.expr("normalize_word(x)").alias("s_norm"),
        tokenize_col("x").alias("c_tok"),
        F.expr("tokenize_text(x)").alias("s_tok"),
        whitespace_tokens_col("x").alias("c_ws"),
        F.expr("ws_tokens(x)").alias("s_ws"),
    ).collect()
    for r in both:
        assert r.c_norm == r.s_norm
        assert r.c_tok == r.s_tok
        assert r.c_ws == r.s_ws
    got = spark.sql("SELECT num_to_words('742') AS w").first().w
    from asr_training_data_pipeline_spark.functions.text import num_to_words

    assert got == num_to_words(742)
    assert spark.sql("SELECT num_to_words('x') AS w").first().w is None


def test_create_views_supports_raw_sql_user(spark, sf_dir):
    """create_views is the SQL-user surface: a reference user who
    writes plain spark.sql against the registered views must get the
    SAME frame the DataFrame API produces — locked on the flagship
    word-coverage query end-to-end."""
    import pandas as pd

    from asr_training_data_pipeline_spark.api import REGISTRY, create_views

    s = spark.newSession()
    create_views(s, sf_dir)
    sql_pdf = s.sql(
        """
        SELECT w AS word, cast(count(*) AS bigint) AS n
        FROM (SELECT explode(split(lower(text), ' ')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w ORDER BY n DESC, word
        """
    ).toPandas()
    api_pdf = (
        REGISTRY["word_coverage"].fn(s, sf_dir)
        .orderBy(*REGISTRY["word_coverage"].fn(s, sf_dir).columns)
        .toPandas()
    )
    # same vocabulary surface through both doors (word_coverage's own
    # schema differs; assert on the shared word set + counts)
    assert set(sql_pdf.word) == set(api_pdf[api_pdf.columns[0]])
    assert sql_pdf.n.sum() > 0
    # and the views cover every registered table
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        assert s.sql(f"SELECT count(*) FROM {t}").collect()[0][0] >= 0
