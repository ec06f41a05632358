"""S3 inference-scan plumbing: the deterministic stub backend must
produce the same token structure as the declarative fixture (same
kept words, same dense indexes) with valid monotone timings. Exact
timing parity is NOT claimed — the stub hashes with sha1 in the
worker, the fixture with xxhash64 in the JVM (both deterministic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.sources import fixtures
from asr_training_data_pipeline_spark.sources.asr_scan import asr_scan
from asr_training_data_pipeline_spark.sources.tables import load_table


def test_stub_scan_matches_fixture_structure(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    scan = asr_scan(spark, docs).toPandas()
    fix = (
        fixtures.asr_words(spark, sf_dir)
        .join(docs.select(F.col("doc_id").alias("pair_id")), "pair_id")
        .toPandas()
    )
    import pandas.testing as pdt

    key = ["pair_id", "idx", "text", "norm"]
    s = scan[key].sort_values(["pair_id", "idx"]).reset_index(drop=True)
    f = fix[key].sort_values(["pair_id", "idx"]).reset_index(drop=True)
    pdt.assert_frame_equal(s, f, check_dtype=False)


def test_stub_scan_timings_valid(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    pdf = asr_scan(spark, docs).toPandas().sort_values(["pair_id", "idx"])
    assert (pdf.end > pdf.start).all()
    assert pdf.confidence.between(0.4, 1.001).all()
    for _, g in pdf.groupby("pair_id"):
        assert (g.start.diff().dropna() > 0).all()  # strictly advancing
