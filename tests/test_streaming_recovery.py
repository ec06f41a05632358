"""Checkpoint recovery + exactly-once: a streaming dedup query is
stopped and restarted against the same checkpoint after new (and
partially overlapping) data arrives. The restarted query must resume
from persisted source offsets AND persisted dedup state — each
event_id reaches the sink exactly once across both runs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _run_once(spark, src, sink, chk):
    stream = (
        spark.readStream.schema("event_id long, v long")
        .format("parquet")
        .load(src)
        .dropDuplicates(["event_id"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.parametrize("overlap", [True])
def test_streaming_dedup_exactly_once_across_restart(spark, tmp_path, overlap):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    # run 1: ids 0..99
    spark.range(0, 100).select(
        F.col("id").alias("event_id"), (F.col("id") * 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, sink, chk)
    first = spark.read.parquet(sink)
    assert first.count() == 100

    # new arrival overlapping 50..99, extending to 149
    spark.range(50, 150).select(
        F.col("id").alias("event_id"), (F.col("id") * 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)

    # run 2: SAME checkpoint — resumes source offsets + dedup state
    _run_once(spark, src, sink, chk)
    out = spark.read.parquet(sink)
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == 150, "each id exactly once across both runs"
    assert sorted(ids) == list(range(150))
    # values intact (v = 7*id), i.e. rows came through the pipeline
    assert out.filter(F.col("v") != F.col("event_id") * 7).count() == 0
