"""Custom stateful streaming (SURVEY §2.10, row 2): the reference's
per-group incremental processing loop
(/root/reference/claude_research_optimal.py:481-670) as a
per-key stateful operator — ``applyInPandasWithState`` holding a
running accumulator per key across micro-batches.

The registered query keeps an exact batch oracle on purpose: running
per-user totals emitted in update mode converge, once the bounded
stream drains, to precisely ``GROUP BY user_id`` — so the driver's
hash comparison pins the stateful path against plain SQL. Float sums
mirror functions.exact (fixed-scale integer micros, half-up), making
the emitted doubles order- and batch-boundary-insensitive.

At scale this is the shape for per-key model state, dedup bloom
state, or incremental session assembly over Kafka; state lives in the
state store (RocksDB on a real cluster), keyed and partitioned by the
group key, with watermark-driven eviction for unbounded keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.exact import dsum_sql
from ..registry import register
from .windows import _events_stream, _run_to_memory

_OUT_SCHEMA = "user_id long, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, micros bigint"


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-key running (count, exact-decimal sum) over the
    events stream; each micro-batch updates the key's state and emits
    the new totals."""
    ev = _events_stream(spark, sf_dir).select("user_id", "value")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # half-up fixed-scale accumulation == cast(decimal(27,6)) sum
            micros += int((pdf["value"] * 1_000_000 + 0.5).astype("int64").sum())
        state.update((n, micros))
        yield pd.DataFrame(
            [(key[0], n, micros / 1_000_000.0)],
            columns=["user_id", "n_events", "sum_value"],
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TOTALS_SQL = f"""
SELECT user_id, count(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("streaming_stateful_totals", oracle=_TOTALS_SQL, tags=("streaming", "stateful"))
def streaming_stateful_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState end-to-end with an EXACT SQL oracle: the
    final per-key update after the bounded stream drains equals the
    batch GROUP BY (latest update per key selected by max n_events —
    totals are monotone)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    out = _run_to_memory(running_user_totals(spark, sf_dir), mode="update")
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
        .orderBy("user_id")
    )


# transformWithStateInPandas (the Spark 4 arbitrary-state API) is the
# natural upgrade for the operator above, but its driver worker needs
# google.protobuf, which this container lacks — attempted and removed;
# applyInPandasWithState covers the stateful contract here.
