"""As-of and range joins — ordered joins Spark lacks as built-ins
(SURVEY §2.4 note), implemented with the scalable single-shuffle
patterns rather than theta-join nested loops.

As-of join (union-merge pattern): tag both sides, union, ONE window
over (key, time) carrying the right side's last value forward, keep
left rows. Cost = one hash shuffle on the key + one per-key sort —
same as a sort-merge join; no range explosion, no per-row probe.
DuckDB's native ``ASOF JOIN`` provides the exact oracle.

Range/interval join (bucket pattern): map both sides to coarse
buckets so the range predicate becomes an equi-join on bucket id plus
a residual filter — candidate pairs shrink from |L|·|R| to pairs
sharing a bucket. The bucket width is the max interval width, so each
interval lands in ≤ 2 buckets (explode factor 2, constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For every left row: the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``key`` (backward
    as-of). Left rows with no prior right row keep nulls.

    One union + one window = one shuffle on ``key``; the right side's
    values are carried forward with ``last(..., ignorenulls=True)``
    over rows ≤ current. Ties (equal timestamps): the right row sorts
    BEFORE the left row (side tag 0 < 1), so an exactly-equal
    timestamp matches — ASOF semantics.
    """
    lt = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in right_vals],
    )
    rt = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
    )
    merged = lt.unionByName(rt)
    w = (
        W.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return carried.filter(F.col("side") == 1).drop(
        "k", "t", "side", *[f"r_{c}" for c in right_vals]
    )


_ASOF_SQL = """
SELECT e.event_id,
       e.user_id,
       epoch_us(e.ts) AS ts_us,
       o.o_orderkey AS asof_orderkey,
       o.o_totalprice AS asof_totalprice
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
ORDER BY e.event_id
"""


@register("asof_join_orders", oracle=_ASOF_SQL, tags=("join", "asof"))
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the user's latest order
    at-or-before the event time. Oracle: DuckDB's native ASOF JOIN.

    DuckDB ASOF breaks orderdate ties by an unspecified row choice;
    orders are deduplicated to one row per (custkey, orderdate) —
    max orderkey, deterministically on both sides — so the as-of
    match is unique and the comparison exact.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    o1 = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    joined = asof_join(
        ev,
        o1.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_vals=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_totalprice").alias("asof_totalprice"),
    ).orderBy("event_id")


_RANGE_BUCKET_US = 3_600_000_000  # 1 hour buckets == max window width

_RANGE_SQL = """
SELECT a.event_id AS event_a, b.event_id AS event_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
ORDER BY event_a, event_b
"""


@register("range_join_events", oracle=_RANGE_SQL, tags=("join", "range"))
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: same-user event pairs within 1 hour, as an
    equi-join on (user_id, hour-bucket) with the left side exploded to
    its bucket and the next (each 1 h window spans ≤ 2 buckets), then
    the exact range filter on the residual.

    Scale: candidates = pairs sharing a bucket (2× explode), vs the
    |per-user|² of a naive theta join; the shuffle key includes the
    bucket so hot users spread across time.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    a = ev.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        F.col("ts_us").alias("ts_a"),
        F.explode(
            F.array(
                (F.col("ts_us") / _RANGE_BUCKET_US).cast("long"),
                (F.col("ts_us") / _RANGE_BUCKET_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        "user_id",
        F.col("ts_us").alias("ts_b"),
        (F.col("ts_us") / _RANGE_BUCKET_US).cast("long").alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") - F.col("ts_a") <= _RANGE_BUCKET_US)
        )
        .select(
            "event_a", "event_b", (F.col("ts_b") - F.col("ts_a")).alias("delta_us")
        )
        .orderBy("event_a", "event_b")
    )
