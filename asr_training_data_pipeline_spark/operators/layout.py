"""Data-layout planning operators (north-star extension, SURVEY
§2.12): Z-order (Morton-curve) clustering of the events table — the
mechanism behind `OPTIMIZE ZORDER BY` in lakehouse engines.

Why it matters at 100 TB: parquet scans prune FILES by min/max column
stats. A table laid out in ingestion order has near-useless stats for
any column but the ingestion key, so a 2-D predicate
(`user_id = ? AND ts BETWEEN ?`) reads everything. Interleaving the
bits of both dimensions into one sort key co-locates rows that are
close in BOTH dimensions, so every file covers a small rectangle of
the (user, time) plane and min/max stats prune most files for 2-D
predicates.

Everything here is exact integer bit arithmetic — the DuckDB oracle
evaluates the same generated interleave expression, so the layout
plan (file assignment + per-file stat rectangles) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

_Z_BITS = 16  # bits kept per dimension (32-bit z-value)
_Z_FILES = 64  # target file count for the layout plan


def _z_sql(a: str, b: str, spark_syntax: bool) -> str:
    """Morton interleave a⊗b as a generated sum (bit positions are
    disjoint, so + ≡ |). Same arithmetic in both engines; only the
    shift syntax differs (Spark: shiftleft/shiftright fns — the
    operator forms are reserved; DuckDB: << >>)."""
    terms = []
    for i in range(_Z_BITS):
        if spark_syntax:
            terms.append(
                f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})"
                f" + shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})"
            )
        else:
            terms.append(
                f"((({a} >> {i}) & 1) << {2 * i})"
                f" + ((({b} >> {i}) & 1) << {2 * i + 1})"
            )
    return " + ".join(terms)


_ZORDER_SQL = f"""
WITH e AS (
  SELECT event_id, user_id,
         epoch_us(ts) // 60000000 AS ts_min
  FROM events
),
r AS (SELECT min(user_id) AS min_u, max(user_id) AS max_u,
             min(ts_min) AS min_t, max(ts_min) AS max_t
      FROM e),
n AS (
  SELECT event_id, user_id, ts_min,
         cast((cast(user_id - min_u AS hugeint) * 65535)
              // greatest(max_u - min_u, 1) AS bigint) AS u16,
         cast((cast(ts_min - min_t AS hugeint) * 65535)
              // greatest(max_t - min_t, 1) AS bigint) AS t16
  FROM e, r
),
z AS (
  SELECT event_id, user_id, ts_min,
         {_z_sql("u16", "t16", spark_syntax=False)} AS zval
  FROM n
),
f AS (
  SELECT user_id, ts_min,
         cast(ntile({_Z_FILES}) OVER (ORDER BY zval, event_id) AS bigint) AS file_id
  FROM z
)
SELECT file_id,
       cast(count(*) AS bigint) AS n_rows,
       min(user_id) AS min_uid, max(user_id) AS max_uid,
       min(ts_min) AS min_tsmin, max(ts_min) AS max_tsmin,
       cast((max(user_id) - min(user_id) + 1)
            * (max(ts_min) - min(ts_min) + 1) AS bigint) AS stat_rectangle
FROM f
GROUP BY file_id
ORDER BY file_id
"""


@register("zorder_layout_events", oracle=_ZORDER_SQL, tags=("layout", "scale"))
def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout plan for the events table: Morton-interleave
    (user_id ⊗ ts-minute) into a 32-bit sort key, range-assign rows to
    {files} target files along the curve, and report each file's
    min/max stat RECTANGLE — the (user × time) area a scan planner
    cannot prune when that file's stats straddle a predicate. Small
    rectangles = effective 2-D pruning; `tests/test_layout.py` pins
    that this beats the ingestion-order layout by a wide margin.

    Scale: the z-value is pure codegen'd integer math, and the file
    assignment is an exact DISTRIBUTED ntile — no global-order window
    (which would drag the table onto one partition). A tiny histogram
    over the top z-bits yields every coarse bucket's global offset
    (cumsum over ≤4096 rows); each row's global position is then
    offset + its rank WITHIN its bucket, a window partitioned by
    bucket — the heavy sort shards across buckets exactly like the
    range exchange `OPTIMIZE ZORDER` pays. The oracle uses plain
    ntile: identical output, because the bucket is a prefix of the
    sort key. Per-file stats are one map-side-combined aggregation.
    """
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        (F.floor(F.unix_micros("ts") / 60000000)).cast("long").alias("ts_min"),
    )
    # min-max normalize BOTH dimensions onto the full 16-bit range
    # before interleaving — raw values would waste interleave bits
    # (user_id has ~8 significant bits, epoch-minutes ~25) and let one
    # dimension dominate the curve. Exact integer math: one 1-row agg
    # broadcast back over the scan. The ×65535 runs in decimal(38,0)
    # (oracle: hugeint) so an id RANGE past 2^47 — e.g. snowflake-style
    # 2^53 ids — can't overflow bigint and abort the job under ANSI;
    # the quotient is back in [0, 65535] and casts down safely.
    r = e.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min("ts_min").alias("min_t"),
        F.max("ts_min").alias("max_t"),
    )
    norm = e.crossJoin(F.broadcast(r)).select(
        "event_id",
        "user_id",
        "ts_min",
        F.expr(
            "cast(cast(user_id - min_u AS decimal(38,0)) * 65535"
            " div greatest(max_u - min_u, 1) AS bigint)"
        ).alias("u16"),
        F.expr(
            "cast(cast(ts_min - min_t AS decimal(38,0)) * 65535"
            " div greatest(max_t - min_t, 1) AS bigint)"
        ).alias("t16"),
    )
    z = norm.select(
        "event_id",
        "user_id",
        "ts_min",
        F.expr(_z_sql("u16", "t16", spark_syntax=True)).alias("zval"),
    ).withColumn("zbucket", F.shiftright("zval", 20))
    # histogram of coarse buckets (≤4096 rows) → exclusive prefix sums
    h = z.groupBy("zbucket").agg(F.count("*").alias("bn"))
    hw = W.orderBy("zbucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = h.select(
        "zbucket",
        F.coalesce(F.sum("bn").over(hw), F.lit(0)).alias("offset"),
        F.sum("bn").over(W.partitionBy()).alias("n_total"),
    )
    rk = F.row_number().over(
        W.partitionBy("zbucket").orderBy("zval", "event_id")
    )
    pos = (F.col("offset") + rk).alias("pos")
    ranked = z.join(F.broadcast(offsets), "zbucket").select(
        "user_id", "ts_min", "n_total", pos
    )
    # exact SQL ntile(k) semantics: the first n % k tiles get
    # ceil(n/k) rows, the rest floor(n/k)
    # all-integer `div` arithmetic: exact at any row count (a double
    # division could floor wrong past 2^53)
    file_id = F.expr(
        f"""CASE WHEN pos <= (n_total % {_Z_FILES}) * (n_total div {_Z_FILES} + 1)
             THEN (pos - 1) div (n_total div {_Z_FILES} + 1)
             ELSE n_total % {_Z_FILES}
                  + (pos - (n_total % {_Z_FILES}) * (n_total div {_Z_FILES} + 1) - 1)
                    div greatest(n_total div {_Z_FILES}, 1)
            END + 1"""
    )
    f = ranked.select(
        "user_id", "ts_min", file_id.cast("bigint").alias("file_id")
    )
    return (
        f.groupBy("file_id")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("user_id").alias("min_uid"),
            F.max("user_id").alias("max_uid"),
            F.min("ts_min").alias("min_tsmin"),
            F.max("ts_min").alias("max_tsmin"),
            (
                (F.max("user_id") - F.min("user_id") + 1)
                * (F.max("ts_min") - F.min("ts_min") + 1)
            )
            .cast("bigint")
            .alias("stat_rectangle"),
        )
        .orderBy("file_id")
    )
