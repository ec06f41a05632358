"""Query registry — the driver contract surface.

Every operator from SURVEY.md §2 is exposed here as a named query:
``REGISTRY[name].fn(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) ``REGISTRY[name].oracle`` — the ANSI/DuckDB SQL the
driver runs side-by-side for the correctness gate.

Design rules that make the oracle comparison exact:

- every computed column is explicitly aliased AND explicitly typed
  (bigint for integers, double for floats) on BOTH sides;
- double *sums/averages* go through fixed-scale decimal
  (:mod:`..functions.exact`) so they are order-insensitive and
  engine-independent; row-level double arithmetic is IEEE-identical
  in both engines and needs no special handling;
- timestamps never leave a query as raw timestamps — they are
  projected to ``unix_micros`` bigints (DuckDB: ``epoch_us``);
- every window is totally ordered (unique tiebreaker column) so
  rank/lag/lead semantics are deterministic.

Scale notes are attached per query: each one states why the plan
holds at 100 TB (broadcast vs shuffle, pushdown, partial aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .functions.exact import davg, davg_sql, dsum, dsum_sql
from .functions.text import (
    NORMALIZE_WORD_SQL,
    normalize_word_col,
    tokenize_col,
    whitespace_tokens_col,
)
from .registry import REGISTRY, QueryDef, register  # noqa: F401 (re-export)
from .sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =====================================================================
# A1 — word coverage (flagship; reference batch_processor.py:17-37)
# =====================================================================

_WORD_COVERAGE_SQL = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY cnt, word
"""


@register("word_coverage", oracle=_WORD_COVERAGE_SQL, bench=True, tags=("agg", "text"))
def word_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency table sorted by (count asc, word asc).

    Scale: explode + groupBy(word) is a classic partial-agg shape —
    map-side combine collapses each partition's counts before the
    shuffle, so shuffle volume is O(vocabulary), not O(tokens).
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(whitespace_tokens_col("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("cnt"), F.asc("word"))
    )


# =====================================================================
# Relational core — aggregation (TPC-H Q1 shape; SURVEY §2.5)
# =====================================================================

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_SQL, bench=True, tags=("agg",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2 group keys, 8 aggregates, date filter.

    Scale: filter pushes to the parquet scan; hash-agg with partial
    aggregation means the shuffle carries 6 groups, not 600M rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (dsum("l_discount") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_FILTER_PROJ_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
       l_extendedprice * l_discount AS disc_amount
FROM lineitem
WHERE l_shipdate >= timestamp '1996-01-01'
  AND l_shipdate < timestamp '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("filter_pushdown_projection", oracle=_FILTER_PROJ_SQL, tags=("filter",))
def filter_pushdown_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + narrow projection (TPC-H Q6 shape; SURVEY
    §2.3 F1-F8 analog).

    Scale: all four predicates and the 5-column projection reach the
    parquet reader (PushedFilters/ReadSchema) — the scan reads a
    fraction of a 100 TB table's bytes. Row-level arithmetic stays in
    whole-stage codegen.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amount"),
    )


_REGIONAL_REVENUE_SQL = f"""
SELECT r_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate < timestamp '1998-01-01'
GROUP BY r_name
ORDER BY r_name
"""


@register("join_broadcast_dims", oracle=_REGIONAL_REVENUE_SQL, bench=True, tags=("join",))
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join: revenue per region (TPC-H Q5 shape).

    Scale: region/nation are broadcast (explicit hint), customer is
    broadcast under the 64 MB threshold at test SFs and shuffles at
    100 TB; the only unavoidable big shuffle is lineitem⋈orders on
    orderkey. The date filter pushes into the orders scan BEFORE the
    join, shrinking the build side.
    """
    region = F.broadcast(_t(spark, sf_dir, "region"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    dims = (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .select("r_name", "c_custkey")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("r_name")
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


@register("semi_join_customers", oracle=_SEMI_JOIN_SQL, tags=("join",))
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / left-semi join (SURVEY §2.4 note: engine exposes the
    join types the reference lacks).

    Scale: semi-join never duplicates the left side and the probe
    list is distinct-able; Catalyst/AQE turn it into a broadcast when
    the filtered orders side is small.
    """
    customer = _t(spark, sf_dir, "customer")
    f_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        f_orders, customer.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@register("anti_join_customers", oracle=_ANTI_JOIN_SQL, tags=("join",))
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS / left-anti join: customers who never placed an
    urgent order (non-degenerate at every SF)."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_COND_AGG_SQL = f"""
SELECT o_orderstatus,
       count(*) AS n_orders,
       cast(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS bigint) AS n_urgent,
       {dsum_sql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END")} AS urgent_revenue,
       max(o_totalprice) AS max_price,
       min(o_totalprice) AS min_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("conditional_agg_orders", oracle=_COND_AGG_SQL, tags=("agg",))
def conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counters — the reference's kept/rejected tallies
    (SURVEY §2.5 A4/A7) as sum(CASE WHEN ...)."""
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("n_urgent"),
            dsum(F.when(urgent, F.col("o_totalprice")).otherwise(0.0), "urgent_revenue"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_revenue", oracle=_ROLLUP_SQL, tags=("agg",))
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine extension beyond the
    reference's flat aggregates, SURVEY §2.5 note)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows")
    )


_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("distinct_counts", oracle=_DISTINCT_SQL, tags=("agg",))
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase under the hood).

    Scale: two distincts on different keys force an Expand operator —
    acceptable here; for 100 TB dashboards use approx_count_distinct
    (HLL, single pass, no expand)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# =====================================================================
# Windows / top-k (SURVEY §2.6-2.7)
# =====================================================================

_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             cast(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS bigint) AS rn
      FROM orders)
WHERE rn <= 3
"""


@register("topk_orders_per_cust", oracle=_TOPK_SQL, bench=True, tags=("window",))
def topk_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — W2 longest-span-top-1 generalized
    to top-k. Unique tiebreaker (orderkey) makes ranking total.

    Scale: rank inside each partition after a single hash shuffle on
    o_custkey; AQE splits skewed customers. No global sort.
    """
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_SET_OPS_SQL = """
SELECT c_custkey FROM (
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT c_custkey FROM customer WHERE c_acctbal > 7000)
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
INTERSECT
SELECT o_custkey FROM orders
"""


@register("set_ops_segments", oracle=_SET_OPS_SQL, tags=("setop",))
def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT / INTERSECT chain (SURVEY §2.8 — absent in the
    reference, built-in here)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    machinery = customer.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    has_order = orders.select(F.col("o_custkey").alias("c_custkey"))
    return (
        building.union(rich).distinct().subtract(machinery).intersect(has_order)
    )


# =====================================================================
# Scalar function layer (SURVEY §2.9)
# =====================================================================

_NORM_FIRST = NORMALIZE_WORD_SQL.format(col="tokens[1]")
_NORM_LAST = NORMALIZE_WORD_SQL.format(col="tokens[-1]")

_SCALAR_TOKENS_SQL = f"""
SELECT doc_id,
       cast(len(tokens) AS bigint) AS n_tokens,
       tokens[1] AS first_token,
       tokens[-1] AS last_token,
       {_NORM_FIRST} AS norm_first,
       {_NORM_LAST} AS norm_last
FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9''-]+') AS tokens
      FROM documents)
"""


@register("scalar_normalize_tokens", oracle=_SCALAR_TOKENS_SQL, tags=("scalar", "text"))
def scalar_normalize_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 normalize + C3 tokenize as pure column expressions — no
    Python in the plan (whole-stage codegen end to end)."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokenize_col("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        normalize_word_col(F.element_at(toks, 1)).alias("norm_first"),
        normalize_word_col(F.element_at(toks, -1)).alias("norm_last"),
    )


_MS_SQL = """
SELECT event_id, value AS value_s,
       cast(round(value * 1000) AS bigint) AS value_ms
FROM events
"""


@register("ms_round_convert", oracle=_MS_SQL, tags=("scalar",))
def ms_round_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 seconds→milliseconds int conversion, the reference's
    pervasive int(round(x*1000)) (claude_research_optimal.py:317)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").alias("value_s"),
        F.round(F.col("value") * 1000).cast("bigint").alias("value_ms"),
    )


_JSON_SQL = """
SELECT event_id,
       CASE WHEN json_valid(props)
            THEN try_cast(json_extract_string(props, '$.k') AS bigint)
       END AS prop_k
FROM events
"""


@register("json_extract_props", oracle=_JSON_SQL, tags=("scalar", "json"))
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16 JSON payload access via get_json_object (Jackson-based,
    JVM-side — no Python). try_cast, not cast: a non-numeric payload
    value must yield NULL on both engines, not abort the job under
    ANSI (real props blobs are never uniformly clean)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("prop_k"),
    )


_GUARD_SQL = """
SELECT event_id,
       value / 200 AS conf,
       cast(CASE WHEN value / 200 > 0.75 THEN floor(250 * 0.7)
                 WHEN value / 200 < 0.6  THEN floor(250 * 1.3)
                 ELSE 250 END AS bigint) AS guard_ms
FROM events
"""


@register("case_adaptive_guard", oracle=_GUARD_SQL, tags=("scalar",))
def case_adaptive_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 compute_adaptive_guard
    (claude_research_optimal.py:374-386): high-confidence → 70% of the
    base guard, low-confidence → 130%, else base. Pure when/otherwise
    chain; `value/200` stands in for word confidence on the events
    fixture (straddles both thresholds)."""
    ev = _t(spark, sf_dir, "events")
    conf = F.col("value") / 200
    base = F.lit(250)
    return ev.select(
        "event_id",
        conf.alias("conf"),
        F.when(conf > 0.75, F.floor(base * 0.7))
        .when(conf < 0.6, F.floor(base * 1.3))
        .otherwise(base)
        .cast("bigint")
        .alias("guard_ms"),
    )


_PHONEME_SQL = """
SELECT doc_id, last_word,
       cast(CASE
         WHEN length(last_word) < 3 THEN 0
         WHEN last_word LIKE '%ing' THEN 60
         WHEN right(last_word, 1) IN ('s','z','x','f','v') THEN 50
         WHEN right(last_word, 1) IN ('t','d','k','p','n','m','g') THEN 40
         WHEN right(last_word, 2) IN ('ce','se','ze','ge','ch','sh','th','ng') THEN 50
         ELSE 0
       END AS bigint) AS ext_ms
FROM (SELECT doc_id, (string_split(text, ' '))[-1] AS last_word FROM documents)
"""


@register("phoneme_case_extension", oracle=_PHONEME_SQL, tags=("scalar",))
def phoneme_case_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 phoneme tail-extension CASE
    (claude_research_optimal.py:560-582) — branch ORDER is preserved
    exactly (including that the 'ing' test precedes the single-char
    tests, shadowing 'g'); the reference's dead dge/tch branch is a
    no-op by construction and is documented rather than replicated."""
    docs = _t(spark, sf_dir, "documents")
    lw = F.element_at(F.split(F.col("text"), " "), -1)
    last1 = F.right(lw, F.lit(1))
    last2 = F.right(lw, F.lit(2))
    ext = (
        F.when(F.length(lw) < 3, 0)
        .when(lw.endswith("ing"), 60)
        .when(last1.isin("s", "z", "x", "f", "v"), 50)
        .when(last1.isin("t", "d", "k", "p", "n", "m", "g"), 40)
        .when(last2.isin("ce", "se", "ze", "ge", "ch", "sh", "th", "ng"), 50)
        .otherwise(0)
    )
    return docs.select(
        "doc_id", lw.alias("last_word"), ext.cast("bigint").alias("ext_ms")
    )


_AVG_COALESCE_SQL = f"""
SELECT user_id,
       coalesce({dsum_sql("CASE WHEN event_type = 'error' THEN value END")}
                / nullif(count(CASE WHEN event_type = 'error' THEN value END), 0),
                1.0) AS avg_error_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("avg_confidence_coalesce", oracle=_AVG_COALESCE_SQL, tags=("agg",))
def avg_confidence_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 span-average-with-default: mean over a conditional subset,
    1.0 when the subset is empty (claude_research_optimal.py:524)."""
    ev = _t(spark, sf_dir, "events")
    err_val = F.when(F.col("event_type") == "error", F.col("value"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                dsum(err_val) / F.nullif(F.count(err_val), F.lit(0)),
                F.lit(1.0),
            ).alias("avg_error_value")
        )
        .orderBy("user_id")
    )


# =====================================================================
# Sessionization + neighbor windows (SURVEY §2.6 W1/W3/W4, §2.4 J3/J4)
# =====================================================================

SESSION_GAP_US = 1_800_000_000  # 30 min, in microseconds

_SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), numbered AS (
  SELECT *, cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       {dsum_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("sessionize_events", oracle=_SESSIONIZE_SQL, bench=True, tags=("window", "session"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 gap-bridging sessionization
    (claude_research_optimal.py:291-305): lag → gap flag → running sum
    = session id → per-session aggregates. The reference bridges word
    runs when the time gap ≤ 0.5 s; here the same operator sessionizes
    the events stream with a 30-minute gap.

    Scale: ONE hash shuffle on user_id serves both the window and the
    groupBy (same partitioning reused); per-user data is sorted once.
    Streaming form: session_window(ts, gap) — see streaming/.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            dsum("value", "sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


_TOP_PATHS = 20

_PATHS_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events WHERE event_type IS NOT NULL
), numbered AS (
  SELECT *, cast(sum(CASE WHEN prev_us IS NULL
                            OR ts_us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
  FROM ordered
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM numbered GROUP BY user_id, session_id
)
SELECT path,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_TOP_PATHS}
"""


@register("top_event_paths", oracle=_PATHS_SQL, tags=("window", "session", "events"))
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION PATH MINING: the most common full event-type journeys
    ('login>search>purchase') with session and distinct-user counts —
    the product-analytics companion to event_transition_matrix (that
    one sees single hops; this one whole paths).

    Scale shape: ONE user_id hash shuffle serves the lag window, the
    running-sum session numbering, AND the per-session ordered concat
    (collect_struct + array_sort + join — all JVM-side, the C13
    pattern); the path aggregation then exchanges (path, partial
    count) pairs, map-side combined, and the top-20 is a TakeOrdered.
    NULL event_types are excluded up front (string_agg and
    collect_list disagree about all-NULL groups across engines;
    excluding is also the analytics semantic — an untyped event is not
    a journey step)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "user_id", "event_id", "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    numbered = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint"),
        )
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    paths = numbered.groupBy("user_id", "session_id").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_TOP_PATHS)
    )


_TRANSITION_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
trans AS (
  SELECT prev_type AS src, event_type AS dst
  FROM ordered
  WHERE prev_type IS NOT NULL AND ts_us - prev_us <= {SESSION_GAP_US}
),
cnts AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM trans GROUP BY src, dst),
tot AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS src_total FROM cnts GROUP BY src)
SELECT c.src, c.dst, c.cnt, t.src_total,
       CAST(c.cnt * 1000000 // t.src_total AS BIGINT) AS prob_ppm
FROM cnts c JOIN tot t ON t.src = c.src
ORDER BY c.src, c.dst
"""


@register("event_transition_matrix", oracle=_TRANSITION_SQL, tags=("window", "session", "events"))
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov TRANSITION MATRIX over the event stream: for every
    (src → dst) event-type pair observed within a session (same user,
    gap ≤ the 30-minute sessionize constant), the transition count and
    empirical probability P(dst | src) in exact-integer ppm — the
    behavioral-analytics artifact behind next-event prediction and
    funnel-drop diagnosis.

    Scale: ONE hash shuffle on user_id serves the lag window (the
    sessionize_events partitioning, reused shape); transitions then
    reduce by (src, dst) with map-side combine into a frame bounded by
    |event_types|² rows, and the per-src totals aggregate THAT tiny
    frame — the second pass never touches event rows. At 100 TB the
    only corpus-sized exchange is the per-user window everybody
    already pays for sessionization."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("ts_us") - F.col("prev_us") <= SESSION_GAP_US)
        )
        .select(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
    )
    cnts = trans.groupBy("src", "dst").agg(F.count("*").cast("bigint").alias("cnt"))
    # per-src totals as a window over the ALREADY-REDUCED matrix frame
    # (|event_types|² rows) — a second aggregation joined back would
    # recompute the corpus scan + lag window for the build side
    return (
        cnts.withColumn(
            "src_total",
            F.sum("cnt").over(W.partitionBy("src")).cast("bigint"),
        )
        .select(
            "src",
            "dst",
            "cnt",
            "src_total",
            F.expr("cnt * 1000000 div src_total").alias("prob_ppm"),
        )
        .orderBy("src", "dst")
    )


_BOUNDARY_SQL = """
WITH w AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts))  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
  FROM events
), b AS (
  SELECT user_id, event_id,
         greatest(ts_us - 200000, coalesce(prev_us + 50000, 0)) AS s_us,
         least(ts_us + 300000, coalesce(next_us - 100000, ts_us + 300000)) AS e_us
  FROM w
)
SELECT user_id, event_id, s_us,
       CASE WHEN e_us <= s_us THEN s_us + 1000 ELSE e_us END AS e_us
FROM b
"""


@register("lag_lead_boundaries", oracle=_BOUNDARY_SQL, tags=("window",))
def lag_lead_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+C6: neighbor-bounded boundary math — start padded left but
    clamped by the previous neighbor + guard; end padded right but
    clamped by the next neighbor - guard; degenerate spans repaired to
    1 ms, exactly like claude_research_optimal.py:527-556,584-585
    (pads scaled to the events fixture, microsecond arithmetic)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    b = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn("next_us", F.lead("ts_us").over(w))
        .select(
            "user_id",
            "event_id",
            F.greatest(
                F.col("ts_us") - 200000, F.coalesce(F.col("prev_us") + 50000, F.lit(0))
            ).alias("s_us"),
            F.least(
                F.col("ts_us") + 300000,
                F.coalesce(F.col("next_us") - 100000, F.col("ts_us") + 300000),
            ).alias("e_us"),
        )
    )
    return b.select(
        "user_id",
        "event_id",
        "s_us",
        F.when(F.col("e_us") <= F.col("s_us"), F.col("s_us") + 1000)
        .otherwise(F.col("e_us"))
        .alias("e_us"),
    )


_SEQPOS_SQL = """
SELECT user_id, event_id,
       cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS bigint) AS pos
FROM events
"""


@register("sequence_position", oracle=_SEQPOS_SQL, tags=("window",))
def sequence_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: 0-based position of each element in its ordered sequence
    (the reference's ASRWord.idx, claude_research_optimal.py:255)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


_TOP1_SQL = """
SELECT user_id, event_id, value
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


@register("longest_span_top1", oracle=_TOP1_SQL, tags=("window",))
def longest_span_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: argmax-per-group with deterministic tiebreak — the
    reference's 'longest validator span' pick
    (claude_research_optimal.py:504-508)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


_FIRST_MATCH_SQL = """
SELECT user_id, event_type, value AS first_value
FROM (SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


@register("first_match_confidence", oracle=_FIRST_MATCH_SQL, tags=("window", "join"))
def first_match_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 first-match semantics: the reference scans used words in
    order and takes the FIRST with an equal norm
    (claude_research_optimal.py:515-524) — an O(n·m) loop there;
    here a row_number()==1 pick after one shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("value").alias("first_value"))
    )



# ---------------------------------------------------------------------
# Referential-integrity audit (ingest validation over the star schema)
# ---------------------------------------------------------------------

_FK_RELS = (
    # (name, child table, fk col, parent table, pk col)
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
)

_FK_SQL = " UNION ALL ".join(
    f"""
SELECT '{name}' AS relationship,
       cast(count(*) AS bigint) AS n_rows,
       cast(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_null_fk,
       cast(sum(CASE WHEN c.{fk} IS NOT NULL AND p.{pk} IS NULL
                THEN 1 ELSE 0 END) AS bigint) AS n_orphans
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{fk} = p.{pk}"""
    for name, child, fk, parent, pk in _FK_RELS
)
_FK_SQL = f"""
SELECT relationship, n_rows, n_null_fk, n_orphans,
       (n_null_fk = 0 AND n_orphans = 0) AS ok
FROM ({_FK_SQL})
ORDER BY relationship
"""


@register("fk_integrity_audit", oracle=_FK_SQL, tags=("relational", "audit"))
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema — the ingest
    validation a warehouse runs before promoting a load: per declared
    FK relationship, the child row count, NULL foreign keys, and
    orphans (non-NULL keys with no parent).

    Scale: each check is child-scan + anti-probe against the DISTINCT
    parent-key set — the dimension keys broadcast (nation/supplier/
    part/customer), and the one fact-to-fact check (lineitem→orders)
    shuffles bare keys with map-side distinct; counts aggregate to
    five rows. No bodies move."""
    import functools

    outs = []
    for name, child, fk, parent, pk in _FK_RELS:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("k"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_p", F.lit(True))
        )
        j = c.join(p, "k", "left")
        outs.append(
            j.agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_null_fk"),
                F.sum(
                    F.when(F.col("k").isNotNull() & F.col("_p").isNull(), 1)
                    .otherwise(0)
                )
                .cast("bigint")
                .alias("n_orphans"),
            )
        )
    u = functools.reduce(lambda a, b: a.unionAll(b), outs)
    return u.select(
        "relationship",
        "n_rows",
        "n_null_fk",
        "n_orphans",
        ((F.col("n_null_fk") == 0) & (F.col("n_orphans") == 0)).alias("ok"),
    ).orderBy("relationship")

from .registry import bench_queries, oracles, queries  # noqa: E402,F401


# =====================================================================
# Coverage completions: J5, C2, C13, C14, A6, cube (SURVEY §2)
# =====================================================================

_PAIRING_SQL = """
WITH a AS (SELECT doc_id AS audio_id,
                  row_number() OVER (ORDER BY doc_id) AS pos
           FROM documents WHERE doc_id % 2 = 0),
     t AS (SELECT doc_id AS text_id,
                  row_number() OVER (ORDER BY doc_id) AS pos
           FROM documents WHERE doc_id % 2 = 1)
SELECT cast(a.pos AS bigint) AS pos, audio_id, text_id
FROM a JOIN t ON a.pos = t.pos
ORDER BY pos
"""


@register("positional_pairing", oracle=_PAIRING_SQL, tags=("join",))
def positional_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: zip two ordered manifests by position — the reference pairs
    audio and transcript files by upload order (gui.py:35-38,
    batch_processor.py:198-205). The single-partition window is fine
    by construction: a pairing manifest is CLI/UI-sized metadata, the
    100 TB payload sits behind the paths, not in them."""
    docs = _t(spark, sf_dir, "documents")
    w = W.orderBy("doc_id")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("audio_id"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
    t = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("text_id"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
    return a.join(t, "pos").select("pos", "audio_id", "text_id").orderBy("pos")


_ONES_SQL = (
    "['zero','one','two','three','four','five','six','seven','eight','nine',"
    "'ten','eleven','twelve','thirteen','fourteen','fifteen','sixteen',"
    "'seventeen','eighteen','nineteen']"
)
_TENS_SQL = (
    "['zero','ten','twenty','thirty','forty','fifty','sixty','seventy',"
    "'eighty','ninety']"
)

_NUM_WORDS_SQL = f"""
SELECT p_partkey, p_size,
       CASE WHEN p_size < 20 THEN {_ONES_SQL}[p_size + 1]
            ELSE {_TENS_SQL}[(p_size // 10) + 1]
                 || CASE WHEN p_size % 10 > 0
                         THEN {_ONES_SQL}[(p_size % 10) + 1] ELSE '' END
       END AS size_words
FROM part
ORDER BY p_partkey
"""


@register("num_to_words_sizes", oracle=_NUM_WORDS_SQL, tags=("scalar", "udf"))
def num_to_words_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 _num_to_words (claude_research_optimal.py:37-64) as the one
    genuine Python scalar UDF, applied to part sizes. The oracle
    reconstructs the bounded domain (1-50) with SQL list indexing —
    the full billions-range semantics are pinned by the golden unit
    test against the reference algorithm (tests/test_functions.py)."""
    from .functions.text import num_to_words_udf

    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_size",
        num_to_words_udf(F.col("p_size").cast("string")).alias("size_words"),
    ).orderBy("p_partkey")


_GROUP_CONCAT_SQL = """
SELECT user_id,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS type_seq
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("group_concat_ordered", oracle=_GROUP_CONCAT_SQL, tags=("agg", "text"))
def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13 clip-text materialization (claude_research_optimal.py:658):
    ordered string concat per group — collect structs, array_sort by
    the (unique) order key, project, join. All JVM-side."""
    ev = _t(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.unix_micros("ts").alias("o1"), "event_id", "event_type")
                )
            ),
            lambda s: s["event_type"],
        ),
        " ",
    )
    return (
        ev.groupBy("user_id").agg(seq.alias("type_seq")).orderBy("user_id")
    )


_DATE_FMT_SQL = """
SELECT event_id,
       strftime(ts, '%H:%M:%S') AS log_time,
       strftime(ts, '%Y%m%d_%H%M%S') AS dir_stamp
FROM events
ORDER BY event_id
"""


@register("timestamp_format", oracle=_DATE_FMT_SQL, tags=("scalar",))
def timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: the reference's two strftime usages — log line times
    (claude_research_optimal.py:28) and output-dir stamps
    (gui.py:14-15) — as date_format column expressions (UTC pinned
    in the session so both engines agree)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "HH:mm:ss").alias("log_time"),
        F.date_format("ts", "yyyyMMdd_HHmmss").alias("dir_stamp"),
    ).orderBy("event_id")


_VOTE_SQL = """
SELECT event_id,
       cast((CASE WHEN value > 50 THEN 1 ELSE 0 END
           + CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
           + CASE WHEN epoch_us(ts) % 2 = 0 THEN 1 ELSE 0 END) AS bigint) AS votes,
       (CASE WHEN value > 50 THEN 1 ELSE 0 END
      + CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
      + CASE WHEN epoch_us(ts) % 2 = 0 THEN 1 ELSE 0 END) >= 2 AS leak
FROM events
ORDER BY event_id
"""


@register("leak_vote_2of3", oracle=_VOTE_SQL, tags=("scalar",))
def leak_vote_2of3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 acoustic-leak 2-of-3 vote (claude_research_optimal.py:225-226):
    three boolean signals cast to ints, summed, thresholded."""
    ev = _t(spark, sf_dir, "events")
    b1 = F.when(F.col("value") > 50, 1).otherwise(0)
    b2 = F.when(F.col("event_type") == "error", 1).otherwise(0)
    b3 = F.when(F.unix_micros("ts") % 2 == 0, 1).otherwise(0)
    votes = b1 + b2 + b3
    return ev.select(
        "event_id",
        votes.cast("bigint").alias("votes"),
        (votes >= 2).alias("leak"),
    ).orderBy("event_id")


_CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_quantities", oracle=_CUBE_SQL, tags=("agg",))
def cube_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both group keys (all 2ⁿ grouping sets) — completes
    the grouping-sets family next to rollup_revenue (SURVEY §2.5
    note)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows")
    )


_MIN_COST_SUPPLIER_SQL = """
WITH partsupp_like AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT p_partkey, s_suppkey, ps_supplycost
FROM part
JOIN partsupp_like ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
WHERE ps_supplycost = (SELECT min(ps2.ps_supplycost)
                       FROM partsupp_like ps2
                       WHERE ps2.ps_partkey = p_partkey)
ORDER BY p_partkey, s_suppkey
"""


@register("correlated_min_subquery", oracle=_MIN_COST_SUPPLIER_SQL, tags=("join", "subquery"))
def correlated_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-subquery — suppliers matching the
    per-part minimum supply cost. No partsupp table in the fixtures,
    so a deterministic stand-in is derived from lineitem
    (ps_supplycost = min extended price seen for that part+supplier;
    min is order-insensitive, so the oracle is exact).
    Decorrelated the way Catalyst would: per-part min as an aggregate
    joined back (no per-row subquery execution at scale). Also pinned
    by test_relational_extra.py against a pandas recomputation.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    partsupp = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("ps_supplycost"))
    )
    min_cost = partsupp.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        partsupp.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "ps_supplycost")
        .orderBy("p_partkey", "s_suppkey")
    )


_Q3_SQL = f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '1997-06-01'
  AND l_shipdate > timestamp '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_SQL, tags=("join", "agg", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + revenue agg + top-10.
    The total order (revenue DESC, unique l_orderkey) makes the LIMIT
    deterministic; revenue routes through exact decimal so the sort
    key is engine-independent.

    Scale: customer filter prunes before the join; orders⋈lineitem
    co-shuffles on orderkey; the top-k is a TakeOrdered, no full sort.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q5_SQL = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate < timestamp '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL, tags=("join", "agg"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with the local-supplier
    constraint (customer and supplier share a nation) + per-nation
    revenue.

    Scale: region/nation/supplier broadcast (small dims); the only
    co-shuffle is orders⋈lineitem on orderkey; the nationkey equality
    rides the supplier broadcast as an extra join condition instead of
    forcing another exchange."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_CUST_ORDER_DIST_SQL = """
SELECT n_orders, cast(count(*) AS bigint) AS n_custs
FROM (SELECT c_custkey, cast(count(o_orderkey) AS bigint) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY n_orders
ORDER BY n_custs DESC, n_orders DESC
"""


@register("cust_order_distribution", oracle=_CUST_ORDER_DIST_SQL, tags=("join", "agg"))
def cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation —
    customers by order count including the zero-order bucket (the
    outer join's null side, which an inner join would silently drop).

    Scale: one shuffle on custkey for join+first agg (co-partitioned),
    second agg over a tiny distribution table."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").cast("bigint").alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("n_orders"))
    )


_RFM_SQL = """
WITH pc AS (
  SELECT o_custkey AS ck,
         CAST(COALESCE(max(epoch_us(o_orderdate)), 0) AS BIGINT) AS rec_us,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
              AS BIGINT) AS mon_cents
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM pc),
r AS (
  SELECT ck,
         ROW_NUMBER() OVER (ORDER BY rec_us, ck) AS r_rnk,
         ROW_NUMBER() OVER (ORDER BY freq, ck) AS f_rnk,
         ROW_NUMBER() OVER (ORDER BY mon_cents, ck) AS m_rnk
  FROM pc
)
SELECT ck AS c_custkey,
       CAST((5 * (r_rnk - 1)) // n.nc + 1 AS BIGINT) AS r_quintile,
       CAST((5 * (f_rnk - 1)) // n.nc + 1 AS BIGINT) AS f_quintile,
       CAST((5 * (m_rnk - 1)) // n.nc + 1 AS BIGINT) AS m_quintile,
       CAST(100 * ((5 * (r_rnk - 1)) // n.nc + 1)
            + 10 * ((5 * (f_rnk - 1)) // n.nc + 1)
            + ((5 * (m_rnk - 1)) // n.nc + 1) AS BIGINT) AS rfm_code
FROM r, n
ORDER BY c_custkey
"""


@register("rfm_segments", oracle=_RFM_SQL, tags=("agg", "window", "scale"))
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary quintiles per
    customer, the classic cohort-marketing score): each metric ranks
    the customer population and the quintile is the exact-integer
    equi-depth cut ``(5·(rank−1)) div n + 1`` — no percentile
    aggregation, no float boundaries, so both engines agree bit for
    bit. Monetary sums route through exact cents; recency is epoch
    micros of the last order.

    Scale shape: the oracle's three ROW_NUMBERs run over ONE
    unpartitioned window each — the single-task bottleneck this
    engine's :func:`distributed_rank` exists to avoid. Each Spark-side
    rank is the two-level bucketed form; numeric metrics become rank
    keys by ZERO-PADDING to fixed width (lpad 20), which makes
    lexicographic order equal numeric order for non-negative ints.
    Bucketing is by sampled (key, id) boundaries, so a dense metric
    domain (freq takes a handful of values) or the constant 2^62
    offset digits cannot collapse the rank into one task — ties on a
    hot metric value spread across buckets by customer key (the
    degenerate single-bucket shape this round replaced is pinned by
    tests/test_plan_shapes.py's bucket-count floor). The three ranked frames
    re-join on custkey (keys only); the per-customer aggregate
    subtree is identical under all three, so AQE reuses its exchange
    rather than rescanning orders."""
    from .operators.associations import distributed_rank

    orders = _t(spark, sf_dir, "orders")
    # unattributable orders (NULL custkey) can't be scored; NULL-only
    # metric groups coalesce to 0 (oldest / zero spend) on both engines
    pc = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.coalesce(F.max(F.unix_micros("o_orderdate")), F.lit(0))
            .cast("bigint")
            .alias("rec_us"),
            F.count("*").cast("bigint").alias("freq"),
            F.coalesce(
                F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("mon_cents"),
        )
    )
    # The per-customer aggregate feeds three ranks, each of which runs
    # a count + boundary-sample pass before its window — hold it so
    # those passes (and the final three-way join) read the aggregated
    # frame, not twelve re-scans of orders.
    from .caching import hold

    pc = hold("rfm_pc", pc)
    n = pc.agg(F.count("*").cast("bigint").alias("nc"))
    # 2^62 offset before zero-padding: metrics can be NEGATIVE
    # (refund-heavy monetary sums) and '-3' would sort above '0...3'
    # lexicographically; the uniform offset keeps every key positive
    # and order-preserving
    _OFF = 1 << 62

    def quintile(metric: str, out: str) -> DataFrame:
        keyed = pc.select(
            "ck",
            F.lpad(
                (F.col(metric) + F.lit(_OFF)).cast("string"), 20, "0"
            ).alias("key"),
        )
        ranked = distributed_rank(keyed, "key", "ck")
        return ranked.crossJoin(F.broadcast(n)).select(
            "ck",
            F.expr("(5 * (rnk - 1)) div nc + 1").cast("bigint").alias(out),
        )

    out = (
        quintile("rec_us", "r_quintile")
        .join(quintile("freq", "f_quintile"), "ck")
        .join(quintile("mon_cents", "m_quintile"), "ck")
    )
    return out.select(
        F.col("ck").alias("c_custkey"),
        "r_quintile",
        "f_quintile",
        "m_quintile",
        (
            100 * F.col("r_quintile")
            + 10 * F.col("f_quintile")
            + F.col("m_quintile")
        ).cast("bigint").alias("rfm_code"),
    ).orderBy("c_custkey")


_MEDIAN_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("percentile_prices", oracle=_MEDIAN_SQL, tags=("agg",))
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per group — both
    engines sort and linearly interpolate identically; rounded to 6 dp
    on both sides to absorb last-bit interpolation differences.

    Scale note: exact percentile requires a per-group sort; for 100 TB
    dashboards use approx_percentile (KLL/GK sketch, single pass,
    mergeable) — see approx_stats_orders."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


_EQ_BUCKET = 64  # price units per histogram bucket (~7.8k buckets here)
_EQ_PCTS = (("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

_EXACT_Q_SQL = """
SELECT o_orderstatus,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice) AS p90,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("exact_quantiles_orders", oracle=_EXACT_Q_SQL, tags=("agg", "scale"))
def exact_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete quantiles (p25/p50/p90/p99 per group) WITHOUT a
    per-group value collection — the distributed shape that survives
    100 TB where ``percentile()``/``percentile_disc`` aggregates
    don't: those buffer every value of a group on one reducer, so a
    3-group table concentrates the whole corpus on 3 tasks.

    Two passes, same pattern as heavy_hitter_words' sketch-then-
    recount and zorder's bucket histogram: (1) a map-side-combined
    histogram over fixed-width value buckets (one exchange of
    ≤ groups·buckets count rows — kilobytes at any corpus size), with
    a cumulative window over that tiny frame locating, for each
    target rank r = ⌈p·n⌉, the single bucket containing it; (2) the
    scan streams again, keeps ONLY rows in chosen buckets (a
    broadcast semi-join against ≤ groups·|percentiles| bucket keys —
    at most n/buckets rows each survive), and a within-bucket
    row_number picks the (r − below)-th smallest. The answer is a raw
    data value (percentile_disc semantics: smallest v with
    cume_dist ≥ p, i.e. sorted position ⌈p·n⌉), so cross-engine
    equality is exact — no interpolation arithmetic at all. Ranks are
    computed in integer arithmetic ((n·num + den − 1) div den).

    tests/test_plan_shapes.py pins the shape: no percentile buffer
    aggregate, no sort-merge join, bucket keys arrive by broadcast."""
    orders = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("g"), F.col("o_totalprice").alias("v")
        )
        # ordered-set aggregates ignore NULLs on both engines; the
        # histogram must count the same population
        .filter(F.col("v").isNotNull())
    )
    return (
        _disc_quantiles(orders, _EQ_PCTS)
        .withColumnRenamed("g", "o_orderstatus")
        .orderBy("o_orderstatus")
    )


def _disc_quantiles(gv: DataFrame, pcts_spec) -> DataFrame:
    """percentile_disc per group over a (g, v) frame WITHOUT a
    per-group value buffer — the bucket-histogram + targeted-recount
    shape documented on :func:`exact_quantiles_orders` (its body,
    factored in r8 so the sampled calibration reuses it)."""
    # bucket id only needs to be MONOTONE in v and deterministic (it
    # never crosses engines), so truncating `div` on negatives is fine
    b = F.expr(f"cast(floor(v) as bigint) div {_EQ_BUCKET}")
    hist = gv.groupBy("g", b.alias("b")).agg(F.count("*").alias("cnt"))
    wcum = (
        W.partitionBy("g").orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    )
    cum = hist.select(
        "g",
        "b",
        "cnt",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("below"),
        F.sum("cnt").over(W.partitionBy("g")).alias("n"),
    )
    pcts = F.array(
        *[
            F.struct(
                F.lit(name).alias("p"),
                F.expr(f"(n * {num} + {den} - 1) div {den}").alias("r"),
            )
            for name, num, den in pcts_spec
        ]
    )
    targets = (
        cum.select("g", "b", "cnt", "below", F.explode(pcts).alias("t"))
        .filter(
            (F.col("below") < F.col("t.r"))
            & (F.col("t.r") <= F.col("below") + F.col("cnt"))
        )
        .select("g", "b", F.col("t.p").alias("p"), F.col("t.r").alias("r"), "below")
    )
    sel = gv.withColumn("b", b).join(F.broadcast(targets), ["g", "b"])
    wr = W.partitionBy("g", "p").orderBy("v")
    picked = (
        sel.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == F.col("r") - F.col("below"))
        .select("g", "p", "v")
    )
    return picked.groupBy("g").agg(
        *[
            F.max(F.when(F.col("p") == name, F.col("v"))).alias(name)
            for name, _num, _den in pcts_spec
        ]
    )


_SQ_RATE = 16  # deterministic 1-in-16 hash sample (md5 of the row key)
_SQ_PCTS = (("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10))

_SAMPLED_Q_SQL = f"""
WITH pop AS (SELECT o_orderstatus AS g, o_totalprice AS v FROM orders
             WHERE o_totalprice IS NOT NULL),
samp AS (SELECT o_orderstatus AS g, o_totalprice AS v FROM orders
         WHERE o_totalprice IS NOT NULL
           AND ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                 % {_SQ_RATE} = 0),
fq AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_full,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS p25,
              percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS p50,
              percentile_disc(0.9)  WITHIN GROUP (ORDER BY v) AS p90
       FROM pop GROUP BY g),
sq AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sample,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS p25_est,
              percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS p50_est,
              percentile_disc(0.9)  WITHIN GROUP (ORDER BY v) AS p90_est
       FROM samp GROUP BY g)
SELECT fq.g AS o_orderstatus, fq.n_full, sq.n_sample,
       fq.p25, sq.p25_est, fq.p50, sq.p50_est, fq.p90, sq.p90_est,
       CAST(abs(CAST(floor(sq.p50_est * 100) AS BIGINT)
                - CAST(floor(fq.p50 * 100) AS BIGINT)) AS BIGINT) AS err_p50_cents
FROM fq JOIN sq ON sq.g = fq.g
ORDER BY fq.g
"""


@register(
    "sampled_quantiles_orders",
    oracle=_SAMPLED_Q_SQL,
    tags=("agg", "approx", "calibration", "scale"),
)
def sampled_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLED-QUANTILE CALIBRATION: per-group discrete quantiles
    estimated from a DETERMINISTIC 1-in-16 hash sample (md5 of the
    order key — replayable in any engine, mergeable across shards:
    the union of two tables' samples IS the sample of the union, the
    Bernoulli-sketch property that makes this the cheap first pass at
    100 TB) next to the exact quantiles, with the p50 error in cents —
    the report that tells an operator whether the sample suffices
    before paying for the exact pass.

    Both the exact AND the sampled side run the same distributed
    bucket-histogram + targeted-recount shape as
    :func:`exact_quantiles_orders` (no per-group value buffers), so
    the operator itself survives the corpus sizes it is calibrating
    for. All selections are raw data values (percentile_disc
    semantics), so cross-engine equality is exact."""
    pop = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("g"),
            F.col("o_totalprice").alias("v"),
            F.col("o_orderkey").cast("string").alias("k"),
        )
        .filter(F.col("v").isNotNull())
    )
    hbin = F.conv(F.substring(F.md5("k"), 1, 8), 16, 10).cast("long") % _SQ_RATE
    samp = pop.filter(hbin == 0).select("g", "v")
    nf = pop.groupBy("g").agg(F.count("*").cast("bigint").alias("n_full"))
    ns = samp.groupBy("g").agg(F.count("*").cast("bigint").alias("n_sample"))
    fq = _disc_quantiles(pop.select("g", "v"), _SQ_PCTS).join(nf, "g")
    sq = (
        _disc_quantiles(samp, _SQ_PCTS)
        .select(
            "g",
            F.col("p25").alias("p25_est"),
            F.col("p50").alias("p50_est"),
            F.col("p90").alias("p90_est"),
        )
        .join(ns, "g")
    )
    return (
        fq.join(sq, "g")
        .select(
            F.col("g").alias("o_orderstatus"),
            "n_full",
            "n_sample",
            "p25",
            "p25_est",
            "p50",
            "p50_est",
            "p90",
            "p90_est",
            # floor() before the bigint cast: double→bigint CAST
            # truncates in Spark but ROUNDS in DuckDB; floor of the
            # same IEEE product is engine-identical
            F.abs(
                F.floor(F.col("p50_est") * 100).cast("bigint")
                - F.floor(F.col("p50") * 100).cast("bigint")
            ).cast("bigint").alias("err_p50_cents"),
        )
        .orderBy("o_orderstatus")
    )


@register("approx_stats_orders", tags=("agg", "approx"))
def approx_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the single-pass, mergeable shapes for
    100 TB interactive stats: HyperLogLog++ distinct counts and
    approximate percentiles. Rows-only (sketches are implementation-
    specific); error bounds asserted against exact values in
    tests/test_relational_extra.py."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_orderstatus")
    )


_N_SALT = 8

_SALTED_SQL = f"""
SELECT p.o_orderpriority AS priority, p.weight,
       {dsum_sql('o_totalprice')} AS weighted_revenue,
       count(*) AS n_orders
FROM orders
JOIN (SELECT DISTINCT o_orderpriority,
             length(o_orderpriority) AS weight
      FROM orders) p USING (o_orderpriority)
GROUP BY p.o_orderpriority, p.weight
ORDER BY priority
"""


@register("skew_join_salted", oracle=_SALTED_SQL, tags=("join", "skew"))
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed join keys: o_orderpriority has 5 values, so
    a plain shuffle join lands each priority's millions of rows on ONE
    reducer. The fact side gets a deterministic salt
    (xxhash64(orderkey) mod 8) appended to the key; the tiny dim side
    is exploded across all 8 salts; the join key becomes
    (priority, salt) → each hot key spreads over 8 reducers. Results
    are identical to the unsalted join — which is the oracle.

    (AQE skew-join splitting handles sort-merge cases automatically;
    explicit salting is the portable form that also covers aggregations
    and older planners. The dim side here would broadcast anyway at
    this size — the hint forces the shuffle path so the salted shape is
    actually exercised.)
    """
    orders = _t(spark, sf_dir, "orders")
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.length("o_orderpriority").cast("bigint").alias("weight"),
        )
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1)))
    )
    fact_salted = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_N_SALT)).cast("int")
    )
    joined = fact_salted.hint("merge").join(
        dim_salted, ["o_orderpriority", "salt"]
    )
    return (
        joined.groupBy("o_orderpriority", "weight")
        .agg(
            dsum("o_totalprice", "weighted_revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            "weight",
            "weighted_revenue",
            "n_orders",
        )
        .orderBy("priority")
    )


_Q4_SQL = """
SELECT o_orderpriority, cast(count(*) AS bigint) AS n_orders
FROM orders
WHERE o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate < timestamp '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_SQL, tags=("join", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-driven left-semi join with a non-equi
    residual (l_shipdate > o_orderdate) feeding a grouped count —
    the decorrelated form of a correlated EXISTS subquery.

    Scale: the semi join never duplicates orders rows however many
    lineitems match, and the date filter prunes the orders scan before
    the shuffle; lineitem ships only (orderkey, shipdate). The count
    agg is map-side partial over 5 priority values.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume')} AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         cast(year(l_shipdate) AS int) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    AND l_shipdate >= timestamp '1996-01-01'
    AND l_shipdate <  timestamp '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_SQL, tags=("join", "agg"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume — the
    same dimension table (nation) joined TWICE under different roles
    with an OR-of-pairs predicate that Catalyst cannot split into
    either join alone, grouped by shipping year.

    Scale: both nation copies broadcast (25 rows); supplier broadcasts
    into lineitem so the fact table never re-shuffles for the supplier
    side; the only co-shuffle is orders⋈lineitem on orderkey. The
    OR-pair filter runs after both nation names are in-row — a
    residual on broadcast outputs, zero extra exchanges."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")  # the testdata's synthetic nation names
    ns = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# The testdata's reduced lineitem has no commit/receipt dates, so
# "late" is adapted to l_shipdate > o_orderdate + 60 days; the Q21
# decorrelation STRUCTURE (semi + anti self-joins on the same fact
# with a suppkey inequality) is preserved exactly.
_Q21_LATE_DAYS = 60

_Q21_SQL = f"""
SELECT s_name, cast(count(*) AS bigint) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_3'
  AND l1.l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_supplier", oracle=_Q21_SQL, tags=("join", "agg"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — a correlated EXISTS (another supplier
    shipped in the order) plus a correlated NOT EXISTS (no OTHER
    supplier was late), decorrelated as a left-semi and a left-anti
    self-join on the same fact table with a suppkey-inequality
    residual.

    Scale: both self-joins co-shuffle on l_orderkey — one exchange
    feeds the join AND both probes (same key), so AQE reuses the
    partitioning; the probes ship (orderkey, suppkey[, late]) thin
    rows, never the full lineitem width. Nation broadcasts; "late"
    needs o_orderdate, which rides the already-required orders join.
    """
    late_iv = F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")
    late_cut = F.col("o_orderdate") + late_iv
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # EXISTS: some other supplier in the same order
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    multi = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no other LATE supplier in the same order
    late_others = (
        li.join(
            orders.select(
                F.col("o_orderkey").alias("o3_orderkey"),
                F.col("o_orderdate").alias("o3_orderdate"),
            ),
            F.col("l_orderkey") == F.col("o3_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o3_orderdate") + late_iv)
        .select(
            F.col("l_orderkey").alias("o4_orderkey"),
            F.col("l_suppkey").alias("o4_suppkey"),
        )
    )
    sole_late = multi.join(
        late_others,
        (F.col("l_orderkey") == F.col("o4_orderkey"))
        & (F.col("l_suppkey") != F.col("o4_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# Adaptations to the testdata's reduced schema: customer has no phone
# column, so Q22's country-code grouping becomes the nation dimension;
# and every synthetic customer has at least one order, so "never
# ordered" becomes "no order since _Q22_RECENT" (the anti-join probe
# gains a pushed-down filter — the decorrelation shape is unchanged).
_Q22_RECENT = "2000-01-01"

_Q22_SQL = f"""
SELECT n_name, cast(count(*) AS bigint) AS numcust,
       cast(sum(cast(c_acctbal AS decimal(27,6))) AS double) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT cast(sum(cast(c_acctbal AS decimal(27,6))) AS double)
                          / count(c_acctbal)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= timestamp '{_Q22_RECENT}')
GROUP BY n_name
ORDER BY n_name
"""


@register("q22_global_sales_opportunity", oracle=_Q22_SQL, tags=("join", "agg"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the GLOBAL
    average balance (scalar aggregate subquery as a filter threshold)
    with no recent order (NOT EXISTS → left-anti join against a
    filtered orders probe), tallied per nation.

    Scale: the scalar average is one map-side-combined aggregate
    reduced to a single row and broadcast into the filter (a literal
    at runtime via crossJoin of a 1-row frame — no driver collect in
    the plan); the anti-join ships only o_custkey; nation broadcasts.
    """
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_RECENT).cast("timestamp"))
        .select("o_custkey")
    )
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal", "thresh"))  # exact decimal mean: the
        # threshold is ORDER-INSENSITIVE, so engine partition order
        # cannot flip a borderline customer's membership
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("n_name")
    )


# The r10 TPC-H completions (q8/q9/q11/q12/q16/q17/q19/q20 shapes).
# The reduced testdata schema has no partsupp table and no
# commit/receipt dates, shipmode, container, or comment columns, so
# where the original predicate needs one the adaptation is documented
# per query (the established q21/q22 convention); every decorrelation
# STRUCTURE — the thing each query exists to exercise — is preserved.

_Q8_SQL = f"""
SELECT o_year,
       round({dsum_sql("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0.0 END")}
             / {dsum_sql('volume')}, 6) AS mkt_share
FROM (
  SELECT cast(year(o_orderdate) AS int) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE nc.n_regionkey = (SELECT n_regionkey FROM nation
                          WHERE n_name = 'NATION_1')
    AND p_type = 'ECONOMY'
    AND o_orderdate >= timestamp '1996-01-01'
    AND o_orderdate <  timestamp '1998-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_SQL, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a part type within
    its own region, by order year — the 7-relation star with nation
    joined twice (customer side restricted to a region, supplier side
    labelling the share) and a conditional-ratio aggregate. The
    region restriction uses the nation's n_regionkey directly (the
    region table only carries the name in this schema).

    Scale: part/supplier/nation/customer-region probe all broadcast;
    the only fact co-shuffle is lineitem⋈orders on orderkey; both
    ratio sums are one map-side-combined aggregate routed through
    exact decimal, so the share is engine-exact before rounding."""
    nation = _t(spark, sf_dir, "nation")
    target_rk = nation.filter(F.col("n_name") == "NATION_1").select(
        F.col("n_regionkey").alias("target_rk")
    )
    nc = (
        nation.crossJoin(F.broadcast(target_rk))
        .filter(F.col("n_regionkey") == F.col("target_rk"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                dsum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                        0.0
                    )
                )
                / dsum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# No partsupp ⇒ no ps_supplycost: the profit's cost term is proxied as
# p_retailprice * l_quantity * 0.1 (a deterministic function of in-
# schema columns with the same join shape the original needs).
_Q9_SQL = f"""
SELECT nation, o_year, {dsum_sql('amount')} AS sum_profit
FROM (
  SELECT ns.n_name AS nation,
         cast(year(o_orderdate) AS int) AS o_year,
         l_extendedprice * (1 - l_discount)
           - p_retailprice * l_quantity * 0.1 AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9_SQL, tags=("join", "agg"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    order year, parts selected by a substring LIKE — the profit
    expression spans three relations' columns, so no single join can
    pre-aggregate it. Cost proxy documented above (no partsupp).

    Scale: the p_name LIKE prunes part BEFORE it broadcasts into the
    fact scan (pushdown visible as a scan filter); supplier+nation
    broadcast; lineitem⋈orders co-shuffles once on orderkey; the
    profit sum is decimal-routed and map-side combined."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(dsum(amount, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# No partsupp ⇒ the "stock value" per part comes from the supplied
# quantities in lineitem (same supplier-nation restriction, same
# HAVING-vs-global-scalar decorrelation the original exercises).
_Q11_FRACTION = 0.001

_Q11_SQL = f"""
WITH supplied AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_0'
)
SELECT l_partkey AS ps_partkey, {dsum_sql('val')} AS value
FROM supplied
GROUP BY l_partkey
HAVING {dsum_sql('val')} > (SELECT {_Q11_FRACTION} * {dsum_sql('val')}
                            FROM supplied)
ORDER BY value DESC, ps_partkey
"""


@register("q11_important_stock", oracle=_Q11_SQL, tags=("join", "agg"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supplied value for one nation's
    suppliers, kept only when it exceeds a FRACTION OF THE GLOBAL
    total — the HAVING-against-scalar-subquery decorrelation (the
    same aggregate computed at two granularities from one input).

    Scale: supplier+nation broadcast into the fact scan; ONE
    partkey-keyed exchange feeds the per-part aggregate, and the
    global total is a map-side-combined reduction of the same
    pre-joined frame broadcast back as a 1-row threshold — the input
    is never scanned twice."""
    from .caching import hold

    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_0"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    supplied = hold(
        "q11_supplied",
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("val"),
        ),
    )
    threshold = supplied.agg(
        (F.lit(_Q11_FRACTION) * dsum("val")).alias("thresh")
    )
    return (
        supplied.groupBy("l_partkey")
        .agg(dsum("val", "value"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thresh"))
        .select(F.col("l_partkey").alias("ps_partkey"), "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


# No commit/receipt dates or shipmode ⇒ "late" is l_shipdate ≥
# o_orderdate + 60 days (the q21 convention) and the reporting
# dimension is l_linestatus; the priority-bucket CASE pivot — the
# shape Q12 exercises — is verbatim.
_Q12_SQL = """
SELECT l_linestatus,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= timestamp '1996-01-01'
  AND l_shipdate <  timestamp '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@register("q12_late_lines", oracle=_Q12_SQL, tags=("join", "agg"))
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments bucketed by line status with a
    two-way priority CASE pivot — a fact⋈fact join whose residual
    predicate (shipdate vs orderdate + interval) spans both sides, so
    it can only run post-join. Adaptations documented above.

    Scale: the shipdate year window prunes the lineitem scan; the
    join co-shuffles on orderkey once; both CASE sums partial-
    aggregate map-side to ≤ |statuses| rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# No partsupp ⇒ the supplier-part relation is the DISTINCT
# (l_partkey, l_suppkey) pairs actually shipped; no s_comment ⇒ the
# "complaints" exclusion is proxied by s_acctbal < 1000. The IS NOT
# NULL guards mirror the Spark side exactly (ADVICE r11): without
# them the oracle keeps NOT IN's any-NULL-build→empty / NULL-probe-
# dropped branches that the engine's left-anti deliberately does not
# reproduce — harmless on non-null TPC-H keys, but the equivalence is
# now pinned on BOTH sides, not just the engine's.
_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) AS bigint) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey IS NOT NULL) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000
                          AND s_suppkey IS NOT NULL)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_part_supplier_count", oracle=_Q16_SQL, tags=("join", "agg"))
def q16_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple with a negated-IN supplier exclusion — the count-distinct-
    over-semi-structure query. Adaptations documented above.

    Scale: the pair-distinct is the one fact exchange (16-byte keys,
    map-side combined); the part filter broadcasts; the NOT IN is a
    broadcast left-anti join (the excluded-supplier list is
    |suppliers|-bounded and heavily filtered).

    NOT IN vs anti-join under NULLs: SQL NOT IN yields NO rows if the
    subquery emits a NULL and drops NULL probe keys, while a left-anti
    join keeps both. The keys are non-null by schema here, and the
    IS NOT NULL guards below pin the equivalence structurally rather
    than leaving it as a latent oracle mismatch if the schema ever
    admits nulls (the any-NULL-build→empty-result branch of NOT IN is
    deliberately not reproduced — guarded out on both sides)."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .filter(F.col("l_suppkey").isNotNull())
        .distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 1000) & F.col("s_suppkey").isNotNull()
    ).select("s_suppkey")
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# No p_container ⇒ the small-part restriction is p_brand + p_size<10.
_Q17_SQL = f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS t_partkey,
             0.2 * ({davg_sql('l_quantity')}) AS qty_limit
      FROM lineitem GROUP BY l_partkey) t
  ON t_partkey = p_partkey
WHERE p_brand = 'Brand#2' AND p_size < 10
  AND l_quantity < qty_limit
"""


@register("q17_small_qty_revenue", oracle=_Q17_SQL, tags=("join", "agg"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to sub-threshold orders, where
    the threshold is a CORRELATED per-part average (0.2 × avg qty of
    that part) — decorrelated as a per-part aggregate joined back to
    the fact. Adaptation documented above.

    Scale: the per-part avg is one partkey-keyed exchange shared with
    the fact join's own key (co-partitioned); part's brand/size
    filter broadcasts; the decimal-routed avg makes the borderline
    l_quantity comparison order-insensitive in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    ).select("p_partkey")
    limits = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(limits, F.col("t_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# No l_shipmode / l_shipinstruct ⇒ those conjuncts are dropped from
# each branch; the disjunctive multi-attribute structure — the thing
# Q19 exercises (OR of ANDs the optimizer must not split the join
# over) — is verbatim.
_Q19_SQL = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       cast(count(*) AS bigint) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


@register("q19_discounted_revenue", oracle=_Q19_SQL, tags=("join", "agg"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-conjunctions predicate
    spanning both join sides — the disjunction references part AND
    lineitem columns in every branch, so it only evaluates post-join
    (no single-side pushdown exists). Adaptation documented above.

    Scale: part broadcasts (the brand/size union is still a filter on
    the broadcast side); the disjunction runs as a codegen residual on
    the joined rows; one decimal-routed global aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def branch(brand: str, qlo: int, qhi: int, smax: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(1, smax)
        )

    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            branch("Brand#12", 1, 11, 5)
            | branch("Brand#23", 10, 20, 10)
            | branch("Brand#34", 20, 30, 15)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# No partsupp ⇒ "has excess availability" is proxied by a supplier
# having shipped > _Q20_QTY units of a matching part in the year —
# the nested IN-(grouped-HAVING) decorrelation is verbatim.
_Q20_QTY = 30

_Q20_SQL = f"""
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'large%'
      AND l_shipdate >= timestamp '1997-01-01'
      AND l_shipdate <  timestamp '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING {dsum_sql('l_quantity')} > {_Q20_QTY})
ORDER BY s_name
"""


@register("q20_promo_suppliers", oracle=_Q20_SQL, tags=("join", "agg"))
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved serious
    volume of name-matched parts in a year — an IN against a grouped
    HAVING subquery, decorrelated as aggregate → project → left-semi.
    Adaptations documented above.

    Scale: the part name-LIKE broadcasts into the pruned lineitem
    scan; the (suppkey, partkey) aggregate is one exchange; the
    surviving supplier list is tiny → semi join broadcasts; nation
    broadcasts."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > _Q20_QTY)
        .select("l_suppkey")
        .distinct()
    )
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q6_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       cast(count(*) AS bigint) AS n_lines
FROM lineitem
WHERE l_shipdate >= timestamp '1996-01-01'
  AND l_shipdate <  timestamp '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_SQL, tags=("agg", "scan"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-side query — three conjunctive
    range predicates and one global conditional sum, no join at all.
    The benchmark's predicate-pushdown probe: every filter must reach
    the parquet scan (locked in tests/test_plan_shapes.py), and the
    aggregate is one map-side-combined scalar."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= timestamp '1996-01-01'
    AND l_shipdate <  timestamp '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_SQL, tags=("join", "agg"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived revenue view consumed twice — once
    as the join input and once under a scalar MAX subquery selecting
    the top supplier(s), ties included (the semantics LIMIT 1 would
    get wrong).

    Scale: the view aggregates map-side on suppkey; the scalar max is
    a 1-row broadcast back onto the same frame (the view is computed
    once per consumer — at 100 TB one would persist it; here it is a
    thin pre-aggregated frame); supplier broadcasts. The equality
    filter is on the exact-decimal revenue, so ties are engine-exact.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate <  timestamp '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: per-customer revenue lost to returned items in
    a quarter, top-20 — fact-to-fact join narrowed by both a dimension
    filter (returnflag) and a date window, grouped on a HIGH-
    cardinality key (customers) with a deterministic top-k.

    Scale: both fact filters prune at the scan; orders⋈lineitem
    co-shuffles on orderkey, then one customer-keyed exchange for the
    group; nation broadcasts; the top-20 is a TakeOrdered, never a
    full sort."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# The testdata's p_type is a flat category set (PROMO/ECONOMY/…), so
# Q14's LIKE 'PROMO%' prefix becomes exact equality — same shape.
_Q14_SQL = f"""
SELECT round(100.0
       * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= timestamp '1996-09-01'
  AND l_shipdate <  timestamp '1996-10-01'
"""


@register("q14_promo_effect", oracle=_Q14_SQL, tags=("join", "agg"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one month — a
    conditional aggregate ratio over a fact⋈dimension join, the
    global-scalar-report query class.

    Scale: the shipdate filter prunes the lineitem scan; part
    broadcasts into it; both sums are one map-side-combined global
    aggregate routed through exact decimal (order-insensitive), so
    the ratio is engine-exact before the final rounding."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


_Q18_QTY_THRESHOLD = 300

_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS order_date_us,
       o_totalprice, {dsum_sql('l_quantity')} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > {_Q18_QTY_THRESHOLD})
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "q18_large_volume", oracle=_Q18_SQL, bench=True, tags=("join", "agg", "topk")
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregation used as a semi-join
    probe list, re-joined for detail rows, deterministic top-100.

    Scale: the heavy lineitem group-by is map-side partial on orderkey
    (co-partitioned with the later join — one shuffle serves both);
    the HAVING survivor list is tiny, so AQE turns the semi join into
    a broadcast. The decimal-routed qty sums keep the threshold
    comparison and output order-insensitive (see module docstring).
    The top-k is a totally-ordered (price desc, orderkey) limit —
    per-partition local top-100 then a single merge.
    """
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > _Q18_QTY_THRESHOLD)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            # o_orderdate is TIMESTAMP_NTZ in the parquet; the session
            # timezone is pinned UTC so this cast is engine-stable.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "order_date_us"
            ),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


_HOUR_US = 3_600_000_000

_MOVING_AVG_SQL = f"""
SELECT user_id, event_id, ts_us,
       cast(sum(cast(value AS decimal(27,6))) OVER w AS double)
         / count(value) OVER w AS avg_1h,
       cast(count(*) OVER w AS bigint) AS n_1h
FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_us, event_id
"""


@register("moving_avg_range_frame", oracle=_MOVING_AVG_SQL, tags=("window",))
def moving_avg_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (SURVEY §2.6 note: the reference uses
    only row-neighbor frames; the engine exposes value-range frames):
    per-user trailing-1-hour mean and event count at every event.

    The frame is defined by the ORDER-BY value (epoch micros), not row
    position, so ties at the same timestamp share one frame — the
    deterministic set the oracle sees too; the double sum is
    decimal-routed for order-insensitivity.

    Scale: one shuffle on user_id; the running frame is computed in a
    single sorted pass per partition (no self-join, no explode).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(-_HOUR_US, 0)
    avg_1h = (
        F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double")
        / F.count("value").over(w)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        avg_1h.alias("avg_1h"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
    ).orderBy("user_id", "ts_us", "event_id")


_NTILE_SQL = """
SELECT c_mktsegment, quartile,
       cast(count(*) AS bigint) AS n_custs,
       round(cast(sum(cast(c_acctbal AS decimal(27,6))) AS double) / count(*), 6)
         AS avg_bal
FROM (SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer)
GROUP BY c_mktsegment, quartile
ORDER BY c_mktsegment, quartile
"""


@register("ntile_quartiles", oracle=_NTILE_SQL, tags=("window", "agg"))
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (SURVEY §2.6 note: no ntile in the reference;
    built-in here): per-market-segment account-balance quartiles with
    per-bucket counts and decimal-routed means. The ntile window is
    totally ordered (balance, custkey) so bucket assignment is
    deterministic in both engines.

    Scale: ntile needs the whole partition sorted — fine per segment
    (5 segments ≈ 5 sorted partitions; salt the segment key if one
    segment dominates). A GLOBAL ntile would serialize onto one
    reducer; at 100 TB use approx_percentile cutpoints instead
    (approx_stats_orders shows the sketch path).
    """
    customer = _t(spark, sf_dir, "customer")
    wq = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = customer.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(wq).cast("bigint").alias("quartile"),
    )
    return (
        tiled.groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").cast("bigint").alias("n_custs"),
            F.round(davg("c_acctbal"), 6).alias("avg_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


# percent_rank is (rank-1)/(n-1): a ratio of exact integers computed
# as ONE division in both engines, rounded to 6 dp; cume_dist is
# rank'/n likewise. Both windows are totally ordered so the integer
# numerators are engine-exact.
_RANK_FNS_SQL = """
SELECT o_orderstatus, o_orderkey,
       cast(rank()       OVER w AS bigint) AS rnk,
       cast(dense_rank() OVER w AS bigint) AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume,
       cast(row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS bigint) AS rn
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
QUALIFY rn <= 10
ORDER BY o_orderstatus, rn
"""


@register("window_rank_functions", oracle=_RANK_FNS_SQL, tags=("window",))
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one window (rank,
    dense_rank, percent_rank, cume_dist, row_number) over a totally
    ordered per-status frame, top-10 per group — completing the §2.6
    window surface beyond ntile/row_number.

    percent_rank/cume_dist are integer-ratio divisions (engine-exact
    numerators from the total order), rounded at 6 dp only to absorb
    the division's last bit. Scale: one exchange on the partition key;
    the QUALIFY top-10 prunes before the final sort."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 10)
        .orderBy("o_orderstatus", "rn")
    )


_GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS bigint) AS gid,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       cast(count(*) AS bigint) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("grouping_sets_revenue", oracle=_GROUPING_SETS_SQL, tags=("agg",))
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond the rollup/cube queries): the
    (flag, status) detail, per-flag subtotal, and grand total in one
    pass, disambiguated by an explicit grouping-id — grouped-out NULLs
    are distinguishable from data NULLs via gid.

    Scale: one shuffle; Spark expands each input row once per grouping
    set BEFORE the partial aggregate, so the exchange carries partial
    sums over ≤ 3× the group cardinality (tiny here), not 3× the data.
    """
    li = _t(spark, sf_dir, "lineitem")
    gid = (
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid")
    )
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            gid,
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n_rows")
        .orderBy(
            "gid",
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
        )
    )


def _rev_filter_sql(status: str) -> str:
    return (
        "cast(sum(cast(o_totalprice AS decimal(27,6)))"
        f" FILTER (WHERE o_orderstatus = '{status}') AS double)"
    )


_PIVOT_SQL = f"""
SELECT o_orderpriority,
       {_rev_filter_sql('F')} AS revenue_f,
       {_rev_filter_sql('O')} AS revenue_o,
       {_rev_filter_sql('P')} AS revenue_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("pivot_revenue_by_status", oracle=_PIVOT_SQL, tags=("agg", "pivot"))
def pivot_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide conditional aggregation): revenue per order
    priority, one column per order status.

    Scale: the pivot value list is EXPLICIT, so Spark skips the extra
    distinct-collect job it otherwise runs to discover the columns —
    at 100 TB that discovery pass is a full scan you don't want. One
    shuffle, map-side partials per (priority × 3 statuses) cell.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
        .select(
            "o_orderpriority",
            F.col("F").alias("revenue_f"),
            F.col("O").alias("revenue_o"),
            F.col("P").alias("revenue_p"),
        )
        .orderBy("o_orderpriority")
    )


_CORR_SQL = f"""
WITH m AS (
  SELECT l_returnflag,
         cast(count(*) AS double) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_extendedprice')} AS sxy,
         {dsum_sql('l_quantity * l_quantity')} AS sxx,
         {dsum_sql('l_extendedprice * l_extendedprice')} AS syy
  FROM lineitem
  GROUP BY l_returnflag)
SELECT l_returnflag,
       round((n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_qty_price,
       cast(n AS bigint) AS n_rows
FROM m
ORDER BY l_returnflag
"""


@register("corr_qty_price", oracle=_CORR_SQL, tags=("agg", "stats"))
def corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group, built from decimal-routed raw
    moments instead of the builtin ``corr`` — the builtin's running
    double accumulation is partition-order-dependent, so two runs (or
    two engines) disagree in the last bits; exact moment sums make the
    statistic bit-reproducible at any partition count (the final
    3-row combine is rounded to 9 dp to absorb expression-tree ulp
    differences between engines, like percentile_prices). Same recipe
    extends to stddev/covariance/regression slopes.

    Scale: one shuffle, six map-side partial decimal sums riding one
    aggregate; the closed-form combine happens on 3 group rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sxx"),
        dsum(y * y, "syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag",
        F.round(corr, 9).alias("corr_qty_price"),
        n.cast("bigint").alias("n_rows"),
    ).orderBy("l_returnflag")


# --- funnel / path analysis (events) ---------------------------------

_FUNNEL_SQL = """
WITH tv AS (
  SELECT user_id, min(ts) FILTER (event_type = 'view') AS tv
  FROM events GROUP BY user_id
),
tc AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN tv USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= tv.tv
    AND e.ts <= tv.tv + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
tp AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN tc USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= tc.tc
    AND e.ts <= tc.tc + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT tv.user_id,
       epoch_us(tv.tv) AS view_us,
       epoch_us(tc.tc) AS click_us,
       epoch_us(tp.tp) AS purchase_us,
       cast(CASE WHEN tp.tp IS NOT NULL THEN 3
                 WHEN tc.tc IS NOT NULL THEN 2
                 WHEN tv.tv IS NOT NULL THEN 1
                 ELSE 0 END AS bigint) AS stage
FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)
ORDER BY user_id
"""


@register("funnel_stages", oracle=_FUNNEL_SQL, tags=("events", "window"))
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: per user, the first view, the first
    click within 24 h of that view, and the first purchase within
    24 h of that click — the furthest stage reached in order inside
    per-stage conversion windows. Each stage is a
    conditional min over the user's events chained through three
    same-partition window projections, so the whole funnel costs ONE
    exchange on user_id (the oracle states it as three grouped joins;
    values agree — all integer-microsecond mins).
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.select("user_id", "event_type", "ts", tv.alias("tv"))
    tc = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.col("tv"))
            & (F.col("ts") <= F.col("tv") + F.expr("interval 24 hours")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.select("*", tc.alias("tc"))
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("tc"))
            & (F.col("ts") <= F.col("tc") + F.expr("interval 24 hours")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.select("*", tp.alias("tp"))
    # Users with NO view event stay in the output as stage 0 (the
    # oracle's ELSE branch) — no tv filter.
    out = s3.groupBy("user_id").agg(
        F.first("tv").alias("tv"),
        F.first("tc").alias("tc"),
        F.first("tp").alias("tp"),
    )
    stage = (
        F.when(F.col("tp").isNotNull(), 3)
        .when(F.col("tc").isNotNull(), 2)
        .when(F.col("tv").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
    )
    return out.select(
        "user_id",
        F.unix_micros("tv").alias("view_us"),
        F.unix_micros("tc").alias("click_us"),
        F.unix_micros("tp").alias("purchase_us"),
        stage.alias("stage"),
    ).orderBy("user_id")


# --- cohort retention (events) ---------------------------------------

_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_no
  FROM events e JOIN firsts f USING (user_id)
),
sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY cohort_week)
SELECT epoch_us(a.cohort_week) AS cohort_week_us,
       cast(a.week_no AS bigint) AS week_no,
       cast(count(*) AS bigint) AS active_users,
       cast(s.cohort_size AS bigint) AS cohort_size,
       round(cast(count(*) AS double) / s.cohort_size, 9) AS retention
FROM activity a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, a.week_no, s.cohort_size
ORDER BY cohort_week_us, week_no
"""


@register("cohort_retention", oracle=_COHORT_SQL, tags=("events", "agg"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, and
    for each subsequent week the fraction of the cohort still active —
    the classic triangle matrix. All-integer counts with one
    deterministic division (rounded 9 dp); week arithmetic via
    date_trunc on both engines.

    Scale: two aggregations keyed by user_id then (cohort, week) —
    the first-seen frame is users-sized and broadcastable; nothing
    touches raw event payloads after the initial projection."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_micros(F.date_trunc("week", F.col("ts")))
                        - F.unix_micros(F.col("cohort_week"))
                    )
                    / F.lit(7 * 24 * 3600 * 1_000_000)
                )
            ).alias("week_no"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    out = (
        activity.groupBy("cohort_week", "week_no")
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
    )
    return out.select(
        F.unix_micros("cohort_week").alias("cohort_week_us"),
        F.col("week_no").cast("bigint").alias("week_no"),
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users").cast("double") / F.col("cohort_size"), 9
        ).alias("retention"),
    ).orderBy("cohort_week_us", "week_no")


# --- event-rate anomaly detection (monitoring) ------------------------

_ANOMALY_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, count(*) AS cnt, sum(n) AS s1, sum(n * n) AS s2
  FROM h GROUP BY event_type
)
SELECT h.event_type, epoch_us(h.hr) AS hour_us, cast(h.n AS bigint) AS n,
       round(cast(s1 AS double) / cnt, 9) AS mean_n,
       round(CASE WHEN (cast(s2 AS double) / cnt
                        - (cast(s1 AS double) / cnt) * (cast(s1 AS double) / cnt)) > 0
             THEN (h.n - cast(s1 AS double) / cnt)
                  / sqrt(cast(s2 AS double) / cnt
                         - (cast(s1 AS double) / cnt) * (cast(s1 AS double) / cnt))
             END, 9) AS z,
       coalesce(abs((h.n - cast(s1 AS double) / cnt)
                / sqrt(cast(s2 AS double) / cnt
                       - (cast(s1 AS double) / cnt) * (cast(s1 AS double) / cnt)))
                >= 3.0, false) AS is_anomaly
FROM h JOIN m USING (event_type)
ORDER BY event_type, hour_us
"""


@register("event_rate_anomalies", oracle=_ANOMALY_SQL, tags=("events", "stats"))
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-monitoring anomaly scan: hourly event counts per type
    z-scored against that type's own rate distribution, |z| ≥ 3
    flagged. Every moment is an INTEGER sum (counts and squared
    counts), so mean/std/z are bit-reproducible under any partitioning
    — the engine-wide exact-moments recipe (corr_qty_price) with no
    decimal routing needed.

    Scale: two aggregations (hour buckets, then per-type moments —
    |types| rows broadcast back); the raw events are touched once."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"))
    m = h.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = h.join(F.broadcast(m), "event_type")
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var))
    return j.select(
        "event_type",
        F.unix_micros("hr").alias("hour_us"),
        F.col("n").cast("bigint").alias("n"),
        F.round(mean, 9).alias("mean_n"),
        F.round(z, 9).alias("z"),
        F.coalesce(F.abs(z) >= 3.0, F.lit(False)).alias("is_anomaly"),
    ).orderBy("event_type", "hour_us")
