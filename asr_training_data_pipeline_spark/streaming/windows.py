"""Structured Streaming forms (SURVEY §2.10): the reference's
gap-bridging has an exact streaming analog in ``session_window``,
and late/out-of-order handling (absent in the reference) comes from
watermarked event-time windows.

Local tests drive a bounded parquet stream to completion with
``processAllAvailable`` + a memory sink; on a real deployment the
same plans read Kafka and write exactly-once sinks via
``foreachBatch``. The registered queries return the materialized
memory table so the driver contract (a plain DataFrame out) holds.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import dsum, dsum_sql
from ..registry import register
from ..sources.tables import load_table

def _probed_stream(spark: SparkSession, d: str) -> DataFrame:
    """Parquet stream whose schema comes from a one-off batch probe of
    the same directory (metadata-only): streaming sources require an
    explicit schema, and hard-coding one breaks whenever the driver
    regenerates testdata with different physical types (already
    happened once for events.ts). nanosAsLong is set first so a
    NANOS-typed generation probes as long instead of failing.

    The session timezone is pinned to UTC (idempotent, runtime-settable)
    before any NTZ→LTZ cast downstream: on a foreign session whose JVM
    defaults to a non-UTC zone, the cast would otherwise interpret naive
    values in local time and shift every unix_micros/window result
    relative to the naive-as-UTC DuckDB oracle. Mirrors
    sources/tables.py::load_table."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .format("parquet")
        .load(d)
    )


def _stage_dir(sf_dir: str, table: str) -> str:
    """FileStreamSource wants a directory (stateful queries resolve
    ``basePath`` strictly); the test fixtures are single files, so
    link each into a scratch dir once per (sf_dir, table)."""
    src = os.path.realpath(f"{sf_dir}/{table}.parquet")
    key = uuid.uuid5(uuid.NAMESPACE_URL, src).hex[:12]
    d = os.path.join(tempfile.gettempdir(), f"stream_src_{table}_{key}")
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, f"{table}.parquet")
    if not os.path.exists(dst):
        try:
            os.symlink(src, dst)
        except OSError:
            import shutil

            shutil.copyfile(src, dst)
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _probed_stream(spark, _stage_dir(sf_dir, "events"))
    # Normalize ts to TimestampType like sources/tables.py does for
    # batch reads (NANOS-as-long → micros division; NTZ → LTZ cast).
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def _run_to_memory(agg: DataFrame, mode: str = "complete") -> DataFrame:
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = agg.sparkSession
    return spark.table(name)


_TUMBLING_SQL = f"""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("streaming_tumbling_counts", oracle=_TUMBLING_SQL, tags=("streaming",))
def streaming_tumbling_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream.
    The bounded run drains the parquet source; results equal the
    batch GROUP BY date_trunc('hour') — which is the oracle, making
    this a streaming query with an EXACT batch-SQL oracle."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"), dsum("value", "sum_value")
    )
    out = _run_to_memory(agg, mode="complete")
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("window_start_us", "event_type")


_SLIDING_SQL = f"""
SELECT epoch_us(ws) AS window_start_us,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM (
  SELECT date_trunc('hour', ts) AS ws, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("streaming_sliding_counts", oracle=_SLIDING_SQL, tags=("streaming",))
def streaming_sliding_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) watermarked windows — 2-hour window, 1-hour
    slide — over the events stream. Each event lands in exactly two
    epoch-aligned windows (starts at floor_hour(t) and
    floor_hour(t)−1h), so the EXACT batch oracle is a UNION ALL of the
    two shifted hour-truncations grouped together. Completes the
    tumbling/sliding/session trio from SURVEY §2.10."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"), dsum("value", "sum_value")
    )
    out = _run_to_memory(agg, mode="complete")
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("window_start_us", "event_type")


_SESSION_SQL = f"""
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), numbered AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start_us
"""


@register("streaming_session_window", oracle=_SESSION_SQL, tags=("streaming", "session"))
def streaming_session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window(ts, '30 minutes')`` — the native streaming
    form of the reference's gap-bridging (W1). Oracle: the batch
    lag+cumsum sessionization (identical session boundaries by
    definition: a session closes when the next event is > gap away).

    Session start/end are reported as min/max event times (the
    engine's convention; Spark's session_window.end = last + gap)."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes"), F.col("user_id")
    ).agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
    )
    out = _run_to_memory(agg, mode="complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("first_ts")).alias("session_start_us"),
        F.unix_micros(F.col("last_ts")).alias("session_end_us"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start_us")


_STREAM_DEDUP_SQL = """
SELECT DISTINCT sha256(text) AS content_hash
FROM documents
ORDER BY content_hash
"""


@register("streaming_dedup_exact", oracle=_STREAM_DEDUP_SQL, tags=("streaming", "dedup"))
def streaming_dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup ON A STREAM — the streaming form of
    ``dedup_exact_hash`` and the canonical continuous-ingest op for a
    training-data pipeline: ``dropDuplicates`` holds the seen-hash set
    in the state store and emits each content hash exactly once.
    The emitted hash SET is order-independent, so the EXACT batch
    oracle is ``SELECT DISTINCT sha256(text)``.

    Scale: state is one 32-byte key per distinct document, hash-
    partitioned across the cluster (RocksDB state store on a real
    deployment); with event-time columns a
    ``withWatermark + dropDuplicatesWithinWatermark`` bounds state for
    truly unbounded streams."""
    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    dedup = raw.select(F.sha2("text", 256).alias("content_hash")).dropDuplicates(
        ["content_hash"]
    )
    out = _run_to_memory(dedup, mode="append")
    return out.orderBy("content_hash")


_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id, e.event_id AS error_id,
       c.user_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 6 HOUR
ORDER BY click_id, error_id
"""


@register(
    "streaming_interval_join", oracle=_INTERVAL_JOIN_SQL, tags=("streaming", "join")
)
def streaming_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each click joined to the same
    user's error events in the following 6 hours — both sides
    watermarked so state for out-of-range rows is dropped as event
    time advances (the funnel/attribution join shape). The bounded
    run drains the source; results equal the batch range self-join,
    which is the oracle.

    Scale: state is bounded by watermark × per-user rate; the join
    keys on user_id so both streams hash-partition once and matching
    happens executor-local, exactly as it would against Kafka."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        F.expr(
            "c_user = e_user AND error_ts >= click_ts "
            "AND error_ts <= click_ts + interval 6 hours"
        ),
    )
    out = _run_to_memory(joined, mode="append")
    return out.select(
        "click_id",
        "error_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("error_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    ).orderBy("click_id", "error_id")


def _gate_sql() -> str:
    from ..operators.curation import _FN_QUALITY, _fused_sql

    return f"""
SELECT *, quality_score >= {_FN_QUALITY} AS keep
FROM ({_fused_sql()})
ORDER BY doc_id
"""


@register("streaming_curation_gate", oracle=_gate_sql(), tags=("streaming", "quality"))
def streaming_curation_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused curation gate ON A STREAM: the SAME projection the
    batch gate runs (operators.curation.fused_signals_projection —
    shared code, not a re-implementation) applied to a document
    stream with a keep decision per arriving document — gate-on-ingest,
    the shape a continuously-fed training corpus runs so a document is
    scored once, the moment it lands.

    Stateless append mode: no watermark, no state store — each
    micro-batch is a pure codegen'd projection, so throughput is scan
    throughput. Oracle: the batch signal SQL plus the same keep
    predicate (stream and batch must agree document-for-document,
    which is the unification guarantee Structured Streaming makes for
    stateless plans)."""
    from ..operators.curation import _FN_QUALITY, fused_signals_projection

    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    gated = fused_signals_projection(raw).withColumn(
        "keep", F.col("quality_score") >= _FN_QUALITY
    )
    out = _run_to_memory(gated, mode="append")
    return out.orderBy("doc_id")


@register("streaming_bloom_gate", oracle=None, tags=("streaming", "dedup", "sketch"))
def streaming_bloom_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom incremental probe ON A STREAM — sketch-gate-on-ingest:
    the corpus sketch is built ONCE batch-side (operators.dedup's
    ≤256-word bit_or aggregate), collected to the driver, and inlined
    into the stream projection as a 256-element literal array, so each
    arriving document is screened with two md5 positions and two array
    lookups — pure stateless codegen, no state store, no join at all
    (vs streaming_dedup_exact, whose seen-set state grows with the
    corpus). "definitely new" documents bypass the exact path; flagged
    ones escalate.

    Registered without its own SQL oracle because the result must
    EQUAL dedup_bloom_probe batch row-for-row (the stateless-plan
    unification guarantee) — tests/test_bloom.py pins exactly that
    frame equality, which transitively inherits the batch query's
    DuckDB oracle.

    The literal-sketch deployment is how a per-ingest-cycle filter
    ships at 100 TB: the model is KBs, rebuilt per cycle batch-side
    and pushed as a plan constant — no per-batch broadcast join, and
    the gate runs at scan throughput."""
    from ..operators.dedup import _BLOOM_BITS, _BLOOM_MOD, _bloom_frames

    bitmap, _probe = _bloom_frames(spark, sf_dir)
    bits = [0] * (_BLOOM_BITS // 32)
    for r in bitmap.collect():  # ≤256 scalar rows — the sketch model
        bits[int(r.w)] = int(r.bits)
    sketch = F.array(*[F.lit(int(b)).cast("long") for b in bits])

    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    key = F.when(
        F.col("text").isNotNull(),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)),
    )
    hx = F.md5(key)
    # bit tests need the shift-by-column SQL form; stage pos/word into
    # named columns first so the expression stays readable
    gated = (
        raw.filter(F.col("doc_id") % _BLOOM_MOD == 0)
        .withColumn("_hx", hx)
        .withColumn(
            "_p1",
            F.pmod(
                F.conv(F.substring(F.col("_hx"), 1, 15), 16, 10).cast("long"),
                F.lit(_BLOOM_BITS),
            ),
        )
        .withColumn(
            "_p2",
            F.pmod(
                F.conv(F.substring(F.col("_hx"), 17, 15), 16, 10).cast("long"),
                F.lit(_BLOOM_BITS),
            ),
        )
        .withColumn("_w1", F.element_at(sketch, (F.shiftright("_p1", 5) + 1).cast("int")))
        .withColumn("_w2", F.element_at(sketch, (F.shiftright("_p2", 5) + 1).cast("int")))
        .withColumn(
            "maybe_dup",
            F.expr("coalesce(((_w1 >> (_p1 & 31)) & 1) = 1, false)")
            & F.expr("coalesce(((_w2 >> (_p2 & 31)) & 1) = 1, false)"),
        )
        .select("doc_id", "maybe_dup")
    )
    out = _run_to_memory(gated, mode="append")
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------
# Streaming HLL: per-window distinct-user estimate from register state
# ---------------------------------------------------------------------

def _hll_stream_sql() -> str:
    from ..operators.sketches import _BUCKET_OFF, _HLL_M, _RHO_OFF, _rho_case

    hx = "md5(CAST(user_id AS VARCHAR))"
    return f"""
WITH cells AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         ('0x' || substr(hx, {_BUCKET_OFF}, 8))::BIGINT % {_HLL_M} AS b,
         {_rho_case(f"('0x' || substr(hx, {_RHO_OFF}, 8))::BIGINT")} AS rho,
         user_id
  FROM (SELECT ts, user_id, {hx} AS hx FROM events WHERE user_id IS NOT NULL)
),
regs AS (
  SELECT window_start_us, b, MAX(rho) AS m
  FROM cells GROUP BY window_start_us, b
),
fin AS (
  SELECT window_start_us,
         CAST(COUNT(*) AS BIGINT) AS live_registers,
         SUM(1::BIGINT << (33 - m)) + ({_HLL_M} - COUNT(*))::BIGINT
           * (1::BIGINT << 33) AS s,
         {_HLL_M} - COUNT(*) AS v
  FROM regs GROUP BY window_start_us
),
exact AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT f.window_start_us, f.live_registers, e.exact_users,
       CAST(CASE WHEN v > 0 AND {_HLL_NUM} // s <= {_HLL_LC_THRESH_MILLI}
                 THEN (list_extract([{_LC_LIST}], CAST(v AS INT))) // 1000
                 ELSE {_HLL_NUM} // (1000 * s) END AS BIGINT) AS hll_users
FROM fin f JOIN exact e ON e.window_start_us = f.window_start_us
ORDER BY f.window_start_us
"""


# placeholders resolved at import so the CTE above stays one f-string
from ..operators.sketches import (  # noqa: E402
    _HLL_LC_THRESH_MILLI,
    _HLL_M,
    _HLL_NUM,
    _LC_MILLI,
)

_LC_LIST = ", ".join(str(x) for x in _LC_MILLI[1:])


@register(
    "streaming_distinct_hll", oracle=_hll_stream_sql(), tags=("streaming", "sketch")
)
def streaming_distinct_hll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour DISTINCT-USER estimate maintained as streaming HLL
    register state: the streaming plan keeps only (window, bucket) →
    max(rho) — 64 integers per open window, merged incrementally by
    max as micro-batches arrive — where streaming COUNT(DISTINCT) is
    unsupported precisely because its state is the distinct set
    itself. Finalization (64 rows per window → one estimate) runs on
    the materialized register table; the watermark bounds state for
    late data exactly as in the tumbling-counts query.

    The oracle replays registers + finalization in batch SQL — the
    sketch is deterministic integer arithmetic end-to-end (md5-chunk
    bucket/rank ladder, precomputed linear-counting table), so the
    streaming result is hash-exact against DuckDB, not approximately
    checked. Calibration column: exact COUNT(DISTINCT) per window from
    the same bounded replay."""
    from ..operators.sketches import _hll_cols, _hll_estimate_cols, _rho_case

    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    # NULL user_id would hash to a NULL bucket — a phantom 65th
    # register that pushes live_registers past _HLL_M and drives the
    # empty-register count v negative; the exact COUNT(DISTINCT) side
    # ignores NULLs, so the calibration would silently diverge. Gate
    # exactly as hll_column_profile does (same filter in the oracle).
    hashed = ev.filter(F.col("user_id").isNotNull()).select(
        "ts", F.md5(F.col("user_id").cast("string")).alias("hx")
    )
    b, v = _hll_cols(F.col("hx"))
    cells = hashed.withColumn("b", b).withColumn("v", v).select(
        "ts", "b", F.expr(_rho_case("v")).alias("rho")
    )
    regs = cells.groupBy(F.window("ts", "1 hour"), "b").agg(
        F.max("rho").alias("m")
    )
    out = _run_to_memory(regs, mode="complete")
    # finalize sparse registers: empty buckets contribute 2^33 to S and
    # count into V without materializing the dense grid
    agg = out.groupBy("window").agg(
        F.count("*").cast("bigint").alias("live_registers"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 33 - cast(m as int))"))
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 33)
        ).alias("s"),
        (F.lit(_HLL_M) - F.count("*")).cast("bigint").alias("v"),
    )
    _, est = _hll_estimate_cols("s", "v")
    fin = agg.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "live_registers",
        est.alias("hll_users"),
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
        .select(F.unix_micros(F.col("h")).alias("window_start_us"), "exact_users")
    )
    return fin.join(exact, "window_start_us").select(
        "window_start_us", "live_registers", "exact_users", "hll_users"
    ).orderBy("window_start_us")


# ---------------------------------------------------------------------
# Streaming PSI drift monitor (token-distribution shift on ingest)
# ---------------------------------------------------------------------


def _psi_stream_sql() -> str:
    # Identical math to the batch token_psi_drift oracle: the streaming
    # side processes the odd-doc_id "new feed" while the even half is
    # the batch-side reference — exactly the in_a parity split.
    from ..operators.text_analysis import _PSI_SQL

    return _PSI_SQL


@register(
    "streaming_psi_monitor",
    oracle=_psi_stream_sql(),
    tags=("streaming", "drift", "sketch"),
)
def streaming_psi_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-PSI drift monitor ON A STREAM — distribution-shift
    detection at ingest time: the arriving feed (here the odd-doc_id
    half of the staged documents, the same parity split as the batch
    query) maintains ONLY a (lang, bucket) → count state — at most
    langs·1024 rows, CONSTANT in stream volume (the HLL-registers
    thesis applied to a frequency sketch) — and the PSI finalize runs
    batch-side on the materialized count table against the reference
    half's counts, reusing the exact shared finalize
    (operators.text_analysis.psi_report). Alarm reading is the batch
    query's: psi_micro > 250 000 means the feed has shifted.

    Exactness: bucket hash, smoothing, micro-nat quantization and the
    top-contributor argmin are the batch operator's own Columns, so
    the DuckDB oracle is the batch PSI SQL verbatim — the streaming
    result is hash-exact, not approximately checked.

    At 100 TB feeds: the stream-side state never grows (counts, not
    sets); the reference count grid ships as a ≤ langs·1024-row batch
    frame rebuilt per monitoring cycle — no per-batch corpus join.
    """
    from ..functions.casefold import FOLD_DST, FOLD_SRC
    from ..operators.text_analysis import psi_bucket_col, psi_report

    fold = lambda c: F.translate(c, FOLD_SRC, FOLD_DST)  # noqa: E731

    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    new_toks = (
        raw.filter(F.col("text").isNotNull() & (F.col("doc_id") % 2 == 1))
        .select(
            "lang", F.explode(F.split(fold(F.col("text")), " ")).alias("w")
        )
        .select("lang", psi_bucket_col("w").alias("b"))
    )
    scnt = new_toks.groupBy("lang", "b").agg(F.count("*").alias("cb"))
    stream_counts = _run_to_memory(scnt, mode="complete")

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ref = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            "lang", F.explode(F.split(fold(F.col("text")), " ")).alias("w")
        )
        .select("lang", psi_bucket_col("w").alias("b"))
        .groupBy("lang", "b")
        .agg(F.count("*").alias("ca"))
    )
    cnt = ref.join(stream_counts, ["lang", "b"], "full")
    return psi_report(cnt, docs.select("lang").distinct())


# ---------------------------------------------------------------------
# Streaming NEAR-dup gate: SimHash band index against arriving docs
# ---------------------------------------------------------------------

_SIMGATE_MOD = 5  # doc_id % MOD == 0 -> the arriving cycle (bloom's split)


def streaming_simhash_gate_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(streaming result, batch twin) for the near-dup ingest gate.

    The Bloom gate screens EXACT duplicates; this is its near-dup
    sibling: the existing corpus (doc_id % MOD != 0) is fingerprinted
    ONCE batch-side into a (band_id, band_key, matched_id, matched_fp)
    index, and each arriving document (doc_id % MOD == 0) computes its
    own 64-bit SimHash in the stream, derives 4×16-bit band keys, and
    stream-static-joins the index — a match verified by
    bit_count(xor) ≤ radius flags a near-duplicate of a SPECIFIC
    existing document. Output keys include band_id, so the frame is
    deterministic without any stateful dedup: ZERO state store, and
    the static side is one broadcastable band index (8-byte keys; at
    100 TB the index ships per ingest cycle like the Bloom literal,
    or co-partitions by band_key when it outgrows broadcast).

    No SQL oracle BY NATURE (xxhash64 fingerprints); instead the
    streaming frame is pinned EQUAL to the batch twin built from the
    same expressions — the stateless-plan unification guarantee the
    Bloom gate established."""
    from ..functions.text import whitespace_tokens_col
    from ..operators.dedup import (
        _HAMMING_MAX,
        _SIMHASH_BANDS,
        simhash_col,
    )

    docs = load_table(spark, sf_dir, "documents")

    def bands_of(fp_frame: DataFrame, id_out: str, fp_out: str) -> DataFrame:
        structs = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftright(F.col("fp"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("band_key"),
                )
                for i in range(_SIMHASH_BANDS)
            ]
        )
        return fp_frame.select(
            F.col("doc_id").alias(id_out),
            F.col("fp").alias(fp_out),
            F.explode(structs).alias("bk"),
        ).select(id_out, fp_out, "bk.band_id", "bk.band_key")

    corpus_fp = docs.filter(F.col("doc_id") % _SIMGATE_MOD != 0).select(
        "doc_id", simhash_col(whitespace_tokens_col("text")).alias("fp")
    )
    index = bands_of(corpus_fp, "matched_id", "matched_fp")

    def gate(arrivals: DataFrame) -> DataFrame:
        fp = arrivals.filter(F.col("doc_id") % _SIMGATE_MOD == 0).select(
            "doc_id", simhash_col(whitespace_tokens_col("text")).alias("fp")
        )
        ham = F.bit_count(F.col("fp").bitwiseXOR(F.col("matched_fp")))
        return (
            bands_of(fp, "doc_id", "fp")
            .join(F.broadcast(index), ["band_id", "band_key"])
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= _HAMMING_MAX)
            .select("doc_id", "band_id", "matched_id", "hamming")
        )

    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    streamed = _run_to_memory(gate(raw), mode="append").orderBy(
        "doc_id", "band_id", "matched_id"
    )
    batch_twin = gate(docs).orderBy("doc_id", "band_id", "matched_id")
    return streamed, batch_twin


@register("streaming_simhash_gate", oracle=None, tags=("streaming", "dedup", "lsh"))
def streaming_simhash_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate ingest gate ON A STREAM — see
    :func:`streaming_simhash_gate_frames`. tests/test_dedup.py pins
    stream == batch-twin frame equality."""
    streamed, _ = streaming_simhash_gate_frames(spark, sf_dir)
    return streamed


# ---------------------------------------------------------------------
# Streaming AUDIO near-dup gate: the multimodal sibling of the SimHash
# gate — same band-index machinery, spectral fingerprint kernel.
# ---------------------------------------------------------------------


def streaming_audio_gate_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(streaming result, batch twin) for the audio near-dup ingest
    gate — the stretch sibling of :func:`streaming_simhash_gate_frames`
    (VERDICT r9 task 8): the existing clip corpus (media_id % MOD != 0)
    is fingerprinted ONCE batch-side by ``audio_ahash`` into a
    (band_no, band_val, matched_id, matched_fp) index; each ARRIVING
    clip (media_id % MOD == 0) decodes + hashes IN THE STREAM (the
    Arrow ``mapInPandas`` kernel is stateless, so it runs on a
    streaming frame unchanged), derives the same 4×16-bit band keys
    JVM-side, and stream-static-joins the broadcast index; a match
    verified by bit_count(xor) ≤ radius flags the arriving clip as a
    near-duplicate of a SPECIFIC existing clip. ZERO state store —
    with the batch canonical manifest (multimodal_audio_canonical)
    this closes the dense-corpus audio-dedup story end-to-end: batch
    decides, the gate screens arrivals statelessly.

    No SQL oracle BY NATURE (FFT kernel); the streaming frame is
    pinned EQUAL to the batch twin built from the same expressions."""
    from ..operators.multimodal import (
        _PHASH_HAMMING_MAX,
        audio_ahash,
        media_projection,
        phash_band_structs,
    )

    def bands_of(hash_frame: DataFrame, id_out: str, fp_out: str) -> DataFrame:
        return hash_frame.select(
            F.col("media_id").alias(id_out),
            F.col("phash").alias(fp_out),
            F.explode(phash_band_structs()).alias("bk"),
        ).select(id_out, fp_out, "bk.band_no", "bk.band_val")

    docs = load_table(spark, sf_dir, "documents")
    corpus = media_projection(
        docs.filter(F.col("doc_id") % _SIMGATE_MOD != 0)
    )
    index = bands_of(audio_ahash(corpus), "matched_id", "matched_fp")

    def gate(arrivals: DataFrame) -> DataFrame:
        clips = media_projection(
            arrivals.filter(F.col("doc_id") % _SIMGATE_MOD == 0)
        )
        ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("matched_fp")))
        return (
            bands_of(audio_ahash(clips), "media_id", "phash")
            .join(F.broadcast(index), ["band_no", "band_val"])
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= _PHASH_HAMMING_MAX)
            .select("media_id", "band_no", "matched_id", "hamming")
        )

    raw = _probed_stream(spark, _stage_dir(sf_dir, "documents"))
    streamed = _run_to_memory(gate(raw), mode="append").orderBy(
        "media_id", "band_no", "matched_id"
    )
    batch_twin = gate(docs).orderBy("media_id", "band_no", "matched_id")
    return streamed, batch_twin


@register(
    "streaming_audio_gate", oracle=None, tags=("streaming", "dedup", "multimodal")
)
def streaming_audio_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup ingest gate ON A STREAM — see
    :func:`streaming_audio_gate_frames`. tests/test_phash.py pins
    stream == batch-twin frame equality."""
    streamed, _ = streaming_audio_gate_frames(spark, sf_dir)
    return streamed
