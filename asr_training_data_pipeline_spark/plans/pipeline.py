"""The reference's full dataflow as ONE lazy Spark plan
(SURVEY §3.1: transcript ⋈ ASR → runs → sessions → clips → validate
→ boundary math → quality gates → metadata/summary).

The reference executes this as a sequential per-group Python loop
(/root/reference/claude_research_optimal.py:481-670). Here every
stage is a DataFrame transformation, so Catalyst fuses the scalar
math into codegen stages and the only materialization points are the
shuffles (alignment cogroup, group-by, windows) — the whole thing
parallelizes across pairs/groups on any cluster size.

Parameter defaults mirror the reference CLI
(claude_research_optimal.py:389-424): min_run=4, max_gap_words=2,
max_gap_time=0.5 s, start_pad=150 ms, end_pad=100 ms,
tail_safety=60 ms, start_guard=50 ms, adaptive guard base 250 ms,
min_dur=1.0 s, min_valid_words=2.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import davg
from ..operators.alignment import lcs_equal_runs
from ..registry import register
from ..sources import fixtures
from ..sources.asr_scan import asr_scan
from ..sources.tables import load_table


@dataclass(frozen=True)
class PipelineParams:
    min_run: int = 4
    max_gap_words: int = 2
    max_gap_time: float = 0.5
    start_pad_ms: int = 150
    end_pad_ms: int = 100
    tail_safety_ms: int = 60
    start_guard_ms: int = 50
    guard_base_ms: int = 250
    min_dur_s: float = 1.0
    min_valid_words: int = 2


P = PipelineParams()


def bridged_groups(runs_timed: DataFrame, p: PipelineParams = P) -> DataFrame:
    """W1 gap-bridging over equal runs
    (claude_research_optimal.py:291-305): runs sorted by ai0 merge
    while word-gap ≤ max_gap_words AND time-gap ≤ max_gap_time.

    ``runs_timed`` carries run_start/run_end from the alignment stage
    (lcs_equal_runs with_times=True) — no join back to the word table.
    """
    timed = runs_timed.select(
        "pair_id", "bi0", "bi1", "ai0", "ai1", "run_start", "run_end"
    )
    w = W.partitionBy("pair_id").orderBy("ai0")
    flagged = (
        timed.withColumn("prev_ai1", F.lag("ai1").over(w))
        .withColumn("prev_end", F.lag("run_end").over(w))
        .withColumn(
            "new_group",
            F.when(
                F.col("prev_ai1").isNull()
                | (F.col("ai0") - F.col("prev_ai1") > p.max_gap_words)
                | (F.col("run_start") - F.col("prev_end") > p.max_gap_time),
                1,
            ).otherwise(0),
        )
    )
    return flagged.withColumn(
        "group_id",
        F.sum("new_group").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).select("pair_id", "group_id", "bi0", "bi1", "ai0", "ai1", "run_start", "run_end")


def group_words(words: DataFrame, groups: DataFrame) -> DataFrame:
    """Assign each ASR word to its bridged group (idx ∈ [ai0, ai1))."""
    g = groups.select(
        F.col("pair_id").alias("g_pair"), "group_id", "ai0", "ai1"
    )
    return words.join(
        g,
        (F.col("pair_id") == F.col("g_pair"))
        & (F.col("idx") >= F.col("ai0"))
        & (F.col("idx") < F.col("ai1")),
    ).select("pair_id", "group_id", "idx", "text", "norm", "start", "end", "confidence")


def assemble_clips(gwords: DataFrame, groups: DataFrame, p: PipelineParams = P) -> DataFrame:
    """Per-group clip assembly + boundary math
    (claude_research_optimal.py:308-341, 527-585): aggregate the
    group's words, then neighbor-clamped padded boundaries, adaptive
    guard (C4), phoneme tail extension (C5), degenerate repair."""
    agg = gwords.groupBy("pair_id", "group_id").agg(
        F.min("start").alias("t_start"),
        F.max("end").alias("t_end"),
        F.count("*").cast("bigint").alias("n_words"),
        davg("confidence", "avg_conf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("text")))
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("clip_text"),
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("norm")))),
            lambda s: s["norm"],
        ).alias("clip_norms"),
        F.max_by("text", "idx").alias("last_text"),
    )
    pieces = groups.groupBy("pair_id", "group_id").agg(
        F.count("*").cast("bigint").alias("n_pieces")
    )
    clips = agg.join(pieces, ["pair_id", "group_id"])

    w = W.partitionBy("pair_id").orderBy("t_start")
    lw = F.lower(F.col("last_text"))
    last1 = F.right(lw, F.lit(1))
    last2 = F.right(lw, F.lit(2))
    phoneme_ext = (
        F.when(F.length(lw) < 3, 0)
        .when(lw.endswith("ing"), 60)
        .when(last1.isin("s", "z", "x", "f", "v"), 50)
        .when(last1.isin("t", "d", "k", "p", "n", "m", "g"), 40)
        .when(last2.isin("ce", "se", "ze", "ge", "ch", "sh", "th", "ng"), 50)
        .otherwise(0)
    )
    guard = (
        F.when(F.col("avg_conf") > 0.75, F.floor(F.lit(p.guard_base_ms) * 0.7))
        .when(F.col("avg_conf") < 0.6, F.floor(F.lit(p.guard_base_ms) * 1.3))
        .otherwise(F.lit(p.guard_base_ms).cast("long"))
    )
    b = (
        clips.withColumn("prev_end_ms", F.round(F.lag("t_end").over(w) * 1000).cast("long"))
        .withColumn("next_start_ms", F.round(F.lead("t_start").over(w) * 1000).cast("long"))
        .withColumn(
            "s_ms",
            F.greatest(
                F.greatest(
                    F.round(F.col("t_start") * 1000).cast("long") - p.start_pad_ms,
                    F.lit(0).cast("long"),
                ),
                F.coalesce(
                    F.col("prev_end_ms") + p.start_guard_ms, F.lit(0).cast("long")
                ),
            ),
        )
        .withColumn(
            "e_raw",
            F.round(F.col("t_end") * 1000).cast("long")
            + p.end_pad_ms
            + p.tail_safety_ms
            + phoneme_ext.cast("long"),
        )
        .withColumn(
            "e_ms",
            F.least(
                F.col("e_raw"),
                F.coalesce(F.col("next_start_ms") - guard, F.col("e_raw")),
            ),
        )
        .withColumn(
            "e_ms",
            F.when(F.col("e_ms") <= F.col("s_ms"), F.col("s_ms") + 1).otherwise(
                F.col("e_ms")
            ),
        )
    )
    return b.select(
        "pair_id",
        "group_id",
        "s_ms",
        "e_ms",
        ((F.col("e_ms") - F.col("s_ms")).cast("double") / 1000.0).alias("duration_s"),
        "n_words",
        "n_pieces",
        "avg_conf",
        "clip_text",
        "clip_norms",
    )


def validated_clips(
    spark: SparkSession, clips: DataFrame, p: PipelineParams = P
) -> DataFrame:
    """Validator consensus (S4 → J2 → W2 → F5): re-transcribe each
    clip with the validator scan, align, keep clips whose longest
    consensus span has ≥ min_valid_words
    (claude_research_optimal.py:492-510).

    Shuffle-free consensus: clips already carry ``clip_norms`` (built
    in the assembly aggregation) and the FUSED validator scan
    (validator_consensus_scan) re-transcribes, aligns, and reduces to
    the longest span inside one mapInPandas kernel — zero exchanges
    and one Python boundary between the scan and the span filter.
    The word-row forms of these operators (validator_scan,
    lcs_pairs_consensus) remain the public API for callers that need
    per-word output."""
    from ..sources.asr_scan import validator_consensus_scan

    best = validator_consensus_scan(spark, clips).select(
        "pair_id", "group_id", "best_len"
    )
    return (
        clips.join(best, ["pair_id", "group_id"], "left")
        .withColumn("best_len", F.coalesce("best_len", F.lit(0)))
        .filter(F.col("best_len") >= p.min_valid_words)
        .drop("best_len")
    )


def full_pipeline(
    spark: SparkSession,
    sf_dir: str,
    p: PipelineParams = P,
    validate: bool = True,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """The whole dataflow, lazily: returns the named intermediate
    stages so callers pick what to materialize.

    ``persist`` pins the fan-out subtrees (words, runs, gwords,
    clips) at MEMORY_AND_DISK: each feeds 2+ downstream branches
    (clips → kept/rejected/validator; gwords → assembly + consensus),
    and without a cache Spark re-executes the Python LCS cogroup once
    per branch. On a cluster the same reuse points are where you'd
    persist (or checkpoint past the lineage) — the stages above them
    are pandas-UDF work that does not get cheaper at scale.
    """
    from pyspark import StorageLevel

    def pin(df: DataFrame) -> DataFrame:
        return df.persist(StorageLevel.MEMORY_AND_DISK) if persist else df

    words = pin(fixtures.asr_words(spark, sf_dir))
    book = fixtures.book_tokens(spark, sf_dir)
    runs = pin(lcs_equal_runs(book, words, min_run=p.min_run, with_times=True))
    if persist:
        # Materialization barrier: populate the words+runs cache BEFORE
        # the downstream action. Without it, AQE materializes broadcast
        # subtrees (groups/pieces are broadcast sides) concurrently with
        # the first cache fill and re-executes the whole Python
        # alignment subtree — observed as a serial single-task stage
        # re-running the align UDF. One cheap count() turns every
        # downstream reference into a cache read.
        runs.count()
    groups = bridged_groups(runs, p)
    gwords = pin(group_words(words, groups))
    clips = pin(assemble_clips(gwords, groups, p))
    kept = clips.filter(F.col("duration_s") >= p.min_dur_s)
    rejected = clips.filter(F.col("duration_s") < p.min_dur_s).withColumn(
        "reason", F.lit("too_short")
    )
    exported = validated_clips(spark, kept, p) if validate else kept
    return dict(
        words=words,
        book=book,
        runs=runs,
        groups=groups,
        gwords=gwords,
        clips=clips,
        rejected=rejected,
        exported=exported,
    )


# ---------------------------------------------------------------------
# Registered queries (rows-only: order-sensitive LCS + pandas UDF
# stages are not SQL-expressible; semantics pinned by golden tests
# against difflib in tests/test_alignment.py / test_pipeline.py)
# ---------------------------------------------------------------------


@register("lcs_align_runs", tags=("alignment", "udf"))
def lcs_align_runs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equal-run alignment over the derived transcript/ASR fixture."""
    words = fixtures.asr_words(spark, sf_dir)
    book = fixtures.book_tokens(spark, sf_dir)
    return lcs_equal_runs(book, words, min_run=P.min_run).orderBy(
        "pair_id", "ai0"
    )


@register("bridge_runs_sessions", tags=("alignment", "session"))
def bridge_runs_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 gap-bridging of aligned runs into clip groups."""
    words = fixtures.asr_words(spark, sf_dir)
    book = fixtures.book_tokens(spark, sf_dir)
    runs = lcs_equal_runs(book, words, min_run=P.min_run, with_times=True)
    return bridged_groups(runs).orderBy("pair_id", "group_id", "ai0")


@register("asr_pipeline_clips", bench=True, tags=("pipeline", "udf"))
def asr_pipeline_clips_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: fixture → align → bridge → assemble → validate →
    quality-gate → clip metadata (the clips.tsv analog, SURVEY K3)."""
    stages = full_pipeline(spark, sf_dir)
    return stages["exported"].orderBy("pair_id", "group_id")


@register("asr_pipeline_summary", tags=("pipeline",))
def asr_pipeline_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 summary aggregates (claude_research_optimal.py:684-694):
    exported/rejected counts, rejection rate, run/group totals."""
    stages = full_pipeline(spark, sf_dir)
    n_runs = stages["runs"].count()
    n_groups = stages["groups"].select("pair_id", "group_id").distinct().count()
    n_exported = stages["exported"].count()
    n_rejected = stages["rejected"].count()
    rate = (
        round(100.0 * n_rejected / (n_exported + n_rejected), 2)
        if (n_exported + n_rejected)
        else 0.0
    )
    return spark.createDataFrame(
        [(n_exported, n_rejected, rate, n_runs, n_groups)],
        "exported long, rejected long, rejection_rate_pct double, "
        "equal_runs long, bridged_groups long",
    )


@register("asr_scan_stub", tags=("source", "udf"))
def asr_scan_stub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 inference-scan plumbing: mapInPandas + per-worker model
    singleton over the documents table (deterministic stub backend)."""
    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    return asr_scan(spark, docs.repartition(n_part)).orderBy("pair_id", "idx")
