"""Session-lifetime operator caches: one replaceable slot per cache
point.

Several operators persist a frame their own plan reads more than once
(the sq8 resident index, the MinHash signature/group frames, the
exact-dup collapse groups). The frame must outlive the query FUNCTION
— the returned DataFrame is lazy, so unpersisting before the caller
acts on it would defeat the cache — but re-invoking the same query in
a long session (registry sweeps, benchmarks) must not accumulate
orphaned RDD caches in executor storage. This registry bounds that:
each cache point names a slot, and taking a slot unpersists its
previous occupant (safe — an old returned frame silently recomputes
if touched again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def hold(
    slot: str, df: DataFrame, storage_level=None, eager: bool = False
) -> DataFrame:
    """Persist ``df`` as the named slot's occupant, unpersisting the
    slot's previous frame. Returns the persisted frame.

    ``eager=True`` materializes the cache NOW (one count job) instead
    of on first downstream touch. Use it when the frame is expensive
    to compute (an Arrow Python kernel) AND the consuming plan
    references it from independent branches (e.g. both sides of a
    self-join): lazy persist has no cross-stage lock, so branches
    scheduled in parallel before the cache is populated each compute
    the kernel themselves — observed as N ArrowEvalPython evaluations
    of the MinHash signature kernel inside one action at the 500k-doc
    fixture. The eager barrier costs one pass and guarantees exactly
    one kernel evaluation."""
    from pyspark import StorageLevel

    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already gone — nothing to release
    df = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _SLOTS[slot] = df
    if eager:
        df.count()
    return df


def release(slot: str) -> None:
    """Unpersist and drop the named slot's occupant, if any. Callers
    that pin a SUBSET of their usual slots (full_pipeline's ``pins``)
    release the rest so a mixed-query session does not carry a
    previous invocation's frames in executor storage — bounded to one
    frame per slot, but it competes with live caches and skews
    benchmarks (ADVICE r12)."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already gone — nothing to release
