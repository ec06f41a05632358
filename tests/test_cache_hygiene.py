"""Executor-storage hygiene: every cache point must go through the
slot registry (`caching.hold`) or carry an explicit unpersist pair.

The leak class this pins (VERDICT r6/r7): a raw ``.persist(`` on an
operator's reuse frame keeps its blocks alive for the session, so
repeated invocations in a long session (registry sweeps, benchmarks,
notebook use) accumulate orphaned caches in executor storage until
eviction thrash sets in. `caching.hold` bounds that — one replaceable
slot per cache point."""

from __future__ import annotations

from pathlib import Path

_PKG = Path(__file__).resolve().parent.parent / "asr_training_data_pipeline_spark"

# Files allowed to call .persist( directly because every persist is
# paired with an explicit .unpersist() in the same scope (the MinHash
# symmetric-band frame is persisted for exactly one job and released
# on both the success and failure paths).
_PAIRED_OK = {"operators/dedup.py"}


def test_no_raw_persist_outside_slot_registry():
    offenders = []
    for f in sorted(_PKG.rglob("*.py")):
        rel = f.relative_to(_PKG).as_posix()
        if rel == "caching.py":
            continue
        src = f.read_text()
        if ".persist(" not in src:
            continue
        if rel in _PAIRED_OK and ".unpersist()" in src:
            continue
        offenders.append(rel)
    assert not offenders, (
        f"raw .persist( outside caching.hold / documented pairs: {offenders}"
    )
