"""Dataset maintenance: small-file compaction.

At 100 TB the silent killer is not one big job but millions of tiny
parquet part-files accreted by incremental appends — every downstream
scan pays a task per file and the driver pays listing time.
``compact_parquet`` rewrites a parquet dataset into ≈``target_rows``
rows per file. The new layout lands fully-written in a side directory
and is swapped in with two renames — a reader can never observe a
half-written MIX of layouts, but the swap itself is NOT atomic: a
read issued inside the brief two-rename window fails with
path-not-found, and an in-flight scan that listed the old files can
lose them to the final cleanup. Run it in a maintenance window, or at
production scale use a table format whose metadata swap is atomic
(Iceberg/Delta) with this same rewrite underneath. If the process
dies between the renames, the data is intact at ``<path>__old_<hex>``
— rename it back to recover.

Row-count–based sizing is deliberate: it needs no sampling pass
(Spark's written-file byte sizes are only known after the write), and
a caller tuning for bytes divides their target bytes by the known row
width. Values are preserved exactly — only the file layout changes.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows: int = 1_000_000,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into
    ``ceil(n / target_rows)`` files. Returns a stats dict
    (rows, files_before, files_after). NOT safe under concurrent
    readers — see the module docstring for the swap-window contract.

    The repartition is round-robin (no key), so the rewrite is one
    balanced shuffle; callers who want clustering compose with
    ``repartition(col)`` / ``sortWithinPartitions`` before writing
    instead (see exports.write_training_shards).
    """
    df = spark.read.parquet(path)
    n = df.count()
    files_before = sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-n // target_rows))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return {"rows": n, "files_before": files_before, "files_after": files_after}
