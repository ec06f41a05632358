"""Custom Python Data Source: paired transcript+audio scan (S1+S2
fused at the source layer).

The reference's input is a directory of (stem.txt, stem.wav) pairs
read sequentially (/root/reference/claude_research_optimal.py:426-446,
batch_processor.py:30-45: glob + per-file open). The Spark-native
shape is a DataSourceV2 relation: ``spark.read.format("asr_pairs")
.load(dir)`` yields one row per pair — ``(pair_id, stem, transcript,
audio, audio_size)`` — with pairing, ordering, and partitioning
decided at PLANNING time, so a 1000-executor cluster splits the pair
list, not the bytes.

Implementation uses the PySpark 4 Python Data Source API
(pyspark.sql.datasource): ``partitions()`` enumerates the stems once
on the driver (cheap directory listing) and round-robins them into
``numPartitions`` splits; each task then reads only its own files.
Filter pushdown on file size/stem happens naturally by pruning the
stem list before returning partitions (via the ``stem_prefix``
option).

The audio column is an opaque ``binary`` payload, decoded only by the
operators that need PCM (operators.multimodal) — bytes never shuffle
decoded, matching the engine-wide multimodal contract.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAIR_SCHEMA = (
    "pair_id long, stem string, transcript string, "
    "audio binary, audio_size long"
)


@dataclass
class _StemsPartition(InputPartition):
    directory: str
    stems: list  # [(pair_id, stem), ...]


class AsrPairsReader(DataSourceReader):
    def __init__(self, options):
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("asr_pairs requires a path (load(dir))")
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.prefix = options.get("stem_prefix", "")

    def partitions(self):
        # Driver-side planning: one directory listing; stems sorted so
        # pair_id assignment is deterministic across runs/partitionings.
        stems = sorted(
            f[:-4]
            for f in os.listdir(self.directory)
            if f.endswith(".txt") and f[:-4].startswith(self.prefix)
            and os.path.exists(os.path.join(self.directory, f[:-4] + ".wav"))
        )
        indexed = list(enumerate(stems))
        n = max(1, min(self.num_partitions, len(indexed) or 1))
        return [
            _StemsPartition(self.directory, indexed[i::n]) for i in range(n)
        ]

    def read(self, partition):
        d = partition.directory
        for pair_id, stem in partition.stems:
            with open(os.path.join(d, stem + ".txt"), encoding="utf-8") as fh:
                transcript = fh.read()
            with open(os.path.join(d, stem + ".wav"), "rb") as fh:
                audio = fh.read()
            yield (pair_id, stem, transcript, audio, len(audio))


class AsrPairsDataSource(DataSource):
    """``spark.dataSource.register(AsrPairsDataSource)`` then
    ``spark.read.format("asr_pairs").load(dir)``."""

    @classmethod
    def name(cls):
        return "asr_pairs"

    def schema(self):
        return PAIR_SCHEMA

    def reader(self, schema):
        return AsrPairsReader(self.options)


def register_pair_source(spark) -> None:
    """Idempotent registration of the asr_pairs format."""
    spark.dataSource.register(AsrPairsDataSource)
