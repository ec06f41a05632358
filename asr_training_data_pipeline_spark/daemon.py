"""Custom Python-worker daemon: pre-imports the heavy libraries.

Spark forks every Python UDF worker from one daemon process
(``python -m pyspark.daemon``). A freshly forked worker inherits the
daemon's interpreter state by copy-on-write, so anything imported
HERE is free in every worker — while anything imported lazily inside
a worker costs ~1-3 s of "time to initialize Python workers" per
fork, which multiplies under a fork storm (several concurrent
pandas-UDF stages × 32 tasks, e.g. when AQE materializes independent
exchange subtrees in parallel and the idle-worker pool runs dry).

Measured on the full ASR pipeline plan at sf0.1 (local[32]): worker
init fell from ~28 s per MapInPandas task (14.8 min total) to
sub-second once pandas/pyarrow/numpy + the worker kernels are
daemon-resident.

Wired in by ``session.get_spark`` via ``spark.python.daemon.module``
(public conf, PythonWorkerFactory). The daemon must stay lean in one
dimension: do NOT create a SparkSession or touch the JVM here.
"""

from __future__ import annotations

# Heavy third-party imports first — these dominate cold-worker init.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# The serializer/worker machinery every UDF worker loads.
import pyspark.serializers  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.worker  # noqa: F401

# Light stdlib modules the engine's UDF kernels touch on unpickle.
import difflib  # noqa: F401
import hashlib  # noqa: F401
import re  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
