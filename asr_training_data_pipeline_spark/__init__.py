"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ASR-training-data pipeline
(saemidevch-code/asr-training-data-pipeline), re-expressed Spark-first
and extended with LLM-training-data operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``     : SparkSession factory tuned for the target scale.
- ``sources``     : table loaders (parquet star schema), binary/audio
                    readers, deterministic ASR stub scans.
- ``functions``   : scalar column-expression libraries (text
                    normalization, boundary math, DSP pandas UDFs).
- ``operators``   : composite operators (LCS alignment, gap
                    sessionization, dedup family, similarity search,
                    text analysis, clip assembly).
- ``plans``       : end-to-end pipeline plans (the reference's full
                    dataflow as one lazy DataFrame program).
- ``streaming``   : Structured Streaming forms (session windows,
                    watermarked aggregation).
- ``sinks``       : writers (TSV metadata, JSON summaries, CSV
                    coverage, partitioned binary clips).
- ``queries``     : the registry the driver contract
                    (``__spark_entry__.py``) exposes.
"""

__version__ = "0.1.0"
