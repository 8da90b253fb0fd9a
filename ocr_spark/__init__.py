"""ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the data semantics of the reference
repo maiphh/ocr (snapshot at /root/reference) on Apache Spark:

- kernel/    pure pandas/NumPy span functions (no SparkSession needed)
- pipeline/  DataFrame orchestration: partitioning, mapInPandas,
             validation SQL exprs, merge, lineage/resume, sinks
- sources/   deterministic doc->spans synthesizer + DocTags reader
- functions/ text analysis, dedup (exact/minhash/simhash/jaccard), ANN
- streaming/ Structured Streaming variant of the extraction

Design stance (SURVEY.md §7.0): reference semantics live in the
kernel; Spark code stays thin and declarative so Catalyst/AQE pick
the physical plan. No per-row Python anywhere on the hot path — only
Arrow-batched pandas UDFs and built-in SQL expressions.
"""

__version__ = "0.1.0"
