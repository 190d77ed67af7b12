"""flink_demo_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ``happy-place/flink-demo`` (Flink 1.12
demo suite), re-expressed Spark-first: declarative DataFrame / Spark
SQL plans optimized by Catalyst, Structured Streaming for the
streaming surface, and Arrow-batched pandas UDFs only where built-in
operators genuinely cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (AQE, tuned shuffle partitions)
- ``catalog``    schema registry + loaders for the test tables
- ``functions``  scalar-function parity layer (Flink name -> Spark)
- ``operators``  reusable composite operators (as-of join, top-n,
                 dedup/MinHash-LSH, similarity search, sessionize, CEP)
- ``plans``      the query registry: every query from SURVEY.md §2
                 with its DuckDB oracle SQL
- ``sources``    batch/stream readers (parquet, csv, rate, file replay)
- ``streaming``  Structured Streaming pipelines + stateful operators
"""

__version__ = "0.1.0"
