"""PySpark-native analytics engine with the data-processing and query
capabilities of the reference ETL pipeline
(GunavardhanParupelly/rta-registrations-pyspark-glue), re-expressed
Spark-first as a library of composable DataFrame transforms.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, legacy date parser).
- ``io``         : sources/sinks — csv/parquet scans, partitioned writes,
                   single-pass adaptive file sizing.
- ``sources``    : loaders for the test star schema + bronze fixtures.
- ``functions``  : scalar column-function library (dates, strings, hashing).
- ``operators``  : the reference's operator inventory (SURVEY.md §2) plus
                   large-scale training-data operators (dedup, similarity,
                   text analysis, multimodal plumbing).
- ``plans``      : pipeline assembly (clean → conform → resolve → star).
- ``streaming``  : Structured Streaming windows / stateful ops.

Everything is UDF-free public PySpark API unless noted; the few Python
paths use Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
