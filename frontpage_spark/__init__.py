"""frontpage_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference pipeline (CurtLH/frontPage),
re-expressed Spark-first, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``     SparkSession factory with scale-tuned defaults
- ``schemas``     StructTypes for the raw/clean/dim/testdata tables
- ``sources``     parquet/csv/text loaders (testdata adapters)
- ``functions``   reference scalar library F1–F16 as Column builders (no UDFs)
- ``html``        the one pandas_udf family (HTML field extraction)
- ``pipeline``    raw→clean projection + enrichment + dedup-write
- ``incremental`` anti-join delta scan + Structured Streaming wrapper
- ``conform``     conformance invariants (temporal + referential)
- ``ext``         dedup / similarity / textstats / multimodal operators
"""

__version__ = "0.1.0"
