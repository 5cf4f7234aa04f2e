"""mbta_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MBTA ETL pipeline
(notLeoHirano/mbta-etl), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for the local harness and
                   configured the way we'd configure a large cluster (AQE,
                   broadcast thresholds, shuffle partitions).
- ``sources``    : batch/streaming sources (parquet test tables, the raw
                   vehicle JSON ingest mirroring reference extract.go).
- ``pipeline``   : the reference's Extract→Transform→Load semantics
                   (transform.go T1–T7, load.go upsert S3) as DataFrame ops.
- ``operators``  : reusable relational + LLM-data-pipeline operators
                   (top-k, conditional aggregation, discrete percentiles,
                   histograms, dedup, similarity search, text analysis,
                   multimodal plumbing).
- ``plans``      : the query registry binding operators to the driver's
                   testdata tables, plus the DuckDB oracle SQL for each.
- ``streaming``  : Structured Streaming variants of the ingest/upsert path.
"""

__version__ = "0.1.0"
