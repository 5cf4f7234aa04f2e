"""ETL orchestration (reference pipeline/pipeline.go:66-91): extract →
transform → load, any stage error aborts the run.

The reference's "real-time" model is re-running this batch per CLI
invocation with the upsert absorbing re-ingestion (SURVEY §2.6); the
streaming module offers the continuous variant of the same three stages.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

from mbta_etl_spark.pipeline.load import upsert_parquet
from mbta_etl_spark.pipeline.transform import transform
from mbta_etl_spark.sources import http_json

log = logging.getLogger(__name__)

DEFAULT_API_URL = "https://api-v3.mbta.com/vehicles"


def run(
    spark: SparkSession,
    table_path: str,
    api_url: str = DEFAULT_API_URL,
    body: str | None = None,
) -> int:
    """One ETL pass. ``body`` lets tests/offline runs inject a pre-fetched
    payload instead of hitting the network. Returns records loaded."""
    log.info("Starting ETL pipeline...")
    if body is None:
        body = http_json.fetch_json(api_url)  # abort-on-error (S1)
    raw = http_json.ingest_payload(spark, body)
    records = transform(raw)
    n = records.count()
    upsert_parquet(spark, records, table_path)
    log.info("ETL complete: %d records loaded", n)
    return n
