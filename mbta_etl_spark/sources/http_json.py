"""S1 — HTTP JSON source (reference pipeline/extract.go:11-33).

The reference does a synchronous ``http.Get`` + ``json.Unmarshal`` of the
whole JSON:API envelope. Spark-first equivalent: the (tiny) payload is
fetched driver-side, and the ``data`` array becomes a DataFrame with the
declared raw schema — unknown JSON fields are dropped by the schema
projection, matching Go's ``json.Unmarshal`` behavior
(reference pipeline/extract.go:28).

Error semantics preserved: non-200 responses and malformed JSON abort the
run (tested in reference main_test.go:72-108) — we raise, nothing is
silently skipped.

At scale the same ``payload → DataFrame`` boundary holds: a fleet of
pollers lands JSON files on object storage and ``spark.read.schema(...)
.json(path)`` (or a file-stream source, see ``mbta_etl_spark.streaming``)
replaces ``ingest_payload``; the downstream transform is identical.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from mbta_etl_spark.pipeline.schema import RAW_VEHICLE_SCHEMA


class ExtractError(RuntimeError):
    """Raised on HTTP or JSON-decode failure (abort-the-run semantics,
    reference pipeline/extract.go:18-20,27-30)."""


def fetch_json(url: str, timeout: float = 30.0) -> str:
    """Driver-side HTTP GET. Fails on non-2xx like the reference
    (extract.go:18-20). Gated import so offline environments can still use
    ``ingest_payload`` with pre-fetched bodies."""
    try:
        from urllib.request import urlopen
    except ImportError as e:  # pragma: no cover
        raise ExtractError(f"urllib unavailable: {e}") from e
    try:
        with urlopen(url, timeout=timeout) as resp:
            # file:// responses carry status None — only HTTP(S) has a
            # status code to enforce (extract.go:18-20 semantics)
            status = getattr(resp, "status", None)
            if status is not None and (status < 200 or status >= 300):
                raise ExtractError(f"API returned status {status}")
            return resp.read().decode("utf-8")
    except ExtractError:
        raise
    except Exception as e:
        raise ExtractError(f"failed to fetch {url}: {e}") from e


def parse_payload(body: str) -> list[dict[str, Any]]:
    """Decode the JSON:API envelope; malformed JSON or a missing/invalid
    ``data`` array aborts (reference main_test.go:91-108)."""
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise ExtractError(f"failed to parse JSON: {e}") from e
    data = doc.get("data") if isinstance(doc, dict) else None
    if not isinstance(data, list):
        raise ExtractError("JSON envelope missing 'data' array")
    return data


def ingest_payload(spark: SparkSession, body: str) -> DataFrame:
    """Raw JSON body → DataFrame with the declared nested schema.

    The payload is driver-resident by construction (one API snapshot,
    ~hundreds of rows — reference README reports 373-522 vehicles), so
    ``createDataFrame`` is appropriate here; bulk reprocessing of archived
    snapshots should use :func:`ingest_files` instead.
    """
    rows = parse_payload(body)
    return spark.createDataFrame(rows, schema=RAW_VEHICLE_SCHEMA)


def ingest_files(spark: SparkSession, path: str) -> DataFrame:
    """Bulk path: read archived JSON-lines snapshots (one vehicle object
    per line) with the raw schema — fully distributed, schema-projected,
    ready for the same transform."""
    return spark.read.schema(RAW_VEHICLE_SCHEMA).json(path)
