"""Vehicle data model — Spark StructTypes for the reference's two record
shapes (SURVEY §1): the raw nested JSON:API payload (reference
model/model.go:8-30) and the normalized flat record (model/model.go:33-45,
DDL pipeline/pipeline.go:41-58)."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw API shape: JSON:API envelope data[] items. Three nullable attribute
# fields (speed, current_stop_sequence, bearing — pointer types in the
# reference, model/model.go:20,27,29); updated_at arrives as an RFC3339
# STRING and is parsed in transform (model/model.go:19).
RAW_ATTRIBUTES_SCHEMA = StructType(
    [
        StructField("updated_at", StringType()),
        StructField("speed", DoubleType()),
        StructField("revenue_status", StringType()),
        StructField("occupancy_status", StringType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("label", StringType()),
        StructField("direction_id", IntegerType()),
        StructField("current_stop_sequence", IntegerType()),
        StructField("current_status", StringType()),
        StructField("bearing", IntegerType()),
    ]
)

RAW_VEHICLE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("attributes", RAW_ATTRIBUTES_SCHEMA),
    ]
)

# Normalized flat record — all fields non-null after transform
# (reference model/model.go:33-45). `type`, `revenue_status`,
# `current_stop_sequence` are dropped (SURVEY §1.3).
VEHICLE_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("label", StringType(), False),
        StructField("latitude", DoubleType(), False),
        StructField("longitude", DoubleType(), False),
        StructField("speed", DoubleType(), False),
        StructField("direction_id", IntegerType(), False),
        StructField("current_status", StringType(), False),
        StructField("occupancy_status", StringType(), False),
        StructField("bearing", IntegerType(), False),
        StructField("updated_at", TimestampType(), False),
        StructField("ingested_at", TimestampType(), False),
    ]
)
