"""Parquet table loader for the driver's synthetic testdata.

Analog of the reference's table scan (S2, reference pipeline/queries.go:164-186),
except the scan is a distributed columnar parquet read with predicate
pushdown and column pruning supplied by Catalyst, not a row cursor.

At 100 TB these reads would be partitioned-directory parquet/iceberg scans;
the API surface here is identical (``spark.read.parquet(path)``), so the
only scale change is the path layout and partition-pruning predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mbta_etl_spark.session import tune_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Never collects; callers keep the plan lazy.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as a long (``nanosAsLong``) and truncate to
    microseconds as TIMESTAMP_NTZ — the same truncation DuckDB applies, so
    oracle comparisons agree.
    """
    tune_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so arbitrary SQL runs
    against them — the engine-level analog of the reference's generic SQL
    cursor (S2, queries.go:164-186: any SQL string in, rows out). With
    the views registered, ``spark.sql(query)`` IS that surface, with
    Catalyst planning instead of SQLite's VDBE."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Arbitrary-SQL entry point over the registered testdata views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
