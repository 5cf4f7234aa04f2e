"""S3 — upsert sink (reference pipeline/load.go:6-39).

The reference does a transactional ``INSERT OR REPLACE`` keyed on the
``id`` PRIMARY KEY — last write wins, all-or-nothing. Plain parquet has no
MERGE, so the idiomatic stand-in is read-merge-rewrite with a
window-dedup (SURVEY §2.1 S3): union the new batch with the existing
table, keep the newest row per key, write to a staging dir, atomically
swap. With a transactional table format (Delta/Iceberg) this whole module
collapses to ``MERGE INTO target USING batch ON key``.

Scale shape: the merge is one shuffle keyed on ``id``. At 100 TB you would
(a) partition the table (e.g. by route/day) and rewrite only partitions
containing incoming keys (the batch's key→partition map is small and
driver-computable), or (b) use a format with merge-on-read. The
all-or-nothing property is kept by the staging-dir swap: readers see the
old table until the rename.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mbta_etl_spark.operators.core import latest_by_key


def upsert_parquet(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "id",
    version_col: str = "ingested_at",
) -> None:
    """Last-write-wins merge of ``batch`` into the parquet table at
    ``path``. Ties on ``version_col`` prefer the incoming batch (the
    reference's REPLACE always wins, load.go:14)."""
    new = batch.withColumn("_src", F.lit(1))
    if os.path.exists(path):
        old = spark.read.parquet(path).withColumn("_src", F.lit(0))
        merged = new.unionByName(old)
    else:
        merged = new
    winner = latest_by_key(
        merged, [key], [F.desc(version_col), F.desc("_src")]
    ).drop("_src")

    staging = path.rstrip("/") + "._staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    winner.write.mode("overwrite").parquet(staging)
    # all-or-nothing swap (reference rolls back the transaction on error,
    # load.go:11; here failures before the swap leave the table untouched)
    if os.path.exists(path):
        old_dir = path.rstrip("/") + "._old"
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.rename(path, old_dir)
        os.rename(staging, path)
        shutil.rmtree(old_dir)
    else:
        os.rename(staging, path)
