"""Deterministic replay-log landing for streaming/batch equivalence
entries (st01/st02): split a batch DataFrame into ``n_batches`` JSONL
files — one per intended micro-batch — so a file source with
``maxFilesPerTrigger=1`` under an availableNow trigger replays it as a
multi-batch stream. The split key is ``key % n_batches``, so the batch
composition is a pure function of the data (replayable, host-order
independent). Executors write the data; the driver only RENAMES the
single part file per batch (metadata work, O(n_batches))."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def land_replay_log(
    df: DataFrame, in_dir: str, n_batches: int, split_col: str
) -> None:
    import glob
    import os
    import shutil

    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    # ONE scan of the source: a hive-partitioned write on the batch id.
    # repartition(n, "_b") puts each batch id entirely in one task, so
    # every partition directory holds exactly one part file (one FILE
    # per intended micro-batch — maxFilesPerTrigger=1 then replays the
    # landing as exactly n_batches batches). The partition column stays
    # out of the JSON payload, so the replayed schema equals df.schema.
    staging = os.path.join(in_dir, "_staging")
    (
        df.withColumn("_b", (F.col(split_col) % n_batches).cast("int"))
        .repartition(n_batches, "_b")
        .write.partitionBy("_b")
        .mode("overwrite")
        .json(staging)
    )
    for b in range(n_batches):
        files = glob.glob(os.path.join(staging, f"_b={b}", "part-*.json"))
        if not files:  # an empty batch lands no file — nothing to replay
            continue
        (part_file,) = files
        os.rename(part_file, os.path.join(in_dir, f"batch_{b}.json"))
    shutil.rmtree(staging, ignore_errors=True)
