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
    for b in range(n_batches):
        part_dir = os.path.join(in_dir, f"_stage{b}")
        df.filter(F.col(split_col) % n_batches == b).coalesce(1).write.mode(
            "overwrite"
        ).json(part_dir)
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.json"))
        os.rename(part_file, os.path.join(in_dir, f"batch_{b}.json"))
        shutil.rmtree(part_dir, ignore_errors=True)
