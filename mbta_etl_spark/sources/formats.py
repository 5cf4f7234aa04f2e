"""Format round-trip and layout-aware scan surfaces.

The reference ingests one format (HTTP JSON → SQLite,
``pipeline/extract.go:11-33`` / ``load.go:6-39``); a Spark-first engine
must additionally guarantee *fidelity across storage formats* (JSONL /
CSV / parquet round-trips preserve values exactly) and *layout-aware
scanning* (partitioned writes prune at the directory level). These
helpers write to a caller-supplied scratch path with ``overwrite`` so
the registry entries built on them are idempotent and re-runnable.

Scale notes: a write+read round-trip is exactly what a 100 TB pipeline's
stage boundary does (stage N sinks, stage N+1 scans); the partitioned
variant is the layout that makes downstream per-source reads O(selected
partitions). The scratch location would be an object-store prefix in
production — the code path is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jsonl_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as JSON-lines and read it back with the SAME schema
    (schema pinned explicitly: JSONL carries no types, and letting the
    reader infer would silently widen/narrow columns)."""
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def csv_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as quoted CSV with header and read it back with the
    same schema — exercises quoting/escaping fidelity for free-text
    columns."""
    df.write.mode("overwrite").option("header", True).csv(path)
    return (
        df.sparkSession.read.schema(df.schema)
        .option("header", True)
        .csv(path)
    )


def orc_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC and read it back — the second columnar format
    Spark ships natively (vectorized reader, predicate pushdown into ORC
    stripe/row-group indexes, same PushedFilters surface as parquet).
    The round-trip pins type fidelity across the parquet->ORC boundary a
    mixed-lake pipeline crosses."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)


def partitioned_roundtrip(
    df: DataFrame, path: str, partition_col: str
) -> DataFrame:
    """Write ``df`` hive-partitioned by ``partition_col`` and read the
    directory tree back. A downstream filter on the partition column
    prunes whole directories (PartitionFilters in the plan) — the scan
    never opens unselected partitions' files."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    return df.sparkSession.read.parquet(path)


def compact_files(
    df: DataFrame, path: str, order_col: str, target_rows_per_file: int
) -> DataFrame:
    """Small-file compaction: rewrite ``df`` as ~count/target files,
    range-partitioned and sorted on ``order_col``. The two chronic 100 TB
    layout diseases this treats: (a) many tiny files from fine-grained
    ingest (per-file open/footer cost dominates the scan), (b) rows
    scattered across files so min/max footer stats prune nothing. After
    compaction each file owns a disjoint ``order_col`` range — a
    predicate on it skips whole files. The extra ``count()`` to size the
    job is one cheap metadata-ish pass; at scale you'd take it from the
    source table's stats instead."""
    import math

    n_files = max(1, math.ceil(df.count() / target_rows_per_file))
    (
        df.repartitionByRange(n_files, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def evolved_read(old_df: DataFrame, new_df: DataFrame, path: str) -> DataFrame:
    """Schema evolution on read: ``old_df`` (the legacy layout) and
    ``new_df`` (same columns plus additions) land as separate parquet
    batches under one root; the merged scan unions the footer schemas
    (``mergeSchema``) and backfills the legacy rows' missing columns
    with NULL — the standard additive-evolution contract of a long-lived
    100 TB ingest, where rewriting history for every new column is off
    the table. Merge cost is a distributed footer-schema union, O(#files
    footers), not a data rewrite; scans and pushdown are unaffected."""
    old_df.write.mode("overwrite").parquet(path + "/batch=legacy")
    new_df.write.mode("overwrite").parquet(path + "/batch=evolved")
    return (
        old_df.sparkSession.read.option("mergeSchema", True)
        .parquet(path + "/batch=legacy", path + "/batch=evolved")
    )


def scratch_dir(spark: SparkSession, tag: str) -> str:
    """Deterministic scratch path for round-trip entries.

    Location preference (round-8 optimization, guide §6): an explicit
    ``SPARK_GRAFT_SCRATCH_DIR``, else fast local scratch (``/dev/shm``
    tmpfs — the faithful local stand-in for the executor-local NVMe a
    cluster puts checkpoints/state stores/landings on; the sandbox's
    root disk writes at ~30 MB/s with writeback stalls, which taxed
    every streaming replay's checkpoint+state-store+landing I/O and the
    src-family round-trip writes inside the timed window), else the
    session warehouse dir, else the system temp dir — the correctness
    driver may run with any cwd/session config. The tmpfs path is
    namespaced by a hash of the warehouse dir so two sessions rooted in
    different cwds keep the per-warehouse isolation the old layout gave
    for free.

    SINGLE-PROCESS assumption, stated: the path is a pure function of
    (warehouse, tag), so TWO processes running the SAME entry at the
    SAME scale factor race on it (one rmtrees/lands while the other
    streams — measured in round 7 as STATE_STORE_CHECKPOINT_LOCATION_
    NOT_EMPTY when a parity sweep overlapped the pytest suite on
    st10). The driver, the suite, and bench each run entries in one
    process, and different SFs get different tags; just don't run the
    same entry+SF concurrently from separate processes."""
    import hashlib
    import os
    import tempfile

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "file:" + tempfile.gettempdir()
    ).removeprefix("file:")
    fast = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    # tmpfs is the DEFAULT only under a local[*] master (r9, ADVICE r8):
    # a single-process demo/bench run loses nothing if RAM-backed
    # scratch vanishes. On a cluster, silently putting checkpoints and
    # state stores on volatile /dev/shm would break the durability
    # contract the checkpoint exists for — there the env var is the
    # explicit opt-in (pointed at executor-local NVMe or the DFS).
    is_local = spark.conf.get("spark.master", "").startswith("local")
    if fast is None and is_local and os.path.isdir("/dev/shm"):
        ns = hashlib.md5(wh.encode()).hexdigest()[:8]
        fast = f"/dev/shm/mbta_etl_spark_scratch/{ns}"
    if fast is not None:
        try:
            os.makedirs(fast, exist_ok=True)
            if os.access(fast, os.W_OK):
                return f"{fast}/_roundtrip/{tag}"
        except OSError:
            pass  # fall through to the warehouse/tempdir chain
    base = wh
    try:
        os.makedirs(base, exist_ok=True)
        probe_ok = os.access(base, os.W_OK)
    except OSError:
        probe_ok = False
    if not probe_ok:
        base = os.path.join(tempfile.gettempdir(), "mbta_etl_spark_scratch")
    return f"{base}/_roundtrip/{tag}"


def incremental_manifest_read(
    old_df: DataFrame, new_df: DataFrame, path: str
) -> DataFrame:
    """Manifest-diff incremental ingestion: land ``old_df`` under
    ``path``, record the file manifest, append ``new_df``, re-list, and
    read back ONLY the files the manifest diff surfaced — the contract
    every incremental loader (cloud auto-ingest, lakehouse transaction
    logs) implements: previously processed files are never re-read, and
    the incremental pass costs O(new files) regardless of table size.

    The manifests here come from ``input_file_name()`` over the footer
    scan (self-contained for the demo); in production they come from the
    filesystem listing or the table format's log, and the diff is the
    same set difference. The driver-side collect holds file PATHS only —
    metadata, bounded by file count, never data."""
    from pyspark.sql import functions as F

    spark = old_df.sparkSession

    def _manifest() -> set[str]:
        return {
            r[0]
            for r in spark.read.parquet(path)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }

    old_df.write.mode("overwrite").parquet(path)
    before = _manifest()
    new_df.write.mode("append").parquet(path)
    fresh = sorted(_manifest() - before)
    return spark.read.parquet(*fresh)
