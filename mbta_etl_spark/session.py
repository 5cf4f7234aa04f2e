"""SparkSession factory.

Local harness runs ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``), but
every config here is chosen as it would be on a 1000-executor cluster:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast conversion) so plans self-tune at any scale factor.
- ``spark.sql.shuffle.partitions`` modest for local testing; AQE coalesces
  it down, and on a real cluster this would be sized to ~2-3x total cores.
- Arrow enabled for any Pandas-UDF path (batched columnar transfer instead
  of row pickling).
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mbta_etl_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # by default AQE may not change the output partitioning of cached
        # plans, so a persisted shuffle keeps shuffle.partitions-many tiny
        # partitions and every downstream Arrow kernel pays a per-task
        # Python round-trip. Allowing it lets cached intermediates (the
        # dedup family's shingle/survivor tables) coalesce to data-sized
        # partitions — measured ~25% off the corpus-clean pipeline.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill files go to spark.local.dir. On a real cluster that is
    # executor-local NVMe; here the sandbox's disk writes at ~30 MB/s
    # (measured), which both throttles every shuffle-heavy query and adds
    # writeback-stall jitter. A tmpfs local dir is the faithful local
    # stand-in for cluster-local scratch (shuffle data at bench SF is MBs
    # against 126 G of tmpfs). Fallback: Spark's default (/tmp).
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_graft_local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not create.

    The correctness driver constructs its own SparkSession and hands it to
    ``queries()`` callables; only runtime-mutable confs can be set there.
    Timezone matters most: the oracle (DuckDB) works in naive/UTC
    timestamps, so the session must interpret parquet timestamps the same
    way.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — harmless, default is fine
    return spark
