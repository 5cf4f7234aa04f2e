from __future__ import annotations

import os
import sys

import pytest

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

# --- dev-environment protobuf shim (tests only) -------------------------
# The sandbox has no pip-installed protobuf, which Spark's
# transformWithStateInPandas tier needs (its state client speaks protobuf
# to the JVM). The container's Google Cloud SDK bundles a pure-Python
# protobuf 6.32 runtime; PySpark 4.1's gencode is 6.33 — one minor ahead —
# so we use protobuf's own official escape hatch for the skew. Both the
# driver-side import and the Python workers (forked from the JVM, which
# inherits this process's env) pick these up, as long as they are set
# BEFORE the first SparkSession launches — hence module scope here.
# path/env-var constants shared with the post-launch shim
# (streaming/stateful.ensure_protobuf_runtime) via protoshim, so the
# two copies can never drift; protoshim imports nothing, so pulling it
# in before the shim is applied is safe
from mbta_etl_spark.protoshim import (  # noqa: E402
    SDK_PROTOBUF_PATH as _SDK_PROTOBUF,
    VERSION_CHECK_ESCAPE_ENV as _PB_ESCAPE,
)

try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(os.path.join(_SDK_PROTOBUF, "google", "protobuf")):
        sys.path.append(_SDK_PROTOBUF)
        os.environ["PYTHONPATH"] = (
            os.environ.get("PYTHONPATH", "") + os.pathsep + _SDK_PROTOBUF
        ).lstrip(os.pathsep)
        os.environ.setdefault(_PB_ESCAPE, "true")

from mbta_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mbta_etl_spark-tests")
    yield spark
    spark.stop()


# Streaming equivalence entries (st01–st10) EXECUTE their replay inside
# the entry call — the only registry entries where calling the function
# costs seconds, not milliseconds. Two suite modules need their result
# (test_parity collects the rows, test_plan_hygiene reads the plan), so
# the entry runs ONCE per session and the returned DataFrame — a plain
# batch read of the standing output table the replay produced — is
# shared. Safe because the entries are idempotent by design (fresh
# scratch dir + per-batch-id overwrite sinks) and the cached DataFrame
# only re-reads the already-materialized output on re-collection.
# The PLAN text is captured eagerly at creation: once another consumer
# collects the DataFrame, its explain switches to the AQE final plan
# (different operator counts), which would break the snapshot match —
# the fingerprint must always describe the pre-execution plan, same as
# scripts/plan_snapshot.py records.
_ST_ENTRY_CACHE: dict = {}


@pytest.fixture
def st_entry_once(spark):
    def run(name: str, fn, want: str = "df"):
        if name not in _ST_ENTRY_CACHE:
            from mbta_etl_spark.plans.planmetrics import plan_text

            df = fn(spark, SF_DIR_SMALL)
            _ST_ENTRY_CACHE[name] = (df, plan_text(df))
        df, plan = _ST_ENTRY_CACHE[name]
        return plan if want == "plan" else df

    return run
