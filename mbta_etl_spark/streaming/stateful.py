"""Custom stateful streaming operator via applyInPandasWithState: a
per-user running profile (event count, value sum, last-seen timestamp)
maintained across micro-batches with explicit GroupState.

This is the escape hatch for stateful semantics Spark's built-in
streaming aggregations can't express (per-key custom accumulators,
decay logic, conditional resets). State lives in the state store —
checkpointed, recoverable, partitioned by the grouping key, so the
operator scales like any keyed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampNTZType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # fresh-state seed for last_us is None, not 0: a 0 seed would clamp
    # pre-1970 (negative-epoch) timestamps via max() and emit 1970-01-01
    # instead of MAX(ts)
    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pd.to_datetime(pdf["ts"]).astype("int64").max() // 1000)
        last_us = (
            batch_max_us if last_us is None else max(last_us, batch_max_us)
        )
    state.update((n, total, last_us))
    # sum_value emits RAW: readers round once at read time (r01's float
    # discipline — rounding here AND at read would double-round, and
    # Python round() is banker's while the SQL oracles round half-up)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) → per-user running profile,
    emitted once per group per micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_profile_batch(
    batch_df: DataFrame, batch_id: int, table_path: str
) -> None:
    """One idempotent foreachBatch merge of update-mode profile
    emissions into a standing per-user parquet table. Each emission is
    the key's FULL cumulative profile (the kernel folds state before
    emitting), so the merge is pure last-write-wins: replace the key's
    row, keep rows for keys absent from the batch. foreachBatch is
    at-least-once, so the merge follows st02's exactly-once
    discipline — the shared ``claim_batch`` guard skips the one batch
    a recovered checkpoint can redeliver (and fails loudly on an id
    regression), and ``atomic_publish`` commits data + batch id in one
    symlink swap. Scale shape: the merge shuffles profile ROWS (one
    per key seen in the batch + one per standing key), never raw
    events — the same table-state economics as the rollup merge."""
    import os

    from mbta_etl_spark.pipeline.load import (
        atomic_publish,
        batch_marker,
        claim_batch,
    )

    if not claim_batch(table_path, batch_id):
        return  # redelivered batch: already merged and published
    spark = batch_df.sparkSession
    # batch_df appears TWICE in the merged plan (anti-join probe +
    # union arm); an unpersisted micro-batch DataFrame may be
    # recomputed per appearance, re-executing the upstream
    # applyInPandasWithState subtree — and a state-store-backed
    # subtree must execute exactly once per batch. Pin it first
    # (ADVICE r7 item 1; Spark's foreachBatch docs make the same
    # persist-a-reused-batchDF recommendation).
    batch_df.persist()
    try:
        if os.path.exists(table_path):
            existing = spark.read.parquet(table_path)
            merged = existing.join(
                batch_df.select("user_id"), "user_id", "left_anti"
            ).unionByName(batch_df)
        else:
            merged = batch_df
        atomic_publish(merged, table_path, marker=batch_marker(batch_id))
    finally:
        batch_df.unpersist()


def start_profile_stream(
    events: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """events stream (user_id, ts, value) → continuously-merged
    per-user profile table at ``table_path`` (update-mode
    applyInPandasWithState + idempotent last-write-wins merge).
    Returns the StreamingQuery. ``available_now=True`` drains what's
    there and stops (bounded replays/tests; continuous is the
    production default — the st03 lesson)."""
    writer = (
        user_profile_stream(events)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda b, bid: merge_profile_batch(b, bid, table_path)
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)


def ensure_protobuf_runtime(spark) -> None:
    """Make a protobuf runtime importable on BOTH sides of an
    already-running session, so the transformWithStateInPandas tier
    (whose state client speaks protobuf to the JVM's state server) can
    run in a VANILLA session — the round-6 blocker for driver-checking
    this tier. The sandbox has no pip protobuf, but the container's
    Google Cloud SDK bundles a pure-Python runtime one minor behind
    PySpark's gencode; protobuf's own escape hatch covers the skew.

    Driver side: a plain sys.path append. Worker side is the measured
    part: Python workers are forked by the JVM with the env captured
    at JVM launch PLUS ``sc.environment`` — which IS consulted per
    Python function and is mutable post-launch — so appending to
    PYTHONPATH there reaches workers spawned after this call (probed
    on Spark 4.1: a vanilla session + this call runs
    transformWithStateInPandas end to end). A driver-importable
    protobuf is NOT sufficient to return early: if it resolves from
    the shim path (a prior call in this process patched sys.path, but
    THIS session's JVM launched without it), the session's worker
    environment still needs the patch — only a genuinely installed
    runtime (workers inherit site-packages) is a true no-op. Raises
    ImportError when no runtime can be found — a clear error instead
    of the worker's opaque crash. Path/env-var constants are shared
    with conftest.py's pre-launch shim via mbta_etl_spark.protoshim
    so the two copies can never drift."""
    import os
    import sys

    from mbta_etl_spark.protoshim import (
        SDK_PROTOBUF_PATH,
        VERSION_CHECK_ESCAPE_ENV,
    )

    try:
        import google.protobuf as _pb
    except ImportError:
        _pb = None
    if _pb is not None:
        pb_root = os.path.abspath(
            os.path.dirname(os.path.dirname(os.path.abspath(_pb.__file__)))
        )
        shim_root = os.path.abspath(SDK_PROTOBUF_PATH)
        # proper path containment, not a string prefix — a sibling dir
        # like <shim>_extras must count as a REAL install, not a shim
        # (ADVICE r7 item 2)
        from_shim = (
            os.path.commonpath([pb_root, shim_root]) == shim_root
        )
        if not from_shim:
            return  # real install: workers resolve it the same way
    elif not os.path.isdir(
        os.path.join(SDK_PROTOBUF_PATH, "google", "protobuf")
    ):
        raise ImportError(
            "transformWithStateInPandas needs a protobuf runtime: "
            "pip install protobuf (none importable, and no bundled "
            "SDK runtime found to shim)"
        )
    if SDK_PROTOBUF_PATH not in sys.path:
        sys.path.append(SDK_PROTOBUF_PATH)
    os.environ.setdefault(VERSION_CHECK_ESCAPE_ENV, "true")
    # also export to os.environ so a FUTURE session's JVM inherits it
    if SDK_PROTOBUF_PATH not in os.environ.get("PYTHONPATH", ""):
        os.environ["PYTHONPATH"] = (
            os.environ.get("PYTHONPATH", "")
            + os.pathsep
            + SDK_PROTOBUF_PATH
        ).lstrip(os.pathsep)
    env = spark.sparkContext.environment
    if SDK_PROTOBUF_PATH not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (
            env.get("PYTHONPATH", os.environ.get("PYTHONPATH", ""))
            + os.pathsep
            + SDK_PROTOBUF_PATH
        ).lstrip(os.pathsep)
    env[VERSION_CHECK_ESCAPE_ENV] = "true"


def running_extrema_stream(events: DataFrame) -> DataFrame:
    """The transformWithStateInPandas tier (Spark 4's successor to
    applyInPandasWithState): per-user running count + max value held in a
    named ValueState. Differences that matter at scale: state is
    schema'd and composable (multiple named ValueState/ListState/MapState
    per key instead of one tuple), timers replace the single timeout
    conf, and the state store backend is RocksDB — state spills to disk,
    so hot keys aren't bounded by executor heap.

    Requires the RocksDB state store provider (set by the caller/test
    via spark.sql.streaming.stateStore.providerClass) and a working
    protobuf runtime (PySpark serializes this API's state over proto;
    the test suite import-skips where protobuf is unavailable).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("mx", DoubleType())]
    )

    class _Extrema(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            cnt, mx = 0, float("-inf")
            if self._agg.exists():
                prev = self._agg.get()
                cnt, mx = int(prev[0]), float(prev[1])
            for pdf in rows:
                cnt += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._agg.update((cnt, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Extrema(),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TYPE_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def per_type_counts_stream(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with MAP state: per-user running count
    per event type, held in one MapState(event_type → n) rather than a
    wide tuple — the composable-state surface ValueState can't express
    (the key set grows with the data; a tuple schema is fixed).  Emits
    the full per-type table for each updated user every micro-batch.

    Scale shape: state per key is O(#distinct event types for that
    user), RocksDB-backed so the hot-key map spills to disk; the update
    is one point-read + point-write per (user, type) touched in the
    batch, not a rewrite of the whole map."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_schema = StructType([StructField("event_type", StringType())])
    val_schema = StructType([StructField("n", LongType())])

    class _PerType(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", key_schema, val_schema)

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for et, cnt in pdf["event_type"].value_counts().items():
                    k = (et,)
                    prev = (
                        int(self._counts.getValue(k)[0])
                        if self._counts.containsKey(k)
                        else 0
                    )
                    self._counts.updateValue(k, (prev + int(cnt),))
            types, ns = [], []
            for k, v in self._counts.iterator():
                types.append(k[0])
                ns.append(int(v[0]))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n": ns,
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_PerType(),
        outputStructType=TYPE_COUNT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


LAST_K_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_kept", LongType()),
        StructField("sum_kept", DoubleType()),
    ]
)


def last_k_values_stream(events: DataFrame, k: int = 3) -> DataFrame:
    """transformWithStateInPandas with LIST state: the last ``k`` values
    seen per user, appended per micro-batch and trimmed to the window —
    the bounded-buffer shape (recent-events features, fraud windows,
    dedup-within-last-N) that MapState/ValueState don't model. Emits the
    kept-window count and sum each time a user updates.

    Scale: state is O(k) per key by construction — the trim happens
    inside the processor, so the store never grows past k rows per key
    regardless of stream length."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    val_schema = StructType([StructField("v", DoubleType())])

    class _LastK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState("recent", val_schema)

        def handleInputRows(self, key, rows, timerValues):
            vals = [float(v[0]) for v in self._recent.get()]
            for pdf in rows:
                vals.extend(float(x) for x in pdf["value"])
            vals = vals[-k:]
            self._recent.put([(v,) for v in vals])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_kept": [len(vals)],
                    "sum_kept": [float(sum(vals))],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_LastK(),
        outputStructType=LAST_K_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("closed", StringType()),
    ]
)


def session_expiry_stream(events: DataFrame, idle_ms: int = 1000) -> DataFrame:
    """transformWithStateInPandas with TIMERS: per-user session counts
    that auto-close after ``idle_ms`` of processing-time inactivity.
    Every input batch refreshes the user's single timer; when it fires,
    handleExpiredTimer emits the final count flagged ``closed`` and
    clears state — the session-window / TTL-state pattern the old
    applyInPandasWithState timeout conf could only approximate with one
    global timeout mode. State per key: one ValueState + one timer.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = StructType([StructField("cnt", LongType())])

    class _Session(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._cnt = handle.getValueState("cnt", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            cnt = int(self._cnt.get()[0]) if self._cnt.exists() else 0
            for pdf in rows:
                cnt += len(pdf)
            self._cnt.update((cnt,))
            # one live timer per key: drop the stale one, arm the new TTL
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + idle_ms
            )
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "closed": ["open"]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            cnt = int(self._cnt.get()[0]) if self._cnt.exists() else 0
            self._cnt.clear()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "closed": ["closed"]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Session(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


RUN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("band", LongType()),
        StructField("run_len", LongType()),
        StructField("start_ts", TimestampNTZType()),
    ]
)


def run_length_stream(
    events: DataFrame, band_width: float = 20.0
) -> DataFrame:
    """Streaming form of q104's run-length state compression
    (operators/timeseries.compress_consecutive): per-key ValueState
    holds the OPEN run (band, length, start); each micro-batch folds its
    rows in event-time order, emitting a row per run it CLOSES — the
    transition-only stream a telemetry pipeline persists instead of the
    raw feed (LOCF reconstructs it; a steady signal emits ~nothing).

    State is O(1) per key (three longs), RocksDB-backed, checkpointed —
    the same recovery story as the other transformWithState operators.
    Output mode Append: closed runs are immutable facts. The open run
    is never emitted; a production variant adds a timer that flushes
    runs idle past a horizon (session_expiry_stream shows the timer
    plumbing)."""
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = StructType(
        [
            StructField("band", LongType()),
            StructField("run_len", LongType()),
            StructField("start_us", LongType()),
        ]
    )

    class _RunLength(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_run", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            open_band = open_len = open_start = None
            if self._open.exists():
                prev = self._open.get()
                open_band, open_len, open_start = (
                    int(prev[0]),
                    int(prev[1]),
                    int(prev[2]),
                )
            closed: list[tuple[int, int, int]] = []
            import math

            # a key's micro-batch may arrive as SEVERAL Arrow chunks;
            # event-time order only exists across the concatenation, so
            # collect all chunks and sort ONCE (stable mergesort keeps
            # equal-ts rows in arrival order as the tiebreak)
            batch = pd.concat(list(rows), ignore_index=True)
            if not batch.empty:
                batch = batch.sort_values("ts", kind="mergesort")
                ts_us = (
                    pd.to_datetime(batch["ts"]).astype("int64") // 1000
                ).tolist()
                for v, t_us in zip(batch["value"].tolist(), ts_us):
                    band = int(math.floor(float(v) / band_width))
                    if open_band is None:
                        open_band, open_len, open_start = band, 1, t_us
                    elif band == open_band:
                        open_len += 1
                    else:
                        closed.append((open_band, open_len, open_start))
                        open_band, open_len, open_start = band, 1, t_us
            if open_band is not None:
                self._open.update((open_band, open_len, open_start))
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "band": [c[0] for c in closed],
                        "run_len": [c[1] for c in closed],
                        "start_ts": [
                            pd.Timestamp(c[2] * 1000) for c in closed
                        ],
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunLength(),
        outputStructType=RUN_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
