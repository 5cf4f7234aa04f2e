"""applyInPandasWithState: per-user running profile across micro-batches —
state must persist between batches via the checkpoint."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from mbta_etl_spark.streaming.stateful import user_profile_stream
from streamutil import drain_query

IN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("value", DoubleType()),
    ]
)


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for uid, ts, v in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts, "value": v}) + "\n")


def _drain(spark, src, sink, ckpt):
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src))

    # parquet sink can't do update mode — append each micro-batch's
    # emissions via foreachBatch instead
    def _append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        user_profile_stream(stream)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_query(q)


def test_stateful_profile_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(src, "b1.jsonl", [
        (1, "2024-01-01T10:00:00", 5.0),
        (1, "2024-01-01T10:05:00", 7.0),
        (2, "2024-01-01T09:00:00", 1.0),
    ])
    _drain(spark, src, sink, ckpt)

    _write(src, "b2.jsonl", [
        (1, "2024-01-01T11:00:00", 3.0),
        (3, "2024-01-01T12:00:00", 9.0),
    ])
    _drain(spark, src, sink, ckpt)

    import datetime as dt

    # latest emission per user wins (update-per-batch appends)
    rows = sorted(
        spark.read.parquet(sink).collect(),
        key=lambda r: (r["user_id"], r["n_events"]),
    )
    latest = {r["user_id"]: r for r in rows}
    assert latest[1]["n_events"] == 3
    assert latest[1]["sum_value"] == 15.0
    assert latest[1]["last_ts"] == dt.datetime(2024, 1, 1, 11, 0)
    assert latest[2]["n_events"] == 1
    assert latest[3]["sum_value"] == 9.0


def test_profile_stream_split_invariant_and_idempotent(spark, tmp_path):
    """st07's harness: the standing table produced by
    start_profile_stream (GroupState fold + last-write-wins merge)
    equals the one-shot batch aggregate REGARDLESS of how the replay
    splits — including keys spanning micro-batches, the cross-batch
    state path — and a redelivered batch id is skipped by the shared
    claim_batch guard instead of double-merging."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mbta_etl_spark.streaming.replay import (
        land_replay_log,
        open_replay_stream,
    )
    from mbta_etl_spark.streaming.stateful import (
        merge_profile_batch,
        start_profile_stream,
    )

    rows = [
        # user 1 spans all batches at n=4 (event_ids 0..3)
        (0, 1, "2024-01-01 10:00:00", 5.0),
        (1, 1, "2024-01-01 10:05:00", 7.0),
        (2, 1, "2024-01-01 11:00:00", 3.0),
        (3, 1, "2024-01-01 09:00:00", 2.5),
        # user 2: two batches
        (4, 2, "2024-01-01 09:00:00", 1.0),
        (5, 2, "2024-01-02 09:00:00", 4.0),
        # user 3: one event
        (6, 3, "2024-01-01 12:00:00", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    def _run(n_batches: int, tag: str):
        base = tmp_path / tag
        in_dir = str(base / "in")
        table = str(base / "profiles")
        ckpt = str(base / "ckpt")
        src = ev.withColumn("replay_key", F.col("event_id"))
        land_replay_log(src, in_dir, n_batches, "replay_key")
        stream = open_replay_stream(spark, in_dir, src.schema).select(
            "user_id", "ts", "value"
        )
        q = start_profile_stream(stream, table, ckpt, available_now=True)
        q.awaitTermination()
        return table, {
            r.user_id: (r.n_events, r.sum_value, r.last_ts)
            for r in spark.read.parquet(table).collect()
        }

    table4, split4 = _run(4, "n4")
    _, split1 = _run(1, "n1")
    expected = {
        1: (4, 17.5, dt.datetime(2024, 1, 1, 11, 0)),
        2: (2, 5.0, dt.datetime(2024, 1, 2, 9, 0)),
        3: (1, 9.0, dt.datetime(2024, 1, 1, 12, 0)),
    }
    assert split4 == expected
    assert split1 == expected

    # redelivery of the committed batch id must be a silent no-op
    bogus = spark.createDataFrame(
        [(1, 999, 999.0, dt.datetime(2030, 1, 1))],
        "user_id long, n_events long, sum_value double, last_ts timestamp_ntz",
    )
    merge_profile_batch(bogus, 3, table4)  # last committed id at n=4
    assert {
        r.user_id: (r.n_events, r.sum_value, r.last_ts)
        for r in spark.read.parquet(table4).collect()
    } == expected


def test_stateful_profile_rocksdb_state_store(spark, tmp_path):
    """The RocksDB-backed state store tier, actually executed: the same
    applyInPandasWithState profile runs with RocksDBStateStoreProvider,
    so per-key state spills to disk instead of the executor heap — the
    configuration that matters for hot-key state at 100 TB. (The
    transformWithStateInPandas API additionally needs a protobuf runtime,
    absent here; this pins the RocksDB store itself.)"""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        _write(src, "b1.jsonl", [
            (1, "2024-01-01T10:00:00", 5.0),
            (2, "2024-01-01T09:00:00", 1.0),
        ])
        _drain(spark, src, sink, ckpt)
        _write(src, "b2.jsonl", [(1, "2024-01-01T11:00:00", 3.0)])
        _drain(spark, src, sink, ckpt)

        rows = sorted(
            spark.read.parquet(sink).collect(),
            key=lambda r: (r["user_id"], r["n_events"]),
        )
        latest = {r["user_id"]: r for r in rows}
        assert latest[1]["n_events"] == 2
        assert latest[1]["sum_value"] == 8.0
        assert latest[2]["n_events"] == 1
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_accumulates(spark, tmp_path):
    """transformWithStateInPandas: running count/max survives across
    micro-batches in RocksDB-backed ValueState. The API serializes state
    over protobuf; skip where the protobuf runtime is unavailable (the
    operator itself is pure PySpark API surface)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mbta_etl_spark.streaming.stateful import running_extrema_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(IN_SCHEMA).json(str(src))

            def _append(batch_df, batch_id):
                batch_df.write.mode("append").parquet(sink)

            q = (
                running_extrema_stream(stream)
                .writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            drain_query(q)

        _write(src, "b1.jsonl", [
            (1, "2024-01-01T10:00:00", 5.0),
            (1, "2024-01-01T10:05:00", 7.0),
            (2, "2024-01-01T09:00:00", 1.0),
        ])
        drain()
        _write(src, "b2.jsonl", [(1, "2024-01-01T11:00:00", 3.0)])
        drain()

        rows = sorted(
            spark.read.parquet(sink).collect(),
            key=lambda r: (r["user_id"], r["n_events"]),
        )
        latest = {r["user_id"]: r for r in rows}
        assert latest[1]["n_events"] == 3
        assert latest[1]["max_value"] == 7.0
        assert latest[2]["n_events"] == 1
        assert latest[2]["max_value"] == 1.0
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_map_state_per_type(spark, tmp_path):
    """transformWithStateInPandas with MapState: per-(user, event_type)
    counts accumulate across micro-batches — the growing-key-set state
    shape a fixed ValueState tuple cannot hold."""
    import pytest
    from pyspark.sql.types import StringType

    pytest.importorskip("google.protobuf.descriptor")
    from mbta_etl_spark.streaming.stateful import per_type_counts_stream

    in_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def write(name, rows):
            with open(src / name, "w") as f:
                for uid, et in rows:
                    f.write(json.dumps({"user_id": uid, "event_type": et}) + "\n")

        def drain():
            stream = spark.readStream.schema(in_schema).json(str(src))

            def _append(batch_df, batch_id):
                batch_df.write.mode("append").parquet(sink)

            q = (
                per_type_counts_stream(stream)
                .writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            drain_query(q)

        write("b1.jsonl", [(1, "click"), (1, "click"), (1, "view"), (2, "view")])
        drain()
        write("b2.jsonl", [(1, "click"), (2, "purchase")])
        drain()

        rows = spark.read.parquet(sink).collect()
        latest: dict = {}
        for r in rows:
            k = (r["user_id"], r["event_type"])
            latest[k] = max(latest.get(k, 0), r["n"])
        assert latest[(1, "click")] == 3
        assert latest[(1, "view")] == 1
        assert latest[(2, "view")] == 1
        assert latest[(2, "purchase")] == 1
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_list_state_last_k(spark, tmp_path):
    """transformWithStateInPandas with ListState: a bounded last-k buffer
    per user survives micro-batches and never exceeds k."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mbta_etl_spark.streaming.stateful import last_k_values_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(IN_SCHEMA).json(str(src))

            def _append(batch_df, batch_id):
                batch_df.write.mode("append").parquet(sink)

            q = (
                last_k_values_stream(stream, k=3)
                .writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            drain_query(q)

        _write(src, "b1.jsonl", [
            (1, "2024-01-01T10:00:00", 1.0),
            (1, "2024-01-01T10:01:00", 2.0),
            (1, "2024-01-01T10:02:00", 3.0),
            (1, "2024-01-01T10:03:00", 4.0),
        ])
        drain()
        _write(src, "b2.jsonl", [(1, "2024-01-01T11:00:00", 10.0)])
        drain()

        rows = sorted(
            spark.read.parquet(sink).collect(), key=lambda r: r["sum_kept"]
        )
        # batch 1: window [2,3,4] (k=3); batch 2: window [3,4,10]
        assert [(r["n_kept"], r["sum_kept"]) for r in rows] == [
            (3, 9.0),
            (3, 17.0),
        ]
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_timers_session_expiry(spark, tmp_path):
    """transformWithStateInPandas ProcessingTime timers: an idle user's
    session closes via handleExpiredTimer on a later micro-batch."""
    import time as _time

    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mbta_etl_spark.streaming.stateful import session_expiry_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(IN_SCHEMA).json(str(src))

            def _append(batch_df, batch_id):
                batch_df.write.mode("append").parquet(sink)

            q = (
                session_expiry_stream(stream, idle_ms=500)
                .writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            # an armed-but-unexpired timer keeps an availableNow query
            # alive waiting to fire it; bound the wait and stop manually
            q.awaitTermination(20)
            if q.isActive:
                q.stop()

        _write(src, "b1.jsonl", [
            (1, "2024-01-01T10:00:00", 1.0),
            (1, "2024-01-01T10:01:00", 2.0),
        ])
        drain()
        _time.sleep(1.5)  # let the 500ms processing-time TTL lapse
        _write(src, "b2.jsonl", [(2, "2024-01-01T11:00:00", 9.0)])
        drain()

        rows = [tuple(r) for r in spark.read.parquet(sink).collect()]
        assert (1, 2, "open") in rows          # batch 1: session live
        assert (1, 2, "closed") in rows        # batch 2: timer fired
        assert (2, 1, "open") in rows          # new user's live session
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_run_length_compression(spark, tmp_path):
    """Streaming run-length compression (streaming form of q104): only
    CLOSED runs are emitted, runs span micro-batch boundaries via
    ValueState, and a steady signal emits nothing."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mbta_etl_spark.streaming.stateful import run_length_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "in"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(IN_SCHEMA).json(str(src))

            def _append(batch_df, batch_id):
                batch_df.write.mode("append").parquet(sink)

            q = (
                run_length_stream(stream, band_width=20.0)
                .writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            drain_query(q)

        # batch 1: user 1 opens band 0 (3 rows) then band 2 (1 row) —
        # only the band-0 run closes; user 2 stays steady (no emission)
        _write(src, "b1.jsonl", [
            (1, "2024-01-01T10:00:00", 5.0),
            (1, "2024-01-01T10:01:00", 12.0),
            (1, "2024-01-01T10:02:00", 19.0),
            (1, "2024-01-01T10:03:00", 45.0),
            (2, "2024-01-01T10:00:00", 7.0),
            (2, "2024-01-01T10:01:00", 8.0),
        ])
        drain()
        # batch 2: user 1's band-2 run GROWS then closes when band 0
        # returns; user 2 still steady
        _write(src, "b2.jsonl", [
            (1, "2024-01-01T10:04:00", 50.0),
            (1, "2024-01-01T10:05:00", 2.0),
            (2, "2024-01-01T10:02:00", 9.0),
        ])
        drain()

        rows = sorted(
            spark.read.parquet(sink).collect(),
            key=lambda r: (r["user_id"], r["start_ts"]),
        )
        assert [
            (r.user_id, r.band, r.run_len, r.start_ts.isoformat())
            for r in rows
        ] == [
            (1, 0, 3, "2024-01-01T10:00:00"),
            # the band-2 run spans the batch boundary: 1 row in b1 + 1
            # in b2, closed by b2's return to band 0
            (1, 2, 2, "2024-01-01T10:03:00"),
        ]
        # user 2 never changed band: zero rows — the compression claim
        assert not [r for r in rows if r.user_id == 2]
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
