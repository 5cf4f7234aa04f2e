"""Python DataSource API: spark.read.format("mbta_vehicles") — S1 as a
registered source, batch + streaming-offset contract + error semantics."""

from __future__ import annotations

import json

import pytest

from mbta_etl_spark.pipeline.transform import transform
from mbta_etl_spark.sources import vehicles_source


PAYLOAD = {
    "data": [
        {
            "id": "veh-1", "type": "vehicle",
            "attributes": {
                "updated_at": "2024-01-15T10:30:00-05:00", "speed": 25.5,
                "occupancy_status": "MANY_SEATS_AVAILABLE",
                "longitude": -71.06, "latitude": 42.35, "label": "1234",
                "direction_id": 0, "current_status": "IN_TRANSIT_TO",
                "bearing": 180,
            },
        },
        {
            "id": "veh-2", "type": "vehicle",
            "attributes": {
                "updated_at": "2024-01-15T10:31:00-05:00", "speed": None,
                "occupancy_status": "", "longitude": -71.0, "latitude": 42.0,
                "label": "77", "direction_id": 1,
                "current_status": "STOPPED_AT", "bearing": None,
            },
        },
    ]
}


@pytest.fixture()
def payload_file(tmp_path):
    p = tmp_path / "payload.json"
    p.write_text(json.dumps(PAYLOAD))
    return str(p)


def test_batch_read_and_transform(spark, payload_file):
    vehicles_source.register(spark)
    raw = (
        spark.read.format("mbta_vehicles").option("path", payload_file).load()
    )
    rows = {r["id"]: r for r in raw.collect()}
    assert set(rows) == {"veh-1", "veh-2"}
    assert rows["veh-1"]["attributes"]["speed"] == 25.5
    assert rows["veh-2"]["attributes"]["speed"] is None  # nullable survives

    # the source composes with the reference transform chain (T1-T7)
    out = {r["id"]: r for r in transform(raw).collect()}
    assert out["veh-2"]["speed"] == 0.0  # null-default (T3)
    assert out["veh-2"]["bearing"] == 0  # null-default (T4)
    assert out["veh-2"]["occupancy_status"] == "UNKNOWN"  # ''->UNKNOWN (T5)


def test_batch_read_malformed_payload_aborts(spark, tmp_path):
    vehicles_source.register(spark)
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    df = spark.read.format("mbta_vehicles").option("path", str(bad)).load()
    with pytest.raises(Exception, match="malformed JSON|ExtractError"):
        df.collect()


def test_batch_read_missing_envelope_aborts(spark, tmp_path):
    vehicles_source.register(spark)
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"nope": []}))
    df = spark.read.format("mbta_vehicles").option("path", str(bad)).load()
    with pytest.raises(Exception, match="envelope|ExtractError"):
        df.collect()


def test_stream_reader_offset_contract(payload_file):
    """The polling stream reader honors the offset protocol: offsets
    advance per poll, max_polls drains, replay re-reads the feed."""
    r = vehicles_source._PollStreamReader({"path": payload_file, "max_polls": "2"})
    o0 = r.initialOffset()
    assert o0 == {"poll": 0}
    rows1, o1 = r.read(o0)
    assert len(rows1) == 2 and o1 == {"poll": 1}
    rows2, o2 = r.read(o1)
    assert len(rows2) == 2 and o2 == {"poll": 2}
    rows3, o3 = r.read(o2)  # drained
    assert rows3 == [] and o3 == {"poll": 2}
    assert len(r.readBetweenOffsets(o0, o1)) == 2  # recovery replay


def test_streaming_end_to_end(spark, payload_file, tmp_path):
    """The registered source drives a real micro-batch stream: rows land
    in the sink and the run terminates once max_polls drains."""
    vehicles_source.register(spark)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("mbta_vehicles")
        .option("path", payload_file)
        .option("max_polls", "1")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 2
    assert {r["id"] for r in out.collect()} == {"veh-1", "veh-2"}
