"""S1 as a registered Spark 4 Python DataSource
(mbta_etl_spark/sources/http_datasource.py) — batch + streaming faces,
json.Unmarshal projection semantics, and the reference's abort-the-run
error contract (pipeline/extract.go:18-30, main_test.go:72-108) over a
REAL localhost HTTP server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from mbta_etl_spark.sources.http_datasource import (
    HttpJsonDataSource,
    _project,
    drain_poll_replay,
    register_http_json,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DDL = (
    "id string, type string, attributes struct<user_id: bigint, "
    "ts: string, event_type: string, value: double>"
)


def _envelope(ids, poll=0):
    return {
        "data": [
            {
                "id": str(i),
                "type": "event",
                "unknown_link": {"self": f"/e/{i}"},
                "attributes": {
                    "user_id": i * 10,
                    "ts": f"2024-03-01 12:00:{i % 60:02d}.000001",
                    "event_type": "click",
                    "value": i * 1.5,
                    "junk": "dropme",
                },
            }
            for i in ids
        ],
        "meta": {"poll": poll},
    }


@pytest.fixture
def snapshot_urls(tmp_path):
    urls = []
    for p in range(3):
        path = tmp_path / f"snap{p}.json"
        path.write_text(json.dumps(_envelope(range(p * 4, p * 4 + 4), p)))
        urls.append(f"file://{path}")
    return urls


class _CannedHandler(BaseHTTPRequestHandler):
    """Serves scripted (status, body) responses in order, then repeats
    the last one — a mutable endpoint the live poller observes."""

    script: list = []
    hits: list = []

    def do_GET(self):
        i = min(len(self.hits), len(self.script) - 1)
        status, body = self.script[i]
        type(self).hits.append(self.path)
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture
def http_server():
    server = HTTPServer(("127.0.0.1", 0), _CannedHandler)
    _CannedHandler.script = [(200, json.dumps(_envelope(range(2))))]
    _CannedHandler.hits = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/vehicles"
    server.shutdown()


# --- _project: json.Unmarshal semantics --------------------------------


def test_project_drops_unknown_and_nulls_missing():
    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField(
                "nest", StructType([StructField("x", DoubleType())])
            ),
        ]
    )
    row = _project({"a": 7, "unknown": 1, "nest": {"x": 2, "y": 3}}, schema)
    assert row == (7, None, (2.0,))


def test_project_numeric_coercion_and_conflicts():
    from pyspark.sql.types import IntegerType, MapType

    assert _project(3, DoubleType()) == 3.0
    assert _project(3.0, LongType()) == 3
    assert _project([1, 2], ArrayType(LongType())) == [1, 2]
    assert _project({"k": 1}, MapType(StringType(), LongType())) == {"k": 1}
    with pytest.raises(ValueError):
        _project(3.5, LongType())  # non-integral into integer
    with pytest.raises(ValueError):
        _project(True, LongType())  # JSON bool is not a number
    with pytest.raises(ValueError):
        _project("7", LongType())  # no silent string->int
    with pytest.raises(ValueError):
        _project(7, StringType())
    # declared-width overflow aborts like Go json.Unmarshal
    assert _project(2**31 - 1, IntegerType()) == 2**31 - 1
    with pytest.raises(ValueError, match="overflow"):
        _project(2**40, IntegerType())
    with pytest.raises(ValueError, match="overflow"):
        _project(-(2**31) - 1, IntegerType())
    # JSON keys are strings: a non-string keyType is unsatisfiable
    with pytest.raises(ValueError, match="map keys"):
        _project({"1": 2}, MapType(LongType(), LongType()))


# --- batch face ---------------------------------------------------------


def test_batch_one_partition_per_url(spark, snapshot_urls):
    register_http_json(spark)
    df = (
        spark.read.format("http_json")
        .schema(DDL)
        .option("urls", ",".join(snapshot_urls))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 12
    assert {r.id for r in rows} == {str(i) for i in range(12)}
    # unknown fields dropped by projection; knowns typed
    r0 = next(r for r in rows if r.id == "4")
    assert r0.attributes.user_id == 40 and r0.attributes.value == 6.0


def test_batch_default_schema_is_vehicle_envelope(spark, tmp_path):
    register_http_json(spark)
    doc = {
        "data": [
            {
                "id": "v1",
                "type": "vehicle",
                "attributes": {"label": "1822", "speed": 4.5},
            }
        ]
    }
    p = tmp_path / "veh.json"
    p.write_text(json.dumps(doc))
    df = (
        spark.read.format("http_json").option("url", f"file://{p}").load()
    )
    row = df.collect()[0]
    assert row.id == "v1" and row.attributes.label == "1822"
    assert row.attributes.speed == 4.5
    assert row.attributes.bearing is None  # missing -> nil, like Go


def test_null_data_element_decodes_to_all_null_row(spark, tmp_path):
    """Go json.Unmarshal parity: a null element in data[] becomes a
    zero-value (all-null) row, not an engine conversion crash."""
    p = tmp_path / "null_elem.json"
    p.write_text(json.dumps({"data": [None, {"id": "7"}]}))
    df = (
        spark.read.format("http_json")
        .schema(DDL)
        .option("url", f"file://{p}")
        .load()
    )
    rows = sorted(df.collect(), key=lambda r: (r.id is None, r.id))
    assert len(rows) == 2
    assert rows[0].id == "7"
    assert rows[1].id is None and rows[1].attributes is None


def test_batch_requires_url_option(spark):
    register_http_json(spark)
    with pytest.raises(Exception, match="url"):
        spark.read.format("http_json").schema(DDL).load().collect()


def test_batch_real_http_and_abort_on_500(spark, http_server):
    register_http_json(spark)
    df = (
        spark.read.format("http_json")
        .schema(DDL)
        .option("url", http_server)
        .load()
    )
    assert df.count() == 2
    _CannedHandler.script = [(500, "boom")]
    _CannedHandler.hits = []
    with pytest.raises(Exception, match="500"):
        df.collect()  # non-2xx aborts the scan (extract.go:18-20)


def test_batch_abort_on_malformed_json(spark, http_server):
    register_http_json(spark)
    _CannedHandler.script = [(200, "{not json")]
    _CannedHandler.hits = []
    df = (
        spark.read.format("http_json")
        .schema(DDL)
        .option("url", http_server)
        .load()
    )
    with pytest.raises(Exception, match="(?i)json"):
        df.collect()


# --- streaming face -----------------------------------------------------


def test_stream_replay_one_url_per_batch(spark, snapshot_urls, tmp_path):
    register_http_json(spark)
    sdf = (
        spark.readStream.format("http_json")
        .schema(DDL)
        .option("urls", ",".join(snapshot_urls))
        .load()
    )
    seen = []
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, bid: seen.append((bid, b.count())))
        .start()
    )
    drain_poll_replay(q, len(snapshot_urls))
    assert not q.isActive
    assert [c for _, c in sorted(seen)] == [4, 4, 4]


def test_stream_live_polls_mutable_endpoint(spark, http_server, tmp_path):
    """Live mode observes the endpoint ONCE per micro-batch — the
    scripted server changes its answer between polls and both
    snapshots land."""
    register_http_json(spark)
    _CannedHandler.script = [
        (200, json.dumps(_envelope([1], poll=0))),
        (200, json.dumps(_envelope([2, 3], poll=1))),
    ]
    _CannedHandler.hits = []
    sdf = (
        spark.readStream.format("http_json")
        .schema(DDL)
        .option("url", http_server)
        .load()
    )
    counts = []
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, bid: counts.append(b.count()))
        .start()
    )
    drain_poll_replay(q, 2)  # stop after two observed polls
    assert sum(counts[:2]) == 3  # 1 row then 2 rows
    assert len(_CannedHandler.hits) >= 2


def test_stream_error_propagates_and_drain_raises(
    spark, http_server, tmp_path
):
    register_http_json(spark)
    _CannedHandler.script = [(503, "down")]
    _CannedHandler.hits = []
    sdf = (
        spark.readStream.format("http_json")
        .schema(DDL)
        .option("url", http_server)
        .load()
    )
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, bid: None)
        .start()
    )
    with pytest.raises(Exception, match="503"):
        drain_poll_replay(q, 1, timeout_s=60)
    assert not q.isActive


# --- property: projection is a pure function of (payload, schema) ------


def _py_project_reference(item, schema):
    """Straight-line reference: dict -> tuple through the declared
    struct, recursing only as deep as the test schema needs."""
    from pyspark.sql.types import StructType

    out = []
    for f in schema.fields:
        v = item.get(f.name)
        if v is None:
            out.append(None)
        elif isinstance(f.dataType, StructType):
            out.append(_py_project_reference(v, f.dataType))
        elif isinstance(f.dataType, DoubleType):
            out.append(float(v))
        elif isinstance(f.dataType, LongType):
            out.append(int(v))
        else:
            out.append(v)
    return tuple(out)


def test_projection_roundtrip_property(tmp_path):
    """Hypothesis: arbitrary well-typed envelopes survive the full
    fetch->parse->project path exactly (values, None-holes, unknown-key
    drops), against an independent straight-line projection."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mbta_etl_spark.sources.http_datasource import _fetch_rows
    from pyspark.sql.types import StructType

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField(
                "attributes",
                StructType(
                    [
                        StructField("user_id", LongType()),
                        StructField("value", DoubleType()),
                        StructField("event_type", StringType()),
                    ]
                ),
            ),
        ]
    )

    attr = st.fixed_dictionaries(
        {},
        optional={
            "user_id": st.integers(-(2**62), 2**62),
            "value": st.floats(allow_nan=False, allow_infinity=False),
            "event_type": st.text(max_size=8),
            "extra_unknown": st.integers(),
        },
    )
    item = st.fixed_dictionaries(
        {"id": st.text(max_size=12)},
        optional={"attributes": attr, "junk": st.text(max_size=4)},
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(items=st.lists(item, max_size=6))
    def run(items):
        p = tmp_path / "prop.json"
        p.write_text(json.dumps({"data": items}))
        got = _fetch_rows(f"file://{p}", schema, 5.0)
        want = [_py_project_reference(i, schema) for i in items]
        assert got == want

    run()


def test_read_between_offsets_replays_deterministically(
    spark, snapshot_urls
):
    # the spark fixture is load-bearing: DDL-string parsing requires an
    # active session (review r8 finding — this test fails in isolation
    # without it)
    from pyspark.sql.types import _parse_datatype_string

    reader = HttpJsonDataSource(
        {"urls": ",".join(snapshot_urls)}
    ).simpleStreamReader(_parse_datatype_string(DDL))
    assert reader.initialOffset() == {"i": 0}
    rows1, off1 = reader.read({"i": 0})
    first = list(rows1)
    assert off1 == {"i": 1} and len(first) == 4
    # recovery path: re-reading [0, 1) returns the identical rows
    assert list(reader.readBetweenOffsets({"i": 0}, {"i": 1})) == first
    # drained: offset stops advancing, no rows
    rows_end, off_end = reader.read({"i": 3})
    assert list(rows_end) == [] and off_end == {"i": 3}
