"""Python DataSource WRITER protocol: per-task shards + driver-side
manifest commit, verified against a read-back of the published files."""

from __future__ import annotations

import json
import os

from mbta_etl_spark.sources import jsonl_sink
from tests.conftest import SF_DIR_SMALL


def test_jsonl_sink_writes_shards_and_manifest(spark, tmp_path):
    jsonl_sink.register(spark)
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "doc_id", "source"
    )
    n = docs.count()
    out = str(tmp_path / "sink")

    docs.repartition(4).write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, jsonl_sink.MANIFEST)))
    assert manifest["total_rows"] == n
    assert sum(f["n_rows"] for f in manifest["files"]) == n
    # every manifest entry exists and holds exactly the promised rows
    seen = []
    for entry in manifest["files"]:
        with open(entry["path"]) as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == entry["n_rows"]
        seen.extend(rows)
    assert sorted(r["doc_id"] for r in seen) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_jsonl_sink_roundtrip_through_spark_read(spark, tmp_path):
    jsonl_sink.register(spark)
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    out = str(tmp_path / "sink2")
    docs.write.format("jsonl_sink").option("path", out).mode("append").save()
    back = (
        spark.read.schema(docs.schema)
        .option("pathGlobFilter", "part-*.jsonl")
        .json(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )
