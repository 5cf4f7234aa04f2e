"""Physical-layout tests: partition pruning visible in the scan, bucketed
join with NO exchange on the bucketed key, salted aggregation correctness."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from mbta_etl_spark.sources.layout import (
    explode_salts,
    salted_count,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"], sort_cols=["doc_id"])

    pruned = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "lang" in plan
    # correctness: partition column round-trips
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(orders, "orders_b", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        "o_custkey",
        8,
    )
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and the result matches the plain join
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_count_matches_plain(spark):
    from mbta_etl_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        r["key"]: r["cnt"]
        for r in salted_count(events, F.col("event_type"), 8, "key").collect()
    }
    assert salted == plain


def test_explode_salts_covers_all(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    out = explode_salts(df, F.col("k"), 4)
    assert out.count() == 12
    assert out.select("_salted_key").distinct().count() == 12
