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
from tests.conftest import SF_DIR_SMALL


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


def test_ivf_cell_partitioned_layout_prunes_probe(spark, tmp_path):
    """The IVF scale claim made concrete: write the assigned corpus
    partitioned by cell, probe with a cell filter — the scan must prune
    to the probed partition directories (PartitionFilters), reading none
    of the other cells' files."""
    from pyspark.sql import functions as F

    from mbta_etl_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, "embedding", "vec_id")
    assigned = similarity.ivf_assign(emb, "embedding", "vec_id", cents)
    path = str(tmp_path / "emb_by_cell")
    write_partitioned(assigned, path, ["cell"])

    probe_cells = [cents[0][0], cents[1][0]]
    scan = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "cell" in plan
    # pruned read: only the probed cells' rows come back
    got_cells = {r["cell"] for r in scan.select("cell").distinct().collect()}
    assert got_cells <= set(probe_cells)


def test_run_sql_generic_cursor(spark):
    """S2 parity: arbitrary SQL over the registered testdata views —
    string in, rows out, Catalyst-planned."""
    from mbta_etl_spark.sources.tables import run_sql

    out = run_sql(
        spark,
        SF_DIR_SMALL,
        """SELECT o_orderstatus, COUNT(*) AS n
           FROM orders WHERE o_totalprice > 1000
           GROUP BY o_orderstatus ORDER BY n DESC""",
    ).collect()
    assert len(out) >= 2
    assert out[0]["n"] >= out[-1]["n"]
    # joins across views work too
    j = run_sql(
        spark,
        SF_DIR_SMALL,
        "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
    ).collect()[0]["n"]
    assert j > 0


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


def test_zorder_beats_linear_sort_on_second_dimension(spark):
    """The point of z-order: under a partkey-ONLY sort each file tile
    spans ~the full suppkey range, so a suppkey predicate can skip
    NOTHING; the Morton interleave shrinks the per-file span of BOTH
    dimensions below full range. The graded metric is the worst
    dimension's mean span (the fraction of files a single-column
    predicate on the layout's weakest column must open) — a single-key
    sort is always ~1.0 there, z-order stays well below."""
    from pyspark.sql import Window, functions as F

    from mbta_etl_spark.plans.registry import (
        ZORDER_FILES,
        src04_zorder_layout,
    )
    from mbta_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    zrows = src04_zorder_layout(spark, sf).collect()
    assert len(zrows) == ZORDER_FILES
    sizes = [r["n_rows"] for r in zrows]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance
    z_worst = max(
        sum(r["span_pk_frac"] for r in zrows) / len(zrows),
        sum(r["span_sk_frac"] for r in zrows) / len(zrows),
    )

    # linear layout: same tiling, ordered by partkey alone
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    w = Window.orderBy("l_partkey", "l_orderkey", "l_linenumber")
    lin = (
        li.withColumn("file_id", F.ntile(ZORDER_FILES).over(w))
        .groupBy("file_id")
        .agg(
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
            F.min("l_suppkey").alias("min_sk"),
            F.max("l_suppkey").alias("max_sk"),
        )
        .collect()
    )
    lin_worst = max(
        sum((r["max_pk"] - r["min_pk"]) / mx["mp"] for r in lin) / len(lin),
        sum((r["max_sk"] - r["min_sk"]) / mx["ms"] for r in lin) / len(lin),
    )
    # the single-key sort's weakest dimension spans ~everything; z-order
    # must at least halve it
    assert lin_worst > 0.9, lin_worst
    assert z_worst < 0.5 * lin_worst, (z_worst, lin_worst)
