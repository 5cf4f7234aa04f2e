"""Deterministic hash sampling: reproducibility, nesting, stratification."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbta_etl_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_hash_sample,
    weighted_mix,
)
from tests.conftest import SF_DIR_SMALL


def _events(spark):
    from mbta_etl_spark.sources.tables import load_table

    return load_table(spark, SF_DIR_SMALL, "events")


def test_hash_sample_rate_and_determinism(spark):
    ev = _events(spark).select("event_id")
    kept = hash_sample(ev, F.col("event_id"), 0.3)
    n_total = ev.count()
    n_kept = kept.count()
    assert abs(n_kept / n_total - 0.3) < 0.05
    # partitioning must not change the kept set
    ids = {r["event_id"] for r in kept.collect()}
    ids_repart = {
        r["event_id"]
        for r in hash_sample(ev.repartition(7), F.col("event_id"), 0.3).collect()
    }
    assert ids == ids_repart


def test_hash_sample_nesting_and_salt(spark):
    ev = _events(spark).select("event_id")
    s10 = {r["event_id"] for r in hash_sample(ev, F.col("event_id"), 0.1).collect()}
    s20 = {r["event_id"] for r in hash_sample(ev, F.col("event_id"), 0.2).collect()}
    assert s10 <= s20  # same salt: smaller rate is a subset
    other = {
        r["event_id"]
        for r in hash_sample(ev, F.col("event_id"), 0.1, salt="s1").collect()
    }
    assert other != s10  # new salt decorrelates the draw


def test_stratified_rates(spark):
    ev = _events(spark).select("event_id", "event_type")
    rates = {"click": 0.5, "view": 0.1}
    out = stratified_hash_sample(
        ev, F.col("event_id"), F.col("event_type"), rates
    )
    got = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {"click", "view"}  # unlisted strata dropped
    assert abs(got["click"] / totals["click"] - 0.5) < 0.1
    assert abs(got["view"] / totals["view"] - 0.1) < 0.07


def test_split_assign_exhaustive_and_stable(spark):
    ev = _events(spark).select("event_id")
    out = split_assign(ev, F.col("event_id"))
    n = ev.count()
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == n  # exhaustive: every row assigned
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.05
    # repartitioning must not move rows between splits
    again = {
        (r["event_id"], r["split"])
        for r in split_assign(ev.repartition(5), F.col("event_id")).collect()
    }
    assert again == {(r["event_id"], r["split"]) for r in out.collect()}


def test_weighted_mix_copy_counts(spark):
    ev = _events(spark).select("event_id", "event_type")
    weights = {"click": 2.0, "view": 0.5, "purchase": 2.5}
    out = weighted_mix(ev, F.col("event_id"), F.col("event_type"), weights)
    per_type = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_type) <= set(weights)  # unlisted strata dropped
    assert per_type["click"] == 2 * totals["click"]  # integer weight exact
    assert abs(per_type["view"] / totals["view"] - 0.5) < 0.1
    assert abs(per_type["purchase"] / totals["purchase"] - 2.5) < 0.1
    # copy ordinals are 1..n per row
    mx = out.filter(F.col("event_type") == "click").groupBy("event_id").agg(
        F.count("*").alias("n"), F.max("copy").alias("mx"), F.min("copy").alias("mn")
    )
    bad = mx.filter((F.col("n") != 2) | (F.col("mx") != 2) | (F.col("mn") != 1))
    assert bad.count() == 0
