"""Deterministic hash sampling: reproducibility, nesting, stratification."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbta_etl_spark.operators.sampling import (
    hash_sample,
    per_stratum_topn,
    split_assign,
    stratified_hash_sample,
    token_budget_sample,
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


def test_token_budget_prefix_and_determinism(spark):
    """Per-stratum budget: the kept set is exactly the hash-ordered
    prefix whose running total fits, identical under any partitioning."""
    from mbta_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    out = token_budget_sample(
        docs, F.col("doc_id"), F.col("source"),
        F.size(F.split("text", " ")), budget=800,
    )
    rows = out.collect()
    assert rows  # the budget keeps something
    assert all(r["cum_tokens"] <= 800 for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["stratum"], []).append(r)
    full = {r["source"] for r in docs.select("source").distinct().collect()}
    assert set(per_src) == full  # every stratum keeps a non-empty prefix
    for src, kept in per_src.items():
        assert max(r["cum_tokens"] for r in kept) <= 800
        # partial prefix: the full source exceeds the budget (see
        # TOKEN_BUDGET sizing), so something was cut
        total = (
            docs.filter(F.col("source") == src)
            .select(F.sum(F.size(F.split("text", " "))))
            .collect()[0][0]
        )
        assert total > 800 > 0
        assert len(kept) < docs.filter(F.col("source") == src).count()
    # partitioning-independent
    ids = {r["doc_id"] for r in rows}
    ids_repart = {
        r["doc_id"]
        for r in token_budget_sample(
            docs.repartition(13), F.col("doc_id"), F.col("source"),
            F.size(F.split("text", " ")), budget=800,
        ).collect()
    }
    assert ids == ids_repart


def test_per_stratum_topn_exact_and_stable(spark):
    """Exactly n per stratum (count-exact, unlike fraction sampling), and
    the kept set is partitioning-independent."""
    from mbta_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    out = per_stratum_topn(docs, F.col("doc_id"), F.col("source"), n=7)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert all(len(v) == 7 for v in per.values())
    assert len(per) == docs.select("source").distinct().count()
    again = {
        r["doc_id"]
        for r in per_stratum_topn(
            docs.repartition(11), F.col("doc_id"), F.col("source"), n=7
        ).collect()
    }
    assert again == {r["doc_id"] for r in rows}


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


def test_chunk_pack_layout(spark):
    """Offsets tile the concatenated token stream with no gaps; chunk
    spans are consistent with the capacity."""
    from mbta_etl_spark.operators.sampling import chunk_pack

    docs = spark.createDataFrame(
        [(1, 100), (2, 400), (3, 50), (4, 600)], "doc_id long, n long"
    )
    rows = {
        r["doc_id"]: r
        for r in chunk_pack(docs, F.col("doc_id"), F.col("n"), 512).collect()
    }
    assert rows[1]["start_off"] == 0 and rows[1]["chunk_first"] == 0
    assert rows[2]["start_off"] == 100
    # doc 2 spans 100..499 -> entirely chunk 0
    assert (rows[2]["chunk_first"], rows[2]["chunk_last"]) == (0, 0)
    # doc 3 spans 500..549 -> straddles the 512 boundary
    assert (rows[3]["chunk_first"], rows[3]["chunk_last"]) == (0, 1)
    assert rows[3]["n_chunks"] == 2
    # doc 4 spans 550..1149 -> chunks 1..2
    assert (rows[4]["chunk_first"], rows[4]["chunk_last"]) == (1, 2)


def test_greedy_pack_no_straddle(spark):
    """Greedy packing resets bins on overflow; oversized docs get their
    own bin; bins never exceed capacity (except single oversized docs)."""
    from mbta_etl_spark.operators.sampling import greedy_pack

    docs = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 100), ("a", 3, 100), ("a", 4, 400), ("a", 5, 50),
         ("b", 6, 300), ("b", 7, 10)],
        "src string, doc_id long, n long",
    )
    out = greedy_pack(docs, "src", "doc_id", F.col("n"), 256)
    rows = {r["doc_id"]: r["bin"] for r in out.collect()}
    # group a: 100+100 fits bin0; 100 overflows -> bin1; 400 oversized -> bin2
    # (alone); 50 -> bin3 (400+50 > 256)
    assert [rows[i] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 3]
    # group b independent: 300 oversized alone in bin0, 10 -> bin1
    assert [rows[i] for i in (6, 7)] == [0, 1]


def test_repetition_ratio_semantics(spark):
    from mbta_etl_spark.operators.text import repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # 3-grams: aba,bab,aba,bab -> 2 dups
            (2, "x y"),           # shorter than k: whole-text gram, ratio 0
            (3, "p q r s"),       # 2 distinct 3-grams, no dups
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_ratio(docs, F.col("text"), F.col("doc_id"), 3).collect()
    }
    assert (rows[1]["n_grams"], rows[1]["n_dup"]) == (4, 2)
    assert rows[1]["dup_ratio"] == 0.5
    assert (rows[2]["n_grams"], rows[2]["n_dup"], rows[2]["dup_ratio"]) == (1, 0, 0.0)
    assert (rows[3]["n_grams"], rows[3]["n_dup"]) == (2, 0)


def test_decontaminate_flags_leaked_docs(spark):
    from mbta_etl_spark.operators.dedup import decontaminate_ngrams

    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # shares 8-grams with test doc
            (2, "z y x w v u t s r q"),   # disjoint
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate_ngrams(
            train, test, F.col("text"), F.col("doc_id"), k=8
        ).collect()
    }
    assert rows[1]["contamination"] == 1.0  # all 3 of its 8-grams leak
    assert rows[1]["n_grams"] == 3
    assert rows[2]["contamination"] == 0.0


def test_temperature_mix_boosts_small_strata(spark):
    """tau=0.5 flattening: a 9:1 corpus yields sqrt(9):sqrt(1) = 3:1
    targets, tripling the small stratum's share vs proportional."""
    from pyspark.sql import functions as F

    from mbta_etl_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, F.col("doc_id"), F.col("source"), budget=40)
    by = {r["stratum"]: 0 for r in out.collect()}
    for r in out.collect():
        by[r["stratum"]] += 1
    # sqrt(90)=9.487, sqrt(10)=3.162, S=12.65 -> targets 30 and 10
    assert by == {"big": 30, "small": 10}
    # determinism: same call, same picks
    again = temperature_mix(df, F.col("doc_id"), F.col("source"), budget=40)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_epoch_plan_caps_and_deficit(spark):
    """High-weight source exceeds the epoch cap and reports the deficit;
    mid source is served fully; zero-weight source is excluded."""
    from mbta_etl_spark.operators.sampling import epoch_plan

    rows = (
        [(i, "hi", 10) for i in range(10)]        # 100 tokens avail
        + [(100 + i, "mid", 10) for i in range(100)]  # 1000 tokens avail
        + [(300 + i, "drop", 10) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {
        r["source"]: r
        for r in epoch_plan(
            df,
            F.col("source"),
            F.col("n_tokens"),
            {"hi": 3.0, "mid": 1.0, "drop": 0.0},
            budget_tokens=2000,
            max_epochs=4.0,
        ).collect()
    }
    assert set(out) == {"hi", "mid"}
    # w_norm: hi 0.75, mid 0.25 -> targets 1500 / 500
    hi, mid = out["hi"], out["mid"]
    assert hi["target_tokens"] == 1500 and hi["avail_tokens"] == 100
    assert hi["epochs_needed"] == 15.0 and hi["epochs_served"] == 4.0
    assert hi["served_tokens"] == 400 and hi["deficit_tokens"] == 1100
    assert mid["target_tokens"] == 500 and mid["epochs_served"] == 0.5
    assert mid["served_tokens"] == 500 and mid["deficit_tokens"] == 0


def test_shuffle_shards_coverage_balance_determinism(spark):
    """Every doc lands in exactly one shard, shards are hash-balanced,
    and the map is deterministic across runs."""
    from mbta_etl_spark.operators.sampling import shuffle_shards

    rows = [(i, "a" if i % 2 else "b", 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = shuffle_shards(
        df, F.col("doc_id"), F.col("source"), F.col("n_tokens"), 4
    ).collect()
    assert len(out) == 4
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["shard_tokens"] for r in out) == sum(10 + i % 7 for i in range(200))
    sizes = [r["n_docs"] for r in out]
    assert max(sizes) < 2 * min(sizes)  # hash-uniform, no hot shard
    assert all(r["n_sources"] == 2 for r in out)  # both sources mix in
    again = shuffle_shards(
        df, F.col("doc_id"), F.col("source"), F.col("n_tokens"), 4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_materialize_epochs_replication_and_audit(spark):
    """Whole epochs replicate every doc; the fractional epoch lands on a
    deterministic hash-chosen subset; the audit reconciles to the plan."""
    from mbta_etl_spark.operators.sampling import epoch_plan, materialize_epochs

    rows = [(i, "s", 10) for i in range(50)]  # 500 tokens avail
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    plan = epoch_plan(
        df, F.col("source"), F.col("n_tokens"), {"s": 1.0},
        budget_tokens=1250, max_epochs=4.0,
    )
    # epochs_needed = 1250/500 = 2.5 -> whole=2, frac=0.5
    out = materialize_epochs(
        df, F.col("doc_id"), F.col("source"), F.col("n_tokens"), plan
    ).collect()
    assert len(out) == 1
    r = out[0]
    # every doc at least twice; ~half get a third copy (hash-fractional)
    assert 100 < r["emitted_rows"] < 150
    assert r["achieved_tokens"] == r["emitted_rows"] * 10
    assert r["served_tokens"] == 1250
    assert 0.8 < r["fill_ratio"] < 1.2
    again = materialize_epochs(
        df, F.col("doc_id"), F.col("source"), F.col("n_tokens"), plan
    ).collect()
    assert [tuple(x) for x in out] == [tuple(x) for x in again]


def test_overlap_chunks_spans_and_overlap(spark):
    """Chunks tile the doc with stride overlap; the last chunk clamps to
    n; short docs yield exactly one chunk."""
    from mbta_etl_spark.operators.sampling import overlap_chunks

    df = spark.createDataFrame([(1, 80), (2, 20), (3, 33)], "doc_id long, n long")
    out = overlap_chunks(
        df, F.col("doc_id"), F.col("n"), window=32, stride=24
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    for chunks in by.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
    # doc 1 (n=80): ceil((80-32)/24)+1 = 3 chunks
    c1 = by[1]
    assert [(r["start_tok"], r["end_tok"]) for r in c1] == [(0, 32), (24, 56), (48, 80)]
    assert [r["overlap_prev"] for r in c1] == [0, 8, 8]
    # doc 2 (n=20 <= 32): single clamped chunk
    assert [(r["start_tok"], r["end_tok"], r["overlap_prev"]) for r in by[2]] == [(0, 20, 0)]
    # doc 3 (n=33): two chunks, second clamps to 33 with overlap 8
    assert [(r["start_tok"], r["end_tok"]) for r in by[3]] == [(0, 32), (24, 33)]
    assert by[3][1]["overlap_prev"] == 8
    # full coverage: union of spans reaches n with no gaps (stride < window)
    for doc, chunks in by.items():
        ends = 0
        for r in chunks:
            assert r["start_tok"] <= ends  # no gap
            ends = max(ends, r["end_tok"])
        assert ends == {1: 80, 2: 20, 3: 33}[doc]


def test_pad_waste_census_buckets_and_overflow(spark):
    """Ladder assignment, per-bucket pad accounting, overflow bucket
    padding to its own observed max, and naive-vs-bucketed comparison."""
    from mbta_etl_spark.operators.sampling import pad_waste_census

    # caps (8, 16): 5→8, 12→16, 16→16, 20/23→overflow (pad to 23)
    df = spark.createDataFrame(
        [(5,), (12,), (16,), (20,), (23,)], "n long"
    )
    out = {
        r["bucket_cap"]: r
        for r in pad_waste_census(df, F.col("n"), [8, 16]).collect()
    }
    assert set(out) == {8, 16, 23}
    assert out[8]["n_seqs"] == 1 and out[8]["pad_tokens"] == 3
    assert out[16]["n_seqs"] == 2 and out[16]["pad_tokens"] == (16 - 12) + 0
    # overflow: two seqs padded to observed max 23
    assert out[23]["n_seqs"] == 2
    assert out[23]["pad_tokens"] == (23 - 20) + 0
    # naive pads everything to the corpus max (23)
    assert out[8]["naive_pad_tokens"] == 23 - 5
    assert out[16]["naive_pad_tokens"] == 2 * 23 - (12 + 16)
    # waste_frac = pad / (cap * n_seqs), 6dp half-up
    assert out[8]["waste_frac"] == round(3 / 8, 6)
    assert out[23]["waste_frac"] == round(3 / 46, 6)
