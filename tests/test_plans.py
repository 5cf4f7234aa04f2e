"""Physical-plan regression tests: the plan SHAPES the engine promises.

These assert what `.explain("formatted")` shows — pushdown, broadcast,
partial aggregation, shuffle counts — so a refactor that silently
degrades a plan (drops a broadcast, adds an exchange, loses a pushed
filter) fails CI even though results stay correct.
"""

from __future__ import annotations

import contextlib
import io

from mbta_etl_spark.operators import multimodal
from mbta_etl_spark.plans import registry
from tests.conftest import SF_DIR_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q10_filter_pushed_to_scan(spark):
    """The BETWEEN predicate must reach the parquet scan as PushedFilters,
    and the scan must prune to the referenced columns only."""
    plan = _plan(registry.q10_between_filter(spark, SF_DIR_SMALL))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(p_size" in plan and "LessThanOrEqual(p_size" in plan
    # column pruning: unreferenced part columns must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "p_retailprice" not in read_schema and "p_brand" not in read_schema


def test_q16_single_shuffle_partial_agg(spark):
    """TPC-H-Q1 shape: ONE exchange, with a partial (map-side) aggregate
    before it — shuffled bytes ~ #groups, not #rows."""
    plan = _plan(registry.q16_pricing_summary(spark, SF_DIR_SMALL))
    # exactly one hash exchange (the group-by); the only other exchange
    # allowed is the range partitioning for the final ORDER BY
    assert plan.count("hashpartitioning(") == 1
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q17_dimensions_broadcast(spark):
    """Multi-way join: the small dimension tables (customer, nation) must
    broadcast — lineitem/orders never shuffle to meet them."""
    plan = _plan(registry.q17_top_customers(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_q01_topk_take_ordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then merge), never a global sort."""
    plan = _plan(registry.q01_top10_by_value(spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort node


def test_mapinpandas_no_extra_shuffle(spark):
    """mapInPandas stages (multimodal decode shape) must not introduce an
    exchange: scan -> project -> python runner."""
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    binary = multimodal.to_binary_table(docs, "text", "doc_id")
    plan = _plan(multimodal.fake_frame_samples(binary))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_q40_dimension_broadcast_and_having_first(spark):
    """Q18 shape: customer joins as a broadcast; the quantity aggregate
    (the HAVING side) keeps a partial aggregate before its shuffle."""
    plan = _plan(registry.q40_large_orders(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_j04_semi_join_prunes_probe_columns(spark):
    """Semi join: the orders side must scan only the join key and the
    filter column — nothing else crosses the shuffle."""
    plan = _plan(registry.j04_big_spenders_semi(spark, SF_DIR_SMALL))
    assert "LeftSemi" in plan
    orders_schemas = [
        l for l in plan.splitlines()
        if "ReadSchema" in l and "o_custkey" in l
    ]
    assert orders_schemas and all(
        "o_orderdate" not in l and "o_orderpriority" not in l
        for l in orders_schemas
    )
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_q34_calendar_side_broadcasts(spark):
    """Gap fill: the exploded one-row calendar must broadcast back onto
    the daily aggregate, never shuffle it."""
    plan = _plan(registry.q34_gap_fill_days(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_t11_vocab_joins_broadcast_corpus_never_shuffled(spark):
    """Unigram LM: the vocab/total tables broadcast onto the exploded
    corpus — the corpus side must reach its per-doc aggregation without
    a join-induced repartition (only agg exchanges allowed)."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.t11_unigram_lm(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q09_single_job_no_per_fraction_sorts(spark):
    """Exact percentiles: one global-sort window, labels exploded — no
    per-fraction re-sort, no CollectLimit pulling O(n) rows to the
    driver, no union of single-row plans."""
    plan = _plan(registry.q09_percentiles_exact(spark, SF_DIR_SMALL))
    assert "CollectLimit" not in plan
    assert plan.count("Sort") <= 2  # the one window sort (+AQE reuse)
    assert "Window" in plan


def test_c06_single_window_shuffle(spark):
    """Token-budget prefix: exactly one exchange (the per-stratum window
    partitioning); the filter rides the window output."""
    from mbta_etl_spark.plans import llm_registry

    import re

    plan = _plan(llm_registry.c06_token_budget(spark, SF_DIR_SMALL))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_kmeans_assignment_zero_shuffle(spark):
    """k-means assignment pass: scan → mapInPandas, no exchange — the
    centroid matrix rides in the closure, never as a join side."""
    from mbta_etl_spark.operators import similarity

    emb = spark.read.parquet(SF_DIR_SMALL + "/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, "embedding", "vec_id")
    plan = _plan(similarity._kmeans_assign(emb, "embedding", "vec_id",
                                           [v for _, v in cents]))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def _n_exchanges(df) -> int:
    # the formatted explain lists each node twice (tree + details); the
    # executed-plan string holds each Exchange exactly once
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_ts03_both_frames_share_one_exchange(spark):
    """interpolate's running-prev and running-next windows share the same
    partitioning+ordering — one Exchange, two in-partition Window passes."""
    assert _n_exchanges(registry.ts03_interpolate(spark, SF_DIR_SMALL)) == 1


def test_q48_two_orderings_one_exchange(spark):
    """The ties window and the tie-broken window differ only in ordering,
    so the analytic battery shuffles once."""
    assert _n_exchanges(registry.q48_analytic_battery(spark, SF_DIR_SMALL)) == 1


def test_c08_weighted_sample_take_ordered(spark):
    """A-Res top-k must plan as TakeOrderedAndProject (per-partition
    heaps), never a global Sort."""
    plan = _plan(registry.c08_weighted_sample(spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan or "TakeOrderedAndProject" in plan


def test_c10_targets_broadcast_corpus_never_shuffled_twice(spark):
    """Temperature-mix targets join back as a broadcast — the corpus
    shuffles once for the rank window, not for the join."""
    plan = _plan(registry.c10_temperature_mix(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_v05_quarantine_is_scan_plus_projection(spark):
    """Row-level routing must add ZERO shuffles — the first-fail CASE
    folds into the scan projection."""
    plan = _plan(registry.v05_quarantine_split(spark, SF_DIR_SMALL))
    assert "Exchange" not in plan


def test_s08_query_block_broadcasts(spark):
    """Batched ANN serving must broadcast the query block — the corpus
    never shuffles to meet the queries."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.s08_multi_query_topk(spark, SF_DIR_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ts08_minmax_single_exchange(spark):
    """Unordered per-key min/max windows ride one Exchange, no Sort-based
    second shuffle."""
    assert _n_exchanges(registry.ts08_minmax_norm(spark, SF_DIR_SMALL)) == 1


def test_ts09_gap_detect_single_exchange(spark):
    assert _n_exchanges(registry.ts09_gap_detect(spark, SF_DIR_SMALL)) == 1


def test_q51_cohort_sizes_broadcast(spark):
    """The cohort-size table (~#weeks rows) must broadcast into the cells
    join — the fact-sized shuffles are only the user-keyed aggregates."""
    plan = _plan(registry.q51_retention_cohorts(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan


def test_q54_pair_topk_take_ordered(spark):
    """Pair mining's final top-20 must plan as TakeOrderedAndProject (per-
    partition heap + merge), and the pair count must partial-aggregate
    before its shuffle so shuffled bytes ~ #distinct pairs."""
    plan = _plan(registry.q54_pair_cooccurrence(spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_q55_count_partial_aggregates(spark):
    """The bigram count must map-side combine; the probability window
    runs over the ~|types|^2 aggregate, not over raw events."""
    plan = _plan(registry.q55_transition_matrix(spark, SF_DIR_SMALL))
    assert "partial_count" in plan


def test_q56_funnel_partial_mins(spark):
    """Each funnel step is a keyed MIN aggregate with map-side combine;
    the three 1-row summaries meet via broadcast, never a shuffle."""
    plan = _plan(registry.q56_funnel_conversion(spark, SF_DIR_SMALL))
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_v06_span_broadcast_single_pass(spark):
    """The 1-row midpoint aggregate broadcasts onto the scan; the epoch
    profile partial-aggregates, so post-scan state is O(1)."""
    plan = _plan(registry.v06_profile_drift(spark, SF_DIR_SMALL))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan


def test_t14_bigram_lift_take_ordered(spark):
    """Bigram and unigram counts partial-aggregate to vocab-sized tables;
    the top-20 plans as TakeOrderedAndProject, and the corpus total rides
    a broadcast 1-row cross join (no second explode pass)."""
    plan = _plan(registry.queries()["t14_bigram_lift"](spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q57_per_type_tables_broadcast(spark):
    """Both percentile passes hand back |types|-row tables; every join
    against the fact must broadcast, never shuffle the events side twice
    for a join."""
    plan = _plan(registry.q57_mad_outliers(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_j10_one_partitioning_two_windows(spark):
    """Change detection and interval close-out share the user_id
    partitioning — exactly one Exchange."""
    assert _n_exchanges(registry.j10_scd2_intervals(spark, SF_DIR_SMALL)) == 1


def test_s09_pool_stage_take_ordered(spark):
    """MMR stage 1 (top-pool by relevance) must plan as TakeOrdered over
    the corpus; the greedy stage touches only the constant-size pool."""
    plan = _plan(registry.queries()["s09_mmr_rerank"](spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_ts11_single_partitioning_reused(spark):
    """Bucket agg and both lag windows key on the series — one hash
    partitioning, no second fact-sized Exchange."""
    plan = _plan(registry.ts11_mase(spark, SF_DIR_SMALL))
    assert plan.count("hashpartitioning(") <= 2
    assert "partial_sum" in plan


def test_ts12_ohlc_single_exchange_partial_agg(spark):
    """OHLC resample must combine map-side: one hash Exchange on
    (user, bucket), partial min_by/max_by/min/max/count below it."""
    assert _n_exchanges(registry.ts12_ohlc(spark, SF_DIR_SMALL)) == 1
    plan = _plan(registry.ts12_ohlc(spark, SF_DIR_SMALL))
    assert "partial_min" in plan and "partial_max" in plan


def test_q59_unpivot_expands_post_aggregate(spark):
    """Unpivot is an Expand over the aggregated table — one Exchange
    (the groupBy), and the scan reads only the two needed columns."""
    assert _n_exchanges(registry.q59_unpivot(spark, SF_DIR_SMALL)) == 1
    plan = _plan(registry.q59_unpivot(spark, SF_DIR_SMALL))
    assert "Expand" in plan
    assert "ReadSchema: struct<event_type:string,value:double>" in plan


def test_s10_quant_is_map_only(spark):
    """int8 quantization audit must be a shuffle-free projection
    colocated with the scan."""
    from mbta_etl_spark.plans import llm_registry

    assert _n_exchanges(llm_registry.s10_int8_quant(spark, SF_DIR_SMALL)) == 0


def test_j11_single_exchange_union_window(spark):
    """SCD2 enrichment is the union-tag merge-join shape: one user-keyed
    Exchange for states+facts together, never a range join."""
    assert _n_exchanges(registry.j11_scd2_enrich(spark, SF_DIR_SMALL)) == 1
    plan = _plan(registry.j11_scd2_enrich(spark, SF_DIR_SMALL))
    assert "Join" not in plan


def test_m07_audio_decode_no_shuffle(spark):
    from mbta_etl_spark.plans import llm_registry

    assert _n_exchanges(llm_registry.m07_audio_features(spark, SF_DIR_SMALL)) == 0


def test_v10_rule_census_one_scan(spark):
    """N rules must cost ONE scan: every predicate is partial-agg state
    (partial_count/min/max), folded by a single exchange, then the
    constant-width stack (Generate). A second scan means the rules
    stopped sharing the pass."""
    plan = _plan(registry.v10_rule_census(spark, SF_DIR_SMALL))
    # the tree section lists each node once; 'Scan parquet' also appears
    # in the detail section -> assert on the tree by node id instead
    tree = plan.split("(1) Scan parquet")[0]
    assert tree.count("Scan parquet") == 1
    assert "partial_count" in plan and "partial_min" in plan
    assert "Generate" in tree  # the stack() unpivot


def test_q69_trade_matrix_broadcast_dims_single_agg_shuffle(spark):
    """Q7 shape: nation dims broadcast; exactly one hash-partition
    exchange (the final matrix group-by) plus AQE's join exchanges —
    the aggregate itself must be map-side combinable."""
    plan = _plan(registry.q69_trade_matrix(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert plan.count("hashpartitioning(") <= 2


def test_q71_shipping_priority_pushdown_and_topk(spark):
    """Q3 shape: both date filters reach their scans; the top-10 plans
    as TakeOrderedAndProject, never a global sort."""
    plan = _plan(registry.q71_shipping_priority(spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan and "l_shipdate" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_t18_heavy_hitters_candidates_broadcast(spark):
    """Two-pass MG: the candidate set must come back as a BROADCAST
    join against the token stream (pass 2), with the MG summarizer as
    MapInPandas — no full-vocab shuffle on the recount path."""
    plan = _plan(
        __import__(
            "mbta_etl_spark.plans.llm_registry", fromlist=["llm_registry"]
        ).t18_heavy_hitter_tokens(spark, SF_DIR_SMALL)
    )
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan


def test_j13_broadcast_range_lookup(spark):
    """Non-equi band join must plan as BroadcastNestedLoopJoin against
    the 5-row dim (a map-side lookup), with the aggregate partial —
    a shuffled NLJ here would be catastrophic at scale."""
    plan = _plan(registry.j13_range_bucket_join(spark, SF_DIR_SMALL))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan


def test_m09_byte_entropy_no_shuffle(spark):
    """The entropy kernel is map-only: MapInPandas with ZERO exchanges
    in the plan tree — any shuffle means the per-row histogram leaked
    into a distributed aggregation."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.m09_byte_entropy(spark, SF_DIR_SMALL))
    tree = plan.split("(1)")[0]
    assert "MapInPandas" in plan
    assert tree.count("Exchange") == 0


def test_q92_gini_ranks_aggregate_not_fact(spark):
    """The rank window runs on the CUSTOMER aggregate: exactly one
    hash-partition exchange (the custkey groupBy); the single-partition
    window is over the aggregate, never the orders fact table."""
    plan = _plan(registry.q92_gini(spark, SF_DIR_SMALL))
    assert plan.count("hashpartitioning(") == 1
    assert "partial_sum" in plan


def test_m10_m11_codec_roundtrip_id_only_shuffle(spark):
    """The real-codec round-trips (synthesize → decode) are two chained
    MapInPandas stages fed by exactly ONE round-robin exchange of the
    8-byte id projection (round-8: the single-split local scan had been
    serializing all synthesis+decode into one task; the balance shuffle
    moves ids only — payloads are created after it and never move)."""
    from mbta_etl_spark.plans import llm_registry

    # wav synthesis is ~free, so m11 stays map-only (measured: the
    # balance shuffle costs more than it buys there)
    for entry, n_exchanges in (
        (llm_registry.m10_png_decode, 1),
        (llm_registry.m11_wav_decode, 0),
    ):
        plan = _plan(entry(spark, SF_DIR_SMALL))
        tree = plan.split("(1)")[0]
        assert tree.count("MapInPandas") == 2
        assert tree.count("Exchange") == n_exchanges
        if n_exchanges:
            assert "RoundRobinPartitioning" in plan or "roundrobin" in plan
            # the exchange must sit BELOW the synthesis kernel: ids
            # move, payloads do not (no Exchange between the kernels)
            after_first_kernel = tree.split("MapInPandas", 1)[1]
            assert "Exchange" not in after_first_kernel.split("MapInPandas")[0]
        # column pruning: the synthesis stage only needs the id
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "text" not in read_schema


def test_src02_partition_pruning(spark):
    """The source filter must prune at the DIRECTORY level: it appears
    in PartitionFilters on the scan of the partitioned tree, not as a
    row-level data filter over all partitions."""
    plan = _plan(registry.src02_partition_pruned_scan(spark, SF_DIR_SMALL))
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "src2" in part_lines[0] and "src7" in part_lines[0]


def test_t24_bm25_broadcast_stats_and_takeordered(spark):
    """BM25's plan promise: corpus stats arrive as a 1-row broadcast
    (BroadcastNestedLoopJoin over a BroadcastExchange), the top-k is
    TakeOrderedAndProject (never a global Sort), and per-term tf counts
    stay in-scan — no explode, so no row-multiplying generator node."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.t24_bm25(spark, SF_DIR_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Generate" not in plan  # no explode anywhere
    assert "SortMergeJoin" not in plan


def test_s20_rrf_fusion_joins_pools_not_corpus(spark):
    """Both retrieval pools come out of TakeOrdered paths before the
    fusion join — the full-outer join must sit above two
    TakeOrderedAndProject nodes, so fusion work is O(pool)."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.s20_hybrid_rrf(spark, SF_DIR_SMALL))
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "FullOuter" in plan


def test_d26_semantic_dedup_bucketed_equijoin(spark):
    """SemDeDup's candidate join must be a hash-partitioned EQUI-join on
    the cluster id (SortMergeJoin/ShuffledHashJoin with the id-order
    predicate as a join condition), never a cartesian product."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.d26_semantic_dedup(spark, SF_DIR_SMALL))
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_src04_zorder_zvalue_is_codegen_expression(spark):
    """The Morton value must be computed inside whole-stage codegen (a
    pure shift/and projection) — no Python evaluation node anywhere in
    the layout job."""
    plan = _plan(registry.src04_zorder_layout(spark, SF_DIR_SMALL))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # shape: key-range stats arrive as a 1-row broadcast; ONE window
    # (the NTILE tiling) is the only global ordering step
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window (") == 1


def test_src05_bloom_runtime_filter_injected(spark):
    """Under the src05 conf overrides the optimizer must inject the
    runtime bloom filter on the FACT side: `might_contain(... xxhash64(
    l_orderkey ...))` appears as a pre-shuffle filter, and the join stays
    a shuffle join (no broadcast — the 100 TB shape). Without semantics
    change: the checkpointed entry is oracle-checked separately."""
    saved = {k: spark.conf.get(k, None) for k in registry._BLOOM_CONFS}
    try:
        for k, v in registry._BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = registry._src05_joined(spark, SF_DIR_SMALL)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt
        assert "xxhash64(l_orderkey" in opt
        phys = _plan(df)
        assert "BroadcastHashJoin" not in phys
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_src06_bucketed_join_no_exchange(spark):
    """The co-bucketed catalog tables must join with NO Exchange on
    either side (SortMergeJoin straight over bucketed scans) — the
    write-once-shuffle-never-again layout contract src06 demonstrates."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, cb = registry._src06_tables(spark, SF_DIR_SMALL)
        joined = ob.join(cb, "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # the grouped entry output: only the final aggregation may add
        # exchanges (keyed on c_mktsegment, not the bucket key)
        agg = joined.groupBy("c_mktsegment").agg({"*": "count"})
        agg_plan = _plan(agg)
        assert "SortMergeJoin" in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's OptimizeSkewedJoin is the automatic counterpart of j07's
    manual salting: with one key holding ~95% of the fact rows, the
    runtime re-plan must mark the SortMergeJoin skew=true (the oversized
    shuffle partition is split across tasks) without changing results.
    Thresholds are lowered because testdata partitions are far below the
    256 MB production default — same lever as src05's bloom confs."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise((F.col("id") % 10) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(11).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("w")
        )
        joined = fact.join(dim, "k")
        # collect() runs THIS dataset's QueryExecution (count() would
        # execute a different plan and leave this one un-finalized)
        assert len(joined.collect()) == 400_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_c22_epoch_plan_partial_agg_no_python(spark):
    """The corpus pass must partial-aggregate map-side (shuffle carries
    sources, not rows) and stay fully JVM-side."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.c22_epoch_plan(spark, SF_DIR_SMALL))
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c23_shuffle_shards_single_corpus_exchange(spark):
    """Shard stats are one hash aggregation keyed by the computed shard
    id — no global sort/window anywhere (the NTILE formulation would
    show a single-partition Sort)."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.c23_shuffle_shards(spark, SF_DIR_SMALL))
    assert "Window" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BatchEvalPython" not in plan


def test_c24_materialize_broadcasts_plan_side(spark):
    """The #sources-row epoch plan must broadcast to the corpus scan —
    the corpus never shuffles to meet its plan."""
    from mbta_etl_spark.plans import llm_registry

    plan = _plan(llm_registry.c24_epoch_materialize(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_src08_merged_scan_reads_evolved_column(spark):
    """The mergeSchema scan must surface the evolved column in the read
    schema (footer union), with the census still a partial-aggregating
    single exchange."""
    plan = _plan(registry.src08_schema_evolution(spark, SF_DIR_SMALL))
    assert "n_tokens" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_s21_probe_prunes_partitions_and_matches_s05(spark):
    """The persisted IVF index must serve the query through directory-
    level partition pruning (PartitionFilters on the cell predicate),
    and — same deterministic quantizer — return exactly s05's answer."""
    from mbta_etl_spark.plans import llm_registry

    df = llm_registry.s21_ivf_persist(spark, SF_DIR_SMALL)
    plan = _plan(df)
    assert "PartitionFilters" in plan and "cell" in plan
    s05 = llm_registry.s05_ivf_topk(spark, SF_DIR_SMALL)
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in s05.collect()]
