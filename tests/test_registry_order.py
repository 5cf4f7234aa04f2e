"""Registry-order guard: the driver's correctness harness checks the
FIRST 50 entries of queries() in iteration order. Every entry that has no
green driver row yet (new this round, or fixed this round) must sit
inside that window — an accidental reorder would silently strip the
north-star operators of differential verification (the round-1 failure
mode)."""

from __future__ import annotations

import __spark_entry__ as entrymod

# entries with no prior green driver CORRECTNESS row (r1 window miss or
# added in round 2) plus the three whose oracles were fixed in round 2
MUST_BE_IN_WINDOW = {
    # LLM-pipeline surface, unchecked in r1 (slots 51+ back then)
    "d01_exact_dedup", "d02_fingerprint_dedup", "d03_ngram_jaccard_pairs",
    "d04_minhash_lsh_pairs", "d05_simhash", "d06_embed_cosine_pairs",
    "d07_dup_clusters", "d08_decontaminate",
    "s01_cosine_topk", "s02_lsh_topk", "s03_label_topk_pairs",
    "s04_norm_zscore", "s05_ivf_topk", "s06_vector_norms",
    "s07_label_median_norm",
    "t01_token_stats", "t02_quality_score", "t03_lang_id", "t04_fingerprint",
    "t05_bpe_tokens", "t06_pii_scrub", "t07_vocab_df", "t08_tfidf",
    "t09_repetition", "t10_tokenize_udtf",
    "m01_binary_meta", "m02_fake_image_features", "m03_frame_samples",
    "c01_corpus_clean", "c02_corpus_mix", "c03_split_assign",
    "c04_chunk_pack", "c05_greedy_pack",
    "j02_range_attribution", "j03_customers_no_orders",
    "j04_big_spenders_semi", "j05_full_outer_reconcile",
    # new in round 2
    "d09_simhash_band_pairs", "k01_kmeans_clusters", "c06_token_budget",
    "c07_eval_sample", "t11_unigram_lm", "m04_fake_resize",
    "r01_incremental_rollup", "v01_constraint_check",
    "v02_referential_check", "v03_snapshot_diff",
    # oracle fixes in round 2 (red/err in CORRECTNESS_r01)
    "q25_pivot_counts", "q35_order_basket", "q44_late_ship_priority",
}

# ROUND 3 ROTATION PLAN: the r2 window is fully occupied by the entries
# above; everything added later in round 2 sits past slot 50 and has no
# driver row yet. Next round, swap these into the front of queries()
# (the r2 window's entries will have green CORRECTNESS_r02 rows by then)
# and update MUST_BE_IN_WINDOW accordingly:
#   ts01_locf ts02_delta_rate ts03_interpolate ts04_rolling_zscore
#   ts05_bucket_gapfill ts06_ewma c08_weighted_sample j07_salted_join
#   q48_analytic_battery d10_ngram_containment m05_phash_dupes c10_temperature_mix v05_quarantine_split d11_incremental_dedup j08_interval_overlap t12_boilerplate_frac s08_multi_query_topk r02_sketch_rollup q49_fuzzy_join t13_zipf_spectrum q50_bag_set_ops c12_curriculum_shards ts07_downsample ts08_minmax_norm ts09_gap_detect ts10_locf_ttl j09_nearest_event d12_normalized_dedup q52_topk_with_ties q53_rolling_distinct
#   (+ anything new in round 3)
# d05_simhash / d09_simhash_band_pairs changed semantics (64-bit sigs)
# AFTER the r2 window was fixed — they are in the r2 window, so their
# new values get driver rows this round; no carry-over needed.


def test_unverified_entries_sit_in_driver_window():
    first50 = list(entrymod.queries())[:50]
    missing = MUST_BE_IN_WINDOW - set(first50)
    assert not missing, (
        f"{len(missing)} driver-unverified entries fell out of the first-50 "
        f"correctness window: {sorted(missing)}"
    )


def test_every_query_has_oracle_or_documented_exception():
    """rows-only entries are a deliberate, enumerated set — anything else
    must carry an oracle."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    rows_only = qs - oracles
    assert rows_only == {"q09a_percentiles_approx", "q24a_distinct_approx",
                         "r02_sketch_rollup", "s15_pca_eigen"}, (
        f"unexpected rows-only entries: {sorted(rows_only)}"
    )
    assert not (oracles - qs), "orphan oracles with no query entry"
