"""End-to-end training-corpus cleaning pipeline — the composition a
100 TB LLM-data job runs, built from the operator library:

    quality filter → exact dedup (keep min doc_id per sha)
                   → near-dedup (MinHash+LSH pairs; greedy drop the
                     higher doc_id of each confirmed pair)
                   → surviving documents + their text stats

Every stage is lazy DataFrame-to-DataFrame; the whole pipeline is ONE
Catalyst plan (filters push into the scans of every branch).

Greedy pair-drop (rather than connected components) is deliberate:
it's deterministic, single-pass, SQL-expressible (so the DuckDB oracle
can verify the kept-set exactly), and the standard practical choice —
iterative CC needs a loop (GraphFrames/iterate-until-fixpoint) and only
changes which representative survives a duplicate cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mbta_etl_spark.operators import dedup, text


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Returns the surviving documents with quality + token stats.

    Drop rules, in order:
    1. quality < min_quality (length/stopword/punctuation heuristic)
    2. exact duplicates: every doc whose sha256(text) group has a smaller
       doc_id survivor
    3. near duplicates: the larger doc_id of every LSH-confirmed pair with
       Jaccard ≥ threshold (computed among quality survivors)
    """
    t, i = F.col(text_col), F.col(id_col)

    assert id_col == "doc_id", "clean_corpus expects the id column named doc_id"
    q = text.quality_score(docs, t, i).select("doc_id", "quality")
    qualified = docs.join(q.filter(F.col("quality") >= min_quality), "doc_id")

    # exact dedup: keep the min doc_id of each content group
    keep = dedup.exact_dedup_groups(qualified, t, i).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    exact_kept = qualified.join(keep, "doc_id")

    # near-dedup among the exact-kept set: drop doc_b of each pair
    pairs = dedup.minhash_lsh_pairs(
        exact_kept, t, i, threshold=jaccard_threshold
    )
    drop_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = exact_kept.join(drop_b, "doc_id", "left_anti")

    stats = text.token_stats(survivors, t, i)
    return (
        survivors.join(stats, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "n_uniq_tokens",
                F.col("quality"))
    )
