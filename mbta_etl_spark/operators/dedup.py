"""Deduplication operators for training-data pipelines: exact,
fingerprint (token-multiset), n-gram Jaccard near-dup, MinHash+LSH,
SimHash.

Scale design notes
------------------
- Exact / fingerprint dedup: one hash projection + one groupBy shuffle on
  the hash — the canonical 100 TB dedup shape (hash is uniform, so no
  skew; partial aggregation keeps shuffled bytes ~ #groups).
- n-gram Jaccard: explode distinct shingles → self-join on shingle →
  pair-count. Cost is Σ_s df(s)², so high-document-frequency shingles
  explode quadratically; ``max_shingle_df`` caps them (standard practice —
  a shingle in >N docs carries ~no similarity signal). At 100 TB you'd
  always set the cap.
- MinHash+LSH: the scalable near-dup path. Signatures are a bounded
  (n_hashes × doc) aggregation; banding turns O(n²) pair generation into
  a join on band keys, so only probable-similar pairs are verified.
- All hashing is md5-based and engine-portable: every operator here has a
  bit-exact DuckDB oracle (MinHash "permutations" are min-of-md5-hex per
  seed — lexicographic min over a keyed hex digest is a valid random
  permutation proxy and identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mbta_etl_spark.operators.text import shingles

NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows


def exact_dedup_groups(df: DataFrame, text: Column, id_col: Column) -> DataFrame:
    """Exact dedup by sha256(text): one row per distinct content with the
    canonical (min) id and copy count. The kept-set is
    ``keep_doc_id``; everything else is a duplicate."""
    return (
        df.select(F.sha2(text, 256).alias("text_sha"), id_col.alias("_id"))
        .groupBy("text_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("_id").alias("keep_doc_id"),
        )
    )


def fingerprint_dedup_groups(df: DataFrame, text: Column, id_col: Column) -> DataFrame:
    """Order-insensitive dedup: md5 of the sorted token multiset — catches
    shuffled/reordered copies exact hashing misses."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.split(text, " "))))
    return (
        df.select(fp.alias("fp"), id_col.alias("_id"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("_id").alias("keep_doc_id"),
        )
    )


def _shingle_table(df: DataFrame, text: Column, id_col: Column, k: int) -> DataFrame:
    """(doc_id, shingle) exploded distinct-shingle table."""
    return df.select(
        id_col.alias("doc_id"), F.explode(shingles(text, k)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: Column,
    id_col: Column,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs token-k-gram Jaccard similarity ≥ threshold.

    shingle-join candidate generation: pairs sharing ≥1 shingle, then
    |A∩B| from the pair-count and |A∪B| = |A|+|B|−|A∩B|.
    ``max_shingle_df`` drops shingles present in more than N docs before
    the join (cap the quadratic term; None = exact all-pairs).
    """
    # the shingle table feeds three plan branches (sizes, join-left,
    # join-right); persist AND materialize eagerly — lazily-persisted
    # branches within one action each recompute before the cache fills
    sh = _shingle_table(df, text, id_col, k).persist()
    sh.count()
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    jacc = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_wide(sh: DataFrame, n_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): all minhashes in ONE map-side-combinable
    aggregation over the shingle table — n_hashes min-columns instead of
    exploding n_hashes× rows through the shuffle."""
    mins = [
        F.min(
            F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))
        ).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def _minhash_from_shingles(sh: DataFrame, n_hashes: int = NUM_HASHES) -> DataFrame:
    wide = _minhash_wide(sh, n_hashes)
    pairs = ", ".join(f"{s}, mh{s}" for s in range(n_hashes))
    return wide.select(
        "doc_id", F.expr(f"stack({n_hashes}, {pairs}) AS (seed, mh)")
    )


def minhash_signatures(
    df: DataFrame, text: Column, id_col: Column, k: int = 3, n_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, seed, mh): per-seed MinHash where permutation i is
    "lexicographic order of md5(i:shingle)" — engine-portable and
    deterministic. One explode + one (doc, seed)-keyed min aggregation."""
    return _minhash_from_shingles(_shingle_table(df, text, id_col, k), n_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    text: Column,
    id_col: Column,
    k: int = 3,
    threshold: float = 0.5,
    n_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with true Jaccard ≥ threshold.

    Pipeline: signatures → band keys (md5 over the band's minhashes in
    seed order) → candidate pairs = docs sharing any band key → exact
    Jaccard verification of candidates only. This is the sub-quadratic
    path for 100 TB near-dedup; the verification join only touches
    candidate pairs."""
    # shingle generation feeds 4 plan branches (signatures, sizes, and
    # both sides of the verification join) — persist + eager materialize
    # so it is computed once
    sh = _shingle_table(df, text, id_col, k).persist()
    sh.count()
    # band keys straight from the wide signature: one aggregation, then a
    # stack to (doc_id, band, band_key) rows for the collision join — no
    # per-(doc,seed) shuffle, no collect_list
    wide = _minhash_wide(sh, n_hashes)
    n_bands = n_hashes // band_size
    band_keys = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]
            )
        ).alias(f"bk{b}")
        for b in range(n_bands)
    ]
    stack_args = ", ".join(f"{b}, bk{b}" for b in range(n_bands))
    bands = wide.select("doc_id", *band_keys).select(
        "doc_id", F.expr(f"stack({n_bands}, {stack_args}) AS (band, band_key)")
    )
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    cand = (
        ba.join(bb, ["band", "band_key"])
        .filter(F.col("ba.doc_id") < F.col("bb.doc_id"))
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    jacc = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 32


def simhash(df: DataFrame, text: Column, id_col: Column) -> DataFrame:
    """32-bit SimHash over distinct tokens: token hash = first 8 hex chars
    of md5 as uint32; each bit position accumulates +1/−1 across tokens;
    the signature sets bits with positive sums.

    Expressed as explode → 32 conditional sums → bit recombination: one
    shuffle keyed by doc_id, all JVM-side."""
    toks = df.select(
        id_col.alias("doc_id"),
        F.explode(F.array_distinct(F.split(text, " "))).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("long").alias("simhash"))
