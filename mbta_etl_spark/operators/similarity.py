"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB training-data pipeline needs:

- **Brute-force top-k** (baseline): one distributed scan computing
  query·vec with built-in higher-order functions (zip_with + aggregate —
  pure JVM, no Python), then TakeOrderedAndProject for the top-k. Exact,
  O(n·d), embarrassingly parallel: correct answer at any scale, cost
  linear in corpus size.

- **LSH-bucketed top-k** (scale path): deterministic random-hyperplane
  signatures (signs derived from md5, so Spark and the DuckDB oracle
  derive identical planes); only vectors in the query's bucket (or within
  ``probe_hamming`` of it) are scored. Sub-linear candidate set at the
  cost of recall — the standard trade, measured in tests against the
  brute-force baseline.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^N_PLANES buckets. Few planes + multi-probe beats many planes on
# high-dimensional data where true neighbors are only weakly correlated
# (each extra plane halves bucket size but cuts neighbor-collision odds).
N_PLANES = 6


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot_lit(vec: Column, q: list[float]) -> Column:
    """vec · literal-query, JVM-side: zip_with product then ordered fold
    (same left-to-right summation the DuckDB oracle uses)."""
    qlit = F.array(*[F.lit(float(x)) for x in q])
    prods = F.zip_with(_as_double(vec), qlit, lambda a, b: a * b)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec: Column) -> Column:
    sq = F.transform(_as_double(vec), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    qnorm = math.sqrt(math.fsum(x * x for x in query))
    cos = _dot_lit(F.col(vec_col), query) / (_norm(F.col(vec_col)) * qnorm)
    out = df.select(
        F.col(id_col), F.col("label"), F.round(cos, 6).alias("cosine")
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component (p, i) is +1 iff the first
    hex nibble of md5(f"{p}:{i}") is even. Pure public hashing — any
    engine (or the oracle SQL) can re-derive the same planes."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            row.append(1.0 if int(digest[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = Σ 2^p · [vec·plane_p > 0] (an integer in [0, 2^P))."""
    sig = None
    for p, plane in enumerate(planes):
        bit = F.when(_dot_lit(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def probe_signatures(query: list[float], planes: list[list[float]], probe_hamming: int = 1) -> list[int]:
    """The query's signature plus every signature within Hamming distance
    ``probe_hamming`` (multi-probe LSH: neighbors that land one flipped
    plane away are recovered without enlarging buckets)."""
    qsig = 0
    for p, plane in enumerate(planes):
        dot = math.fsum(a * b for a, b in zip(query, plane))
        if dot > 0:
            qsig |= 1 << p
    sigs = [qsig]
    if probe_hamming >= 1:
        sigs += [qsig ^ (1 << p) for p in range(len(planes))]
    return sigs


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = N_PLANES,
    exclude_id=None,
) -> DataFrame:
    """LSH-bucketed cosine top-k with Hamming-1 multi-probe: score only
    vectors whose signature is in the query's probe set. The signature
    filter is a pushable integer predicate — at scale you'd partition or
    bucket the table by signature so the probe prunes to P+1 buckets'
    files instead of scanning the corpus."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes)
    sigs = probe_signatures(query, planes)
    cand = df.withColumn("_sig", lsh_signature(F.col(vec_col), planes)).filter(
        F.col("_sig").isin(sigs)
    )
    return cosine_topk(cand.drop("_sig"), vec_col, id_col, query, k, exclude_id)


def norm_zscore_per_label(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Per-label z-score of embedding L2 norms via applyInPandas — the
    grouped-map Pandas UDF surface: each label group arrives as one
    Arrow-backed pandas DataFrame, numpy does the vector math batch-wise.

    Shuffle shape: one exchange keyed by label (same as a groupBy); the
    Python boundary transfers each group once, columnar. At 100 TB you'd
    salt pathological labels; the kernel itself is size-oblivious.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", LongType()),
            StructField("norm", DoubleType()),
            StructField("z", DoubleType()),
        ]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        mu = norms.mean()
        sd = norms.std()  # population std, ddof=0 — oracle uses stddev_pop
        z = np.zeros_like(norms) if sd == 0 else (norms - mu) / sd
        # no np.round here: numpy rounds half-to-even, SQL rounds
        # half-away-from-zero — rounding happens engine-side below
        return pd.DataFrame(
            {
                "vec_id": pdf[id_col].astype("int64"),
                "label": pdf["label"].astype("int64"),
                "norm": norms,
                "z": z,
            }
        )

    out = df.groupBy("label").applyInPandas(_z, schema=out_schema)
    return out.select(
        "vec_id",
        "label",
        F.round("norm", 6).alias("norm"),
        F.round("z", 4).alias("z"),
    )


def pairwise_topk_per_label(
    df: DataFrame, vec_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """For each vector: its top-k cosine neighbors within the same label
    group (a blocked all-pairs — the blocking key bounds the quadratic
    term, the standard trick for within-class near-dup detection).
    Returns (vec_id, neighbor_id, cosine) rows."""
    from pyspark.sql import Window

    # Compute each vector's norm ONCE before the pair join (O(n·d));
    # norms inside the join projection would be redone per PAIR (O(n²·d)).
    # The join boundary keeps the pre-join projection from being inlined
    # into the per-pair expression.
    a = df.select(
        F.col(id_col).alias("vec_id"),
        F.col("label"),
        _as_double(F.col(vec_col)).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("label"),
        _as_double(F.col(vec_col)).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    prods = F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y)
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    joined = (
        a.join(b, "label")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
