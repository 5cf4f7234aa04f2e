"""Deterministic sampling operators for training-data pipelines.

``df.sample``/``sampleBy`` draw from a per-partition RNG stream, so the
kept set changes whenever partitioning changes — unacceptable for
reproducible corpus construction. These operators sample by CONTENT
HASH instead: a row is kept iff md5_32(key) mod D lands under the
rate. Properties a 100 TB pipeline needs:

- **Reproducible anywhere**: same rows survive on any cluster, any
  partitioning, any engine (md5 is md5) — and the oracle can replay it.
- **Stable under growth**: a row's fate never changes as the corpus
  grows, so incremental reruns don't churn the sample.
- **No coordination**: pure projection + filter, no shuffle, no RNG
  state; composes with partition pruning and pushdown.
- **Salt to decorrelate**: different sample draws use different salts;
  without a salt change, nested samples are subsets (often a feature:
  10% ⊂ 20%).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 10_000  # basis points: rates quantized to 0.01%


def _bucket(key: Column, salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return h % DENOM


def hash_sample(df: DataFrame, key: Column, rate: float, salt: str = "s0") -> DataFrame:
    """Keep ~rate of rows, chosen by content hash of ``key``."""
    return df.filter(_bucket(key, salt) < int(rate * DENOM))


def stratified_hash_sample(
    df: DataFrame, key: Column, stratum: Column, rates: dict[str, float], salt: str = "s0"
) -> DataFrame:
    """Per-stratum hash sampling: stratum value → keep rate (strata not
    in ``rates`` are dropped). One codegen'd CASE over the hash bucket —
    no shuffle, no per-stratum pass, unlike ``sampleBy``."""
    thresh = None
    for value, rate in sorted(rates.items()):
        t = F.lit(int(rate * DENOM))
        thresh = (
            F.when(stratum == value, t)
            if thresh is None
            else thresh.when(stratum == value, t)
        )
    thresh = thresh.otherwise(F.lit(0))
    return df.filter(_bucket(key, salt) < thresh)


def split_assign(
    df: DataFrame,
    key: Column,
    splits: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the hash bucket of ``key``
    picks the split, so membership is exhaustive, disjoint, reproducible
    on any partitioning, and stable as the corpus grows (a doc never
    migrates between splits on re-runs). The last split absorbs hash
    rounding. Pure projection — no shuffle."""
    b = _bucket(key, salt)
    expr = None
    acc = 0
    for name, frac in splits[:-1]:
        acc += int(frac * DENOM)
        expr = F.when(b < acc, name) if expr is None else expr.when(b < acc, name)
    last = F.lit(splits[-1][0])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def weighted_mix(
    df: DataFrame,
    key: Column,
    stratum: Column,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixture: stratum weight w replicates each row
    floor(w) times plus one extra copy with probability frac(w), decided
    by content hash (same determinism argument as hash_sample). Strata
    absent from ``weights`` get 0 and drop out. Emits a ``copy`` ordinal
    (1..n) so downstream shuffles can tell replicas apart. The expansion
    is explode-after-filter: rows with zero copies never enter the
    explode, and no shuffle is introduced."""
    w_int = None
    w_frac = None
    for value, w in sorted(weights.items()):
        iw, fw = int(w), int(round((w - int(w)) * DENOM))
        w_int = (
            F.when(stratum == value, iw)
            if w_int is None
            else w_int.when(stratum == value, iw)
        )
        w_frac = (
            F.when(stratum == value, fw)
            if w_frac is None
            else w_frac.when(stratum == value, fw)
        )
    n = w_int.otherwise(0) + (_bucket(key, salt) < w_frac.otherwise(0)).cast("int")
    copies = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(F.array())
    return df.withColumn("copy", F.explode(copies))
