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
