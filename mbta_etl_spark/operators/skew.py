"""Skew mitigation for hot join keys: salted (replicated) equi-join.

When a shuffle join's key distribution is pathological (a handful of keys
own most rows), the reducers owning those keys straggle while the rest of
the cluster idles. AQE's skew-join splitting (`spark.sql.adaptive.
skewJoin.enabled`) handles this transparently for sort-merge joins by
splitting oversized partitions — reach for THIS operator only when that
isn't available to the plan shape (e.g. the build side must stream, or
the skew is in an aggregation feeding the join) or when you need the
mitigation pinned in the plan rather than decided at runtime.

Mechanics: every fact row gets a deterministic salt in [0, n); the
dimension side is replicated once per salt value with `explode(sequence)`
(JVM-side, no Python). The join key becomes (key, salt), so a key that
previously hashed to ONE reducer now spreads over n. The dim replication
multiplies the small side by n — that's the trade: n× a small table
against eliminating the straggler on a huge one. Result set is IDENTICAL
to the unsalted join (the oracle checks exactly that).

If the dim side fits in a broadcast, broadcast it instead — salting only
pays when the dim is too big to broadcast AND the fact keys are hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int,
    salt_src: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the fact side salted by
    ``pmod(salt_src, n_salts)`` and the dim side replicated per salt.

    ``salt_src`` must be deterministic per fact row (a row id, not
    rand()) so re-executed tasks salt identically — Spark retries tasks,
    and a nondeterministic salt would let retried partitions pair rows
    with a different dim replica than their first attempt (harmless for
    inner joins, corrupting for outer ones)."""
    salted_fact = fact.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")
