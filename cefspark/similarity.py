"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed ANN,
and an IVF (inverted-file) variant.

Vector math stays JVM-side via F.zip_with / F.aggregate higher-order
functions (vectorized over the array column, no Python). Floats are upcast
to double before accumulation so results are engine-stable.

Scale path: brute force is one narrow scan + a top-k (TakeOrdered) — fine for
one query; for query *sets* use lsh_bucketed_topk (hyperplane buckets turn
the cross join into an equi-join) or ivf_topk (probe only the closest
partitions of a centroid index).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def brute_force_topk(df: DataFrame, query: Sequence[float], k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against one query vector. The plan is scan ->
    project -> TakeOrderedAndProject: no shuffle, k rows to the driver."""
    q = _lit_vec(query)
    return (df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
            .orderBy(F.desc("cos"), F.col(id_col))
            .limit(k))


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_id(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH bucket: one bit per plane (sign of projection)."""
    bit_terms = []
    for i, p in enumerate(planes):
        b = F.when(dot(vec, _lit_vec(p)) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bit_terms.append(F.shiftleft(b, i))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out.bitwiseXOR(t)
    return out


def lsh_bucketed_topk(df: DataFrame, query: Sequence[float], k: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_planes: int = 8, seed: int = 7,
                      multiprobe: int = 0) -> DataFrame:
    """ANN: restrict the exact scan to vectors in the query's hyperplane
    bucket, plus (``multiprobe`` > 0) every bucket within that Hamming radius
    of it — the standard multi-probe LSH recall lever. At multiprobe=0 the
    scan fraction is ~1/2^n_planes with recall well below 1; each +1 of
    radius trades scan volume for recall. At scale the bucket is the table's
    partition key, so probing is partition pruning (the probed bucket set is
    enumerable driver-side: sum of C(n_planes, r) buckets)."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qbits = 0
    qn = np.asarray(query, dtype=np.float64)
    for i, p in enumerate(planes):
        if float(np.dot(qn, p)) > 0:
            qbits |= 1 << i
    bucketed = df.withColumn("_bucket", bucket_id(F.col(vec_col), planes))
    probe = F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbits))) <= multiprobe \
        if multiprobe > 0 else F.col("_bucket") == qbits
    return (bucketed.where(probe)
            .select(F.col(id_col), F.round(cosine(F.col(vec_col), _lit_vec(query)), 6).alias("cos"))
            .orderBy(F.desc("cos"), F.col(id_col))
            .limit(k))


def ivf_build_centroids(df: DataFrame, n_lists: int = 8, vec_col: str = "embedding",
                        id_col: str = "vec_id", iters: int = 2) -> list[list[float]]:
    """Tiny deterministic k-means: init from the n_lists lowest-id vectors,
    refine with `iters` Lloyd steps (each one scan + one small groupBy)."""
    cents = [r[vec_col] for r in
             df.orderBy(id_col).limit(n_lists).select(vec_col).collect()]
    for _ in range(iters):
        assigned = assign_lists(df, cents, vec_col, id_col)
        dim = len(cents[0])
        means = (assigned.groupBy("list_id")
                 .agg(*[F.avg(F.col(vec_col).getItem(i)).alias(f"c{i}") for i in range(dim)])
                 .collect())
        new = {r["list_id"]: [r[f"c{i}"] for i in range(dim)] for r in means}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return [list(map(float, c)) for c in cents]


def assign_lists(df: DataFrame, centroids: list, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine), via an
    array of per-centroid similarities — one projection, no join."""
    sims = F.array(*[cosine(F.col(vec_col), _lit_vec(c)) for c in centroids])
    return (df.withColumn("_sims", sims)
            .withColumn("list_id", (F.array_position(F.col("_sims"), F.array_max(F.col("_sims"))) - 1)
                        .cast("int"))
            .drop("_sims"))


def ivf_topk(df: DataFrame, query: Sequence[float], centroids: list, k: int = 5,
             n_probe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF search: score centroids on the driver, scan only the n_probe
    closest lists. At scale the lists are the table's partition key, so this
    is partition pruning, not a filter."""
    qn = np.asarray(query, dtype=np.float64)

    def cos_np(c):
        c = np.asarray(c, dtype=np.float64)
        return float(np.dot(qn, c) / (np.linalg.norm(qn) * np.linalg.norm(c) + 1e-12))

    probe = sorted(range(len(centroids)), key=lambda i: -cos_np(centroids[i]))[:n_probe]
    assigned = assign_lists(df, centroids, vec_col, id_col)
    return (assigned.where(F.col("list_id").isin(probe))
            .select(F.col(id_col), F.round(cosine(F.col(vec_col), _lit_vec(query)), 6).alias("cos"))
            .orderBy(F.desc("cos"), F.col(id_col))
            .limit(k))


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.99,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         n_planes: int = 6, seed: int = 7,
                         dim: Optional[int] = None, exact: bool = False) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold), a < b.

    exact=True does the full self-join (oracle-checkable, small inputs);
    otherwise pairs are restricted to shared LSH buckets (the scale path —
    the self-join becomes an equi-join on bucket).
    """
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    if exact:
        joined = a.crossJoin(b)
    else:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes, seed)
        ab = df.withColumn("_bucket", bucket_id(F.col(vec_col), planes))
        a = ab.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "_bucket")
        b = ab.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "_bucket")
        joined = a.join(b, "_bucket")
    return (joined.where(F.col("a") < F.col("b"))
            .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .where(F.col("cos") >= threshold)
            .select("a", "b", "cos").distinct())
