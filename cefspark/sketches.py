"""Mergeable cardinality sketches: HLL distinct-count cubes.

The 100-TB pattern this module packages: computing exact COUNT(DISTINCT)
per dimension re-shuffles the raw data for every new rollup. Instead,
aggregate each group (or partition, or day) ONCE into a fixed-size
Datasketches HLL binary (``hll_sketch_agg``), persist those sketches, and
answer any coarser rollup later by merging sketches (``hll_union_agg``) —
kilobytes moved instead of terabytes rescanned. Merging is lossless at the
register level, but a single-stream sketch also carries the HIP
(historical inverse probability) estimator, which a union cannot preserve
— so a rollup-from-sketches estimate can differ slightly from sketching
the raw rows globally; both stay inside the HLL error bound (pytest pins
the union estimate within 1% of the direct global sketch and both within
error of the exact count).

Estimates carry the usual HLL error (~1.04/sqrt(2^lg_k) relative standard
error — ~1.6% at the default lg_k=12, fixed 2^12-register size). Nothing
here is oracle-gated: approximation has no cross-engine bit contract;
accuracy and mergeability are pytest-pinned against exact distinct counts
instead.

No counterpart in the reference codec — this belongs to the
training-data-pipeline extensions (corpus statistics: distinct users,
vocabularies, URL/host cardinalities per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def approx_distinct(df: DataFrame, value_col: str, rsd: float = 0.02) -> int:
    """One-number approximate distinct count (Spark's native HLL++;
    ``rsd`` = target relative standard deviation). Driver-side scalar."""
    return df.agg(
        F.approx_count_distinct(value_col, rsd).alias("n")).collect()[0]["n"]


def hll_sketch_by(df: DataFrame, group_col: str, value_col: str,
                  lg_k: int = DEFAULT_LGK) -> DataFrame:
    """Per-group HLL sketch binaries: ``(group_col, sketch)``. One shuffle;
    sketch state is fixed-size (2^lg_k registers) and merges map-side.
    Persist this relation to answer later rollups without rescanning."""
    return (df.groupBy(group_col)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")))


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Per-group distinct estimates from a sketch relation: every
    non-``sketch`` column is kept as a group key (so multi-dimension cubes
    like ``(event_type, day, sketch)`` work), plus ``n_distinct_est``.
    Narrow projection — no data rescan."""
    if "sketch" not in sketches.columns:
        raise ValueError("expected a 'sketch' column (from hll_sketch_by)")
    keys = [c for c in sketches.columns if c != "sketch"]
    return sketches.select(
        *keys,
        F.hll_sketch_estimate("sketch").cast("long").alias("n_distinct_est"))


def hll_rollup(sketches: DataFrame) -> int:
    """Merge every group's sketch into one and estimate the GLOBAL distinct
    count — the cross-group rollup answered from kilobytes of sketch state.
    Register-lossless vs a global sketch at the same lg_k; the estimate can
    deviate slightly (union drops the HIP estimator, see module docs)."""
    row = sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(True))).cast("long")
        .alias("n")).collect()[0]
    # an empty sketch relation unions to NULL; 0 distinct is the honest
    # answer (and matches approx_distinct on an empty frame)
    return row["n"] if row["n"] is not None else 0


def heavy_hitters(df: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """Misra-Gries heavy hitters: the frequent items of ``value_col`` from
    one pass in O(k) memory per partition, with a CERTIFIED error bound —
    the bounded-memory sibling of exact groupBy-count for columns whose
    cardinality (hot URLs, user ids, vendor strings at 100 TB) makes the
    exact shuffle the bottleneck.

    Returns ``(item, est_count, err_bound)`` where every reported item
    satisfies ``est_count <= true_count <= est_count + err_bound`` and —
    the presence guarantee — ANY item with ``true_count > err_bound``
    is guaranteed to be reported. NULLs are ignored.

    Shape: each partition folds its Arrow batches into a capacity-``k``
    summary — carried state is O(k) between batches (transiently
    O(k + batch cardinality) while a batch's value_counts merges in; when
    the merged dict overflows,
    the (k+1)-th largest count m is subtracted from every counter and
    zeros dropped — the classic mergeable-summaries trim, adding m to that
    partition's certified undercount). Partitions then emit <= k candidate
    rows + one error row, and a single tiny shuffle sums candidates and
    errors. Driver/exchange traffic is O(k x partitions), never O(rows).

    Determinism caveat: ``est_count`` (not the guarantee) depends on the
    partitioning and arrival order, like any MG sketch — consumers needing
    run-identical numbers use the exact groupBy path; this is the audited
    approximation for when that path can't fit."""
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    def summarize(batches):
        counts: dict = {}
        dec = 0
        for pdf in batches:
            for item, c in pdf[value_col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > k:
                m = sorted(counts.values(), reverse=True)[k]
                counts = {i: c - m for i, c in counts.items() if c > m}
                dec += m
        yield pd.DataFrame({
            "item": list(counts.keys()) + [None],
            "cnt": list(counts.values()) + [0],
            "dec": [0] * len(counts) + [dec]})

    summaries = df.select(
        F.col(value_col).cast("string").alias(value_col)) \
        .where(F.col(value_col).isNotNull()) \
        .mapInPandas(summarize, "item string, cnt long, dec long")
    err = summaries.agg(F.sum("dec").alias("err_bound"))
    return (summaries.where(F.col("item").isNotNull())
            .groupBy("item").agg(F.sum("cnt").alias("est_count"))
            .crossJoin(F.broadcast(err))
            .select("item", "est_count", "err_bound"))
