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


# ------------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimation)
# ------------------------------------------------------------------------------

def _cms_cell(key, d: int, width: int):
    """Cell column for hash row ``d``: first 15 hex chars of
    md5('cms<d>:' || key) as a bigint, mod ``width``. Deliberately built
    from md5 (not xxhash64) so any engine — the DuckDB correctness oracle
    included — can reproduce the exact cell addressing."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), key)), 1, 15),
               16, 10).cast("bigint")
    return h % width


def cms_build(df: DataFrame, value_col: str, depth: int = 4,
              width: int = 512, weight_col: str | None = None) -> DataFrame:
    """Build a Count-Min sketch as a tiny ``(d, w, cnt)`` cell table.

    Spark shape: each key explodes into ``depth`` cells (array literal →
    ``explode``, no UDF), then ONE hash aggregation over at most
    ``depth × width`` groups — map-side partial aggregation collapses the
    stream before the shuffle, so shuffle volume is bounded by the sketch
    size (kilobytes) regardless of input rows. The result is mergeable
    (:func:`cms_merge`) and persistable: per-day / per-shard sketches
    answer later frequency queries without rescanning raw data — same
    100-TB pattern as the HLL cubes above.

    Guarantee (standard CMS): for every key, estimate >= true count, and
    estimate <= true count + e/width × N with probability ~1-exp(-depth)
    (N = total stream weight). Pytest pins both bounds against exact
    counts; the DuckDB gate pins bit-exact estimates cross-engine.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    key = F.col(value_col).cast("string")
    wgt = (F.col(weight_col).cast("long") if weight_col
           else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("d"),
                 _cms_cell(key, d, width).alias("w"))
        for d in range(depth)])
    return (df.select(F.explode(cells).alias("c"), wgt.alias("_w"))
              .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
              .agg(F.sum("_w").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise sum."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_query(sketch: DataFrame, keys: DataFrame, value_col: str,
              depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate frequencies for ``keys``: min over the key's cells.

    The sketch side is at most depth × width rows, so the join is a
    broadcast hash join (pinned in tests) — querying never shuffles the
    (potentially huge) key table.
    """
    key = F.col(value_col).cast("string")
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("d"),
                 _cms_cell(key, d, width).alias("w"))
        for d in range(depth)])
    exploded = keys.select(F.col(value_col), F.explode(cells).alias("c"))
    return (exploded
            .join(F.broadcast(sketch),
                  (F.col("c.d") == sketch["d"]) & (F.col("c.w") == sketch["w"]),
                  "left")
            .groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


# ------------------------------------------------------------------------------
# Bloom filter (set-membership sketch; join/scan pruning at scale)
# ------------------------------------------------------------------------------

def bloom_build(df: DataFrame, value_col: str, n_bits: int = 8192,
                k: int = 5) -> DataFrame:
    """Build a Bloom filter as a DataFrame of DISTINCT set bit positions.

    Same portable md5 cell addressing as the CMS above (prefix ``bf<d>:``)
    so any engine can reproduce membership answers exactly. Build is one
    explode (k cells per key) + a distinct over at most ``n_bits`` groups —
    shuffle bounded by the filter size, not the stream. The position table
    is broadcastable: the classic 100-TB use is semi-join pruning (probe a
    huge fact table against a small authority set — e.g. contaminated-doc
    fingerprints — without shuffling the fact side).

    Guarantees: NO false negatives ever; false-positive rate ~
    ``(1 - exp(-k*n/m))^k`` — both pytest-pinned; answers are
    deterministic, so the DuckDB gate pins them bit-exactly cross-engine.
    """
    if n_bits < 1 or k < 1:
        raise ValueError("n_bits and k must be >= 1")
    key = F.col(value_col).cast("string")
    cells = F.array(*[
        F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{d}:"), key)), 1, 15),
               16, 10).cast("bigint") % n_bits
        for d in range(k)])
    return (df.select(F.explode(cells).alias("pos")).distinct())


def bloom_might_contain(bloom: DataFrame, keys: DataFrame, value_col: str,
                        n_bits: int = 8192, k: int = 5) -> DataFrame:
    """Probe keys against a Bloom position table: ``might`` is true iff all
    ``k`` positions are set. The bloom side is broadcast (≤ n_bits rows) —
    probing never shuffles the key table."""
    key = F.col(value_col).cast("string")
    cells = F.array(*[
        F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{d}:"), key)), 1, 15),
               16, 10).cast("bigint") % n_bits
        for d in range(k)])
    exploded = keys.select(F.col(value_col), F.explode(cells).alias("pos"))
    return (exploded
            .join(F.broadcast(bloom.withColumn("_set", F.lit(1))),
                  "pos", "left")
            .groupBy(value_col)
            .agg((F.sum(F.when(F.col("_set").isNull(), 1).otherwise(0)) == 0)
                 .alias("might")))
