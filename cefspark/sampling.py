"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus needs train/val/test assignment that is (a) a pure function
of the row key — reproducible across runs, engines, and cluster sizes, never
dependent on partitioning or row order (Spark's df.sample/randomSplit are
seed-stable only for a FIXED partitioning, which reshuffles under AQE or a
different input split — unusable as a durable dataset contract), and (b)
computable push-down-side as a plain integer expression (no UDF), so a
"train only" reader scans with a catalyst filter.

The hash is two rounds of multiply-mod-2^32 taking high bits — every
intermediate fits a signed 64-bit integer, so the same expression runs
exactly in Spark, Python, and ANSI SQL (the oracle mirrors it verbatim).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M1 = 2654435761  # Knuth multiplicative constants (same family as similarity)
_M2 = 69069
_MOD = 1 << 32
_BUCKETS = 1000


_HALF = 1 << 31


def split_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 1000) from an integer key: the key's low
    31 bits and high bits are folded with separate multipliers, then a second
    multiply-mod-2^32 round, high 16 bits, mod 1000.

    Overflow-proof for the FULL int64 key range (a naive `id * M1` overflows
    a signed 64-bit long — and throws under Spark's ANSI mode — for ids above
    ~3.4e9, which a web-scale corpus exceeds): max intermediate here is
    2^31 * 2654435761 + 2^33 * 40503 < 2^63. Exact in Spark, Python, and
    ANSI SQL alike."""
    key = id_col.cast("long")
    h1 = ((key % F.lit(_HALF)) * F.lit(_M1)
          + F.shiftright(key, 31) * F.lit(40503)
          + F.lit(40503 + salt)) % F.lit(_MOD)
    h2 = (h1 * F.lit(_M2)) % F.lit(_MOD)
    return F.shiftright(h2, 16) % F.lit(_BUCKETS)


def split_bucket_sql(id_expr: str, salt: int = 0) -> str:
    """The identical bucket expression in ANSI SQL (DuckDB-ready)."""
    h1 = (f"((({id_expr}) % {_HALF}) * {_M1}"
          f" + (({id_expr}) // {_HALF}) * 40503 + {40503 + salt}) % {_MOD}")
    return f"((({h1}) * {_M2}) % {_MOD} // 65536) % {_BUCKETS}"


def assign_split(df: DataFrame, weights: Sequence[float],
                 names: Sequence[str] = ("train", "val", "test"),
                 id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Add a `split` column assigning each row to one of `names` with the
    given weights (must sum to 1.0 within rounding; resolved to integer
    bucket cutoffs out of 1000). Pure projection — no shuffle, no UDF, and
    the predicate `split = 'train'` stays whole-stage-codegen and pushable.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    cuts = []
    acc = 0.0
    for w in weights:
        acc += w
        cuts.append(round(acc * _BUCKETS))
    if cuts[-1] != _BUCKETS:
        raise ValueError(f"weights must sum to 1.0 (got cutoffs {cuts})")
    b = split_bucket(F.col(id_col), salt)
    expr = None
    lo = 0
    for name, hi in zip(names, cuts):
        cond = b < F.lit(hi) if expr is None else (b >= F.lit(lo)) & (b < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("split", expr)


def sample_fraction(df: DataFrame, fraction: float,
                    id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Deterministic row sample: keep rows whose bucket falls under the
    fraction cutoff. Same key -> same decision on every run/engine/cluster."""
    cutoff = round(fraction * _BUCKETS)
    return df.where(split_bucket(F.col(id_col), salt) < F.lit(cutoff))
