"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus needs train/val/test assignment that is (a) a pure function
of the row key — reproducible across runs, engines, and cluster sizes, never
dependent on partitioning or row order (Spark's df.sample/randomSplit are
seed-stable only for a FIXED partitioning, which reshuffles under AQE or a
different input split — unusable as a durable dataset contract), and (b)
computable push-down-side as a plain integer expression (no UDF), so a
"train only" reader scans with a catalyst filter.

The hash folds the key's low/high bits with two multiply-mod-2^32 rounds and
takes high bits — every intermediate fits a signed 64-bit integer, so the
same expression runs exactly in Spark, Python, and ANSI SQL.

Keys MUST be non-negative: engines disagree on negative integer division
(Spark shiftright floors, DuckDB `//` truncates toward zero, Python `//`
floors), so a negative key cannot have an engine-exact bucket. The Spark
expression fails loudly (assert_true) rather than assigning silently-wrong
splits.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the same Knuth multiplicative-mix family as the engine-exact LSH contract
from .similarity import _MIX_A as _M1
from .similarity import _MIX_B as _FOLD
from .similarity import _MOD

_M2 = 69069
_BUCKETS = 1000
_HALF = 1 << 31


def split_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 1000) from a NON-NEGATIVE integer key:
    the key's low 31 bits and high bits are folded with separate multipliers,
    then a second multiply-mod-2^32 round, high 16 bits, mod 1000.

    Overflow-proof for the full non-negative int64 range (a naive `id * M1`
    overflows a signed long — and throws under Spark's ANSI mode — for ids
    above ~3.4e9, which a web-scale corpus exceeds): max intermediate is
    2^31 * 2654435761 + 2^32 * 40503 < 2^63. A negative key raises at
    runtime (see module docstring)."""
    key = id_col.cast("long")
    guard = F.assert_true(key >= F.lit(0),
                          F.lit("split_bucket requires non-negative keys"))
    h1 = ((key % F.lit(_HALF)) * F.lit(_M1)
          + F.shiftright(key, 31) * F.lit(_FOLD)
          + F.lit(_FOLD + salt)) % F.lit(_MOD)
    h2 = (h1 * F.lit(_M2)) % F.lit(_MOD)
    bucket = F.shiftright(h2, 16) % F.lit(_BUCKETS)
    return F.when(guard.isNull(), bucket)


def split_bucket_sql(id_expr: str, salt: int = 0) -> str:
    """The identical bucket expression in ANSI SQL (DuckDB-ready); callers
    guarantee the key expression is non-negative."""
    h1 = (f"((({id_expr}) % {_HALF}) * {_M1}"
          f" + (({id_expr}) // {_HALF}) * {_FOLD} + {_FOLD + salt}) % {_MOD}")
    return f"((({h1}) * {_M2}) % {_MOD} // 65536) % {_BUCKETS}"


def assign_split(df: DataFrame, weights: Sequence[float],
                 names: Sequence[str] = ("train", "val", "test"),
                 id_col: str = "doc_id", salt: int = 0,
                 hash_string_ids: bool = False) -> DataFrame:
    """Add a `split` column assigning each row to one of `names` with the
    given weights (must sum to 1.0 within rounding; resolved to integer
    bucket cutoffs out of 1000). Pure projection — no shuffle, no UDF, and
    the predicate `split = 'train'` stays whole-stage-codegen and pushable.

    ``hash_string_ids=True`` first folds a STRING key into a non-negative
    long via ``pmod(xxhash64(id), 2^61)`` (conversation ids are strings in
    the transcript contract). Still deterministic and codegen'd, but NOT
    covered by the DuckDB-parity contract of the integer path — the
    engine-exactness gate (`sample_split`) pins integer keys only.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    cuts = []
    acc = 0.0
    for w in weights:
        if w <= 0:
            raise ValueError(f"weights must be positive (got {w})")
        acc += w
        hi = round(acc * _BUCKETS)
        if hi <= (cuts[-1] if cuts else 0):
            raise ValueError(
                f"weight {w} resolves to an empty bucket range at {_BUCKETS} "
                f"buckets (cutoffs so far {cuts + [hi]}); use larger weights")
        cuts.append(hi)
    if cuts[-1] != _BUCKETS:
        raise ValueError(f"weights must sum to 1.0 (got cutoffs {cuts})")
    key = (F.pmod(F.xxhash64(F.col(id_col)), F.lit(2 ** 61))
           if hash_string_ids else F.col(id_col))
    b = split_bucket(key, salt)
    # when-chains are first-match-wins, so `b < hi` alone suffices per branch
    expr = None
    for name, hi in zip(names, cuts):
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def sample_fraction(df: DataFrame, fraction: float,
                    id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Deterministic row sample: keep rows whose bucket falls under the
    fraction cutoff. Same key -> same decision on every run/engine/cluster."""
    cutoff = round(fraction * _BUCKETS)
    return df.where(split_bucket(F.col(id_col), salt) < F.lit(cutoff))


def stratified_sample(df: DataFrame, fractions: dict,
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling (the engine-exact counterpart of
    df.sampleBy): each stratum keeps its own fraction, decided by the same
    integer bucket hash of the row key, so re-balancing a skewed corpus
    (e.g. downsample the dominant language) is reproducible across
    runs/engines/cluster sizes. Strata absent from ``fractions`` are
    dropped, matching sampleBy's contract. Pure projection: the predicate
    is a when-free boolean over (stratum, bucket) — pushable, no UDF, no
    shuffle."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    b = split_bucket(F.col(id_col), salt)
    expr = None
    for key, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {key!r} must be in [0, 1]")
        cond = (F.col(strata_col) == F.lit(key)) & (b < F.lit(round(frac * _BUCKETS)))
        expr = cond if expr is None else expr | cond
    return df.where(expr)


_MAX_EPOCHS = 100


def mixture(df: DataFrame, weights: Dict[str, float],
            strata_col: str = "lang", id_col: str = "doc_id",
            salt: int = 0) -> DataFrame:
    """Deterministic corpus-mixture resampling: replicate each row
    ``weights[stratum]`` times (fractional weights resolved per row by the
    engine-exact bucket hash), adding an ``epoch`` column in
    ``[0, repeats)``. This is the standard training-data mixing step —
    "CommonCrawl 1.1 epochs, Wikipedia 3 epochs, downsample X to 0.4" —
    expressed as a pure function of the row key:

    - weight 2.3 → every row appears twice, and the deterministic 30% of
      rows whose bucket falls under the cutoff appear a third time;
    - weight 0.4 → the deterministic 40% appear once, the rest vanish;
    - a stratum absent from ``weights`` is dropped (weight 0).

    Reproducible across runs/engines/cluster sizes — re-running the mix for
    a resumed or re-sharded training job yields the identical multiset,
    unlike `df.sample(withReplacement=True)` whose output depends on the
    partitioning.

    Scale: a narrow projection + ``explode`` — no UDF, no shuffle, and rows
    with zero repeats are dropped inside the same codegen stage (the
    explode's input is NULL there, never a descending ``sequence(0,-1)``).
    Output size is exactly ``sum_s weight_s * |s|`` rows; the ``epoch``
    column lets the downstream shard/pack step interleave epochs instead of
    replaying the corpus back-to-back.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    b = split_bucket(F.col(id_col), salt)
    base = None
    cut = None
    for key, w in weights.items():
        if not 0.0 <= w <= _MAX_EPOCHS:
            raise ValueError(
                f"weight for {key!r} must be in [0, {_MAX_EPOCHS}] (got {w})")
        ib = int(math.floor(w))
        fc = round((w - ib) * _BUCKETS)
        if ib == 0 and fc == 0:
            continue  # weight 0: stratum dropped, same as absent
        cond = F.col(strata_col) == F.lit(key)
        base = F.when(cond, ib) if base is None else base.when(cond, ib)
        cut = F.when(cond, fc) if cut is None else cut.when(cond, fc)
    if base is None:
        raise ValueError("all weights are zero — empty mixture")
    reps = (base.otherwise(F.lit(0))
            + F.when(b < cut.otherwise(F.lit(0)), 1).otherwise(0))
    epochs = F.when(reps > 0, F.sequence(F.lit(0), reps - 1))
    return df.withColumn("epoch", F.explode(epochs))


def mixture_weights(token_counts: Dict[str, float], alpha: float = 0.7,
                    target_epochs_max: float = 4.0) -> Dict[str, float]:
    """Derive per-stratum epoch weights from corpus sizes with temperature
    sampling (Gopher / multilingual-LM style): sampling probability
    ``p_s ∝ n_s^alpha`` flattens the size distribution (alpha=1 natural,
    alpha→0 uniform), then weights are scaled so the most-upsampled stratum
    runs ``target_epochs_max`` epochs — small corpora repeat, the dominant
    corpus is (usually) downsampled. Driver-side arithmetic over the tiny
    per-stratum size dict; feed the result to :func:`mixture`."""
    if not token_counts or any(n <= 0 for n in token_counts.values()):
        raise ValueError("token_counts must be non-empty and positive")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1] (got {alpha})")
    total = sum(token_counts.values())
    probs = {s: (n / total) ** alpha for s, n in token_counts.items()}
    z = sum(probs.values())
    # epochs_s ∝ p_s / share_s; normalize so max(epochs) == target_epochs_max
    raw = {s: (probs[s] / z) / (token_counts[s] / total)
           for s in token_counts}
    scale = target_epochs_max / max(raw.values())
    return {s: min(r * scale, _MAX_EPOCHS) for s, r in raw.items()}
