"""N-gram language-model scoring — the CCNet/KenLM-style quality signal.

Large-scale training-data pipelines score candidate documents with a small
n-gram LM trained on a trusted slice (CCNet trains KenLM on Wikipedia and
keeps the low-perplexity tail).  This module is that signal re-expressed
Spark-first:

- :func:`train_bigram_lm` — ONE pass over the training slice: explode
  bigrams, hash-aggregate counts (single shuffle keyed on the pair).  The
  context (unigram-prefix) counts are DERIVED from the pair counts by a
  second tiny aggregation over the already-small LM relation — the corpus
  is never re-scanned.
- :func:`score_docs` — explode the held-out documents' bigrams, equi-join
  the LM relations, aggregate per document.  The joins are plain shuffle
  hash joins on (w1, w2) / (w1); pass ``broadcast_lm=True`` when the LM
  fits the broadcast threshold (typical: a trusted-slice LM is MBs while
  the scored corpus is TBs — broadcast turns scoring into a map-only pass).

Scale: LM size is O(unique bigrams of the trusted slice), independent of
scored-corpus size.  Scoring cost is one explode + (broadcast) join + one
doc_id-keyed aggregation — no all-pairs surface anywhere.

The integer columns (n_bigrams / n_oov / sum_c2 / sum_c1) are exact and
cross-engine reproducible (gate-checked against DuckDB); the floating
add-k perplexity is pinned in pytest against a numpy reference with
tolerance (float ln sums are not bit-portable across engines by design —
same methodology as the int8-quantization cosine op).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_bigrams", "train_bigram_lm", "score_docs", "with_perplexity"]


def doc_bigrams(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Explode each document into its (w1, w2) whitespace-token bigrams.

    Documents with fewer than two tokens produce no rows (a 1-token text
    has no bigram; the guard also keeps ``sequence`` ascending).  Narrow
    projection + explode — no shuffle.
    """
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    ).where(F.size("_t") >= 2)
    return toks.select(
        F.col(id_col),
        F.expr("explode(transform(sequence(1, size(_t) - 1),"
               " j -> struct(_t[j-1] AS w1, _t[j] AS w2)))").alias("_b"),
    ).select(id_col, "_b.w1", "_b.w2")


def train_bigram_lm(train: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Count bigrams over the training slice.

    Returns ``(pairs, ctx)``: ``pairs`` = (w1, w2, c2) pair counts (one
    hash-agg shuffle over the exploded bigrams), ``ctx`` = (w1, c1) prefix
    context counts derived from ``pairs`` (tiny re-aggregation of the LM
    relation itself — c1(w) == count of training bigrams starting with w).
    """
    pairs = (doc_bigrams(train, text_col, id_col)
             .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    ctx = pairs.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return pairs, ctx


def score_docs(held: DataFrame, pairs: DataFrame, ctx: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               broadcast_lm: bool = False) -> DataFrame:
    """Per-document LM-hit statistics for the held-out slice.

    Output: one row per document with >= 1 bigram —
    ``n_bigrams`` (exploded pair count), ``n_oov`` (pairs unseen in
    training), ``sum_c2`` (sum of training pair counts, 0 for OOV pairs),
    ``sum_c1`` (sum of training prefix-context counts; 0 when even the
    prefix token is unseen).  All exact integers — the floating perplexity
    layer lives in :func:`with_perplexity` so the gate stays bit-exact.
    """
    if broadcast_lm:
        pairs, ctx = F.broadcast(pairs), F.broadcast(ctx)
    j = (doc_bigrams(held, text_col, id_col)
         .join(pairs, ["w1", "w2"], "left")
         .join(ctx, ["w1"], "left"))
    return j.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0))).alias("sum_c2"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).alias("sum_c1"),
    )


def with_perplexity(held: DataFrame, pairs: DataFrame, ctx: DataFrame,
                    vocab_size: int, k: float = 1.0,
                    text_col: str = "text", id_col: str = "doc_id",
                    broadcast_lm: bool = False) -> DataFrame:
    """Add-k-smoothed bigram perplexity per held-out document.

    p(w2|w1) = (c2 + k) / (c1 + k * vocab_size); perplexity =
    exp(-mean ln p).  Floating ln/exp — differentially pinned in pytest
    (numpy reference, rtol), deliberately NOT part of the hash gate.
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if broadcast_lm:
        pairs, ctx = F.broadcast(pairs), F.broadcast(ctx)
    j = (doc_bigrams(held, text_col, id_col)
         .join(pairs, ["w1", "w2"], "left")
         .join(ctx, ["w1"], "left"))
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k) * vocab_size)))
    return j.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(logp).alias("avg_logprob"),
        F.exp(-F.avg(logp)).alias("perplexity"),
    )


def reference_perplexity(texts: dict, train_texts: dict, vocab_size: int,
                         k: float = 1.0) -> dict:
    """Pure-Python reference for pytest differential checks (driver-side,
    test fixtures only — never data-scale)."""
    from collections import Counter

    def bigrams(s):
        t = s.strip().split()
        return list(zip(t[:-1], t[1:])) if len(t) >= 2 else []

    c2 = Counter(b for s in train_texts.values() for b in bigrams(s))
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    out = {}
    for did, s in texts.items():
        bs = bigrams(s)
        if not bs:
            continue
        lp = [math.log((c2.get(b, 0) + k) / (c1.get(b[0], 0) + k * vocab_size))
              for b in bs]
        m = sum(lp) / len(lp)
        out[did] = {"n_bigrams": len(bs), "avg_logprob": m,
                    "perplexity": math.exp(-m)}
    return out
