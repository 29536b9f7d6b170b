"""Text analysis operators for training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each operator returns a DataFrame
with aliased columns so results can be oracle-checked 1:1 against ANSI SQL.

Scale: every operator here is a narrow projection over the scan — no shuffle,
no skew surface; cost is O(bytes scanned) and columns are pruned to `text`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword set used by the language heuristic and quality score.
STOPWORDS = ["the", "and", "of", "to", "in", "is", "a", "for", "on", "with"]
_STOPWORD_RE = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"[.!?,;:]"
# BPE-ish token pieces: word chars, or single non-space punctuation
_BPE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long").alias("n_tokens")


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via a BPE-like regex (word runs + punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), F.lit(0))).cast("long").alias("n_bpe_tokens")


def stopword_hits(col: Column) -> Column:
    return F.regexp_count(col, F.lit(_STOPWORD_RE)).cast("long").alias("n_stopwords")


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(_PUNCT_RE)).cast("long").alias("n_punct")


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword quality features + a composite score.

    quality_score in [0,1]: stopword ratio (fluency proxy) damped by
    excessive punctuation; rounded to 6dp so float comparison is stable
    across engines.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tok,
        punct_count(t),
        stopword_hits(t),
    )
    score = F.round(
        F.least(F.lit(1.0), F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)) * 4.0)
        * (F.lit(1.0) - F.least(F.lit(0.5), F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)))),
        6,
    )
    return out.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            min_hits: int = 2) -> DataFrame:
    """N-gram/stopword language heuristic: 'en' when enough English stopword
    hits, else 'unknown'. (A real model slots in behind the same contract.)"""
    hits = stopword_hits(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.when(hits >= min_hits, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints: md5 of the raw text plus a
    whitespace-normalized md5 (near-identical modulo spacing)."""
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(t).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
    )


def rolling_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        window: int = 8, hash_fn: str = "xxhash64") -> DataFrame:
    """Karp-Rabin-style rolling hash over token windows; the document
    fingerprint is the min window hash (winnowing-lite). Pure DataFrame ops:
    tokenize -> sliding windows via sequence/transform -> hash -> min.

    ``hash_fn``: 'xxhash64' (long fingerprint, fastest) or 'md5' (hex-string
    fingerprint — slower, but cross-engine reproducible, so results can be
    oracle-checked against any SQL engine with md5)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unsupported hash_fn {hash_fn!r}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    nwin = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    h = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    windows = F.transform(
        F.sequence(F.lit(0), nwin - 1),
        lambda i: h(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return df.select(F.col(id_col), F.array_min(windows).alias("fp_rolling"))
