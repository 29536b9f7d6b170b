"""Text analysis operators for training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each operator returns a DataFrame
with aliased columns so results can be oracle-checked 1:1 against ANSI SQL.

Scale: the per-document operators are narrow projections over the scan — no
shuffle, no skew surface; cost is O(bytes scanned) and columns are pruned to
`text`. The corpus-level operators (`vocab` consumers, :func:`tfidf_topk`)
aggregate and say so in their own docstrings.
"""

from __future__ import annotations

import pandas as pd
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


def dup_ngram_counts(col: Column, n: int = 3) -> tuple[Column, Column]:
    """(total, duplicated) word n-gram counts — the Gopher-style repetition
    signal ("fraction of duplicate n-grams") kept as two exact INTEGERS so
    the oracle contract needs no float tolerance (consumers divide
    themselves). Pure array functions over the whitespace tokenization —
    whole-stage codegen, no UDF, no shuffle; texts shorter than ``n``
    tokens count 0/0.

    The token array is BOUND ONCE through a lambda variable (the
    element_at(transform(array(...)), 1) scoping idiom): referencing the
    raw ``split`` expression from every per-gram element_at would
    re-tokenize the text per gram — O(tokens²) per document, measured 10×
    on the documents table."""
    def counts(t):
        grams = F.when(
            F.size(t) >= n,
            F.transform(F.sequence(F.lit(0), F.size(t) - n),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at(t, i + k + 1)
                                   for k in range(n)]))
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            F.size(grams).cast("long").alias("total"),
            (F.size(grams) - F.size(F.array_distinct(grams)))
            .cast("long").alias("dup"))

    bound = F.element_at(
        F.transform(F.array(F.struct(F.split(F.trim(col), r"\s+").alias("t"))),
                    lambda x: counts(x["t"])), 1)
    return bound["total"], bound["dup"]


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / repetition quality features + a
    composite score.

    quality_score in [0,1]: stopword ratio (fluency proxy) damped by
    excessive punctuation; rounded to 6dp so float comparison is stable
    across engines. n_3grams/n_dup_3grams carry the duplicate-trigram
    repetition signal as exact integers (round 6).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_g, n_dup = dup_ngram_counts(t, n=3)
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tok,
        punct_count(t),
        stopword_hits(t),
        n_g.alias("n_3grams"),
        n_dup.alias("n_dup_3grams"),
    )
    return out.withColumn("quality_score", composite_quality_score())


def composite_quality_score() -> Column:
    """The composite quality score as a Column over the named metric
    columns (n_chars/n_tokens/n_punct/n_stopwords) — exposed so one-pass
    sweeps (jobs/corpus_stats.py) can fold it into their own select."""
    return F.round(
        F.least(F.lit(1.0), F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)) * 4.0)
        * (F.lit(1.0) - F.least(F.lit(0.5), F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)))),
        6,
    )


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


def tfidf_topk(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms: ``(id_col, term, tfidf)``.

    Terms are ASCII ``[a-z0-9]+`` runs of the lowercased text (identical
    semantics in Spark's and DuckDB's regex engines, so the operator is
    oracle-checkable verbatim). ``tf`` = term count within the document,
    ``idf = ln((N+1)/(df+1)) + 1`` (smoothed; N = corpus size, df = number
    of documents containing the term), ``tfidf = tf * idf``.

    Selection contract: the top-k window ranks by the SCORE itself
    (``tfidf DESC``), tie-broken by the integer triple ``(tf DESC, df ASC,
    term ASC)``. Exact score ties (same tf and df) produce the identical
    double on both engines, so the integer tie-break resolves them
    deterministically; a cross-engine flip would need two DISTINCT
    real-valued scores within one ulp of each other (~2e-16 relative) —
    vanishingly unlikely and bounded by the tie-break for exact equality.

    Scale shape: tokenize+explode is map-side; ONE shuffle for the
    (doc, term) counts; the document-frequency relation aggregates off
    that result (map-side combined, O(vocab) rows) and joins back unhinted
    so AQE broadcasts it while it fits and shuffle-joins when a 100-TB
    vocabulary outgrows broadcast; corpus size N rides in as a one-row
    broadcast cross join; the final per-document top-k reuses the
    (doc, term) partitioning's key in a row_number window."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)))
        .alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n = df.select(F.count("*").alias("n_docs"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n))
    idf = F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("dfreq") + F.lit(1.0))) + F.lit(1.0)
    scored = scored.withColumn("tfidf", F.col("tf") * idf)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tf").desc(),
        F.col("dfreq").asc(), F.col("term").asc())
    return (scored
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(F.col(id_col), F.col("term"), F.col("tfidf")))


#: URL host extraction — scheme-anchored, host requires at least one dot so
#: bare words after ``https://`` never count. Kept in the java/RE2/`re`
#: common regex subset (character classes + bounded groups, no backrefs).
URL_HOST_RE = r"(?i)https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+)"
_REG_DOMAIN_RE = r"([a-z0-9-]+\.[a-z0-9-]+)$"


def extract_url_hosts(col: Column) -> Column:
    """All URL hosts in the text, lowercased, in order of appearance —
    capture stops naturally at ``/``, ``:port``, whitespace, or a trailing
    sentence dot (a lone ``.`` can never terminate the label group)."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(URL_HOST_RE), F.lit(1)),
        lambda h: F.lower(h))


def registered_domain(host: Column) -> Column:
    """Crude eTLD+1: the last two dot-labels of an already-lowercased host
    (``sub.example.com`` → ``example.com``). A public-suffix list slots in
    behind the same contract for production TLDs like ``co.uk``."""
    return F.regexp_extract(host, _REG_DOMAIN_RE, 1)


def domain_doc_counts(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-registered-domain corpus statistics — the C4/RefinedWeb-style
    link-census a web-scale pipeline feeds its domain allow/block lists:
    ``(domain, n_docs, n_urls)`` where ``n_docs`` counts distinct documents
    citing the domain and ``n_urls`` counts every occurrence.

    Scale shape: narrow regex extraction + explode map-side, then the
    standard two-phase distinct aggregation (Catalyst's count_distinct
    expansion): a first map-side-combined shuffle keyed on
    (domain, doc_id) and a second, far smaller one on domain — shuffle
    volume is O(distinct (doc, domain) pairs), never O(bytes)."""
    hosts = df.select(
        F.col(id_col),
        F.explode(extract_url_hosts(F.col(text_col))).alias("host"))
    return (hosts
            .select(id_col, registered_domain(F.col("host")).alias("domain"))
            .groupBy("domain")
            .agg(F.count_distinct(id_col).cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_urls")))


def url_docs(spark, n: int) -> DataFrame:
    """Deterministic URL fixture: doc i plants ``https://sub.example{i%7}
    .com/page{i}`` and ``http://WWW.News{i%3}.ORG:8080/x`` (case + port
    noise), every 5th doc adds ``https://extra.example.net/``, and every doc
    carries scheme-less / wrong-scheme / dotless distractors that must NOT
    match. Pure column expressions — the oracle restates the residue-class
    counts closed-form, never re-running the regex."""
    i = F.col("id")
    text = F.concat(
        F.lit("see https://sub.example"), (i % 7).cast("string"),
        F.lit(".com/page"), i.cast("string"),
        F.lit(" and http://WWW.News"), (i % 3).cast("string"),
        F.lit(".ORG:8080/x"),
        F.when(i % 5 == 0, F.lit(" https://extra.example.net/")).otherwise(F.lit("")),
        F.lit(" not-urls: ftp://skip.me example.org https://nodot mailto:a@b.com"))
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))


def chunk_windows(df: DataFrame, size: int, stride: int,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """RAG-style sliding-window document chunking: split each document's
    whitespace tokens into overlapping windows of ``size`` tokens advancing
    by ``stride`` (``stride < size`` ⇒ ``size - stride`` tokens of overlap —
    the retrieval-context / embedding-input chunker).

    Output ``(id_col, chunk_idx, start, chunk_len, chunk_text)``, one row per
    chunk. Window starts are ``0, stride, 2·stride, …``; the chunk count is
    ``1 + ceil(max(0, n_tokens - size) / stride)`` so the final (possibly
    short) tail window always lands and no start ever points past the text.
    Empty/blank documents yield ZERO chunks (the start sequence is NULL and
    explode drops the row — never a descending ``sequence(0,-1)``).

    Determinism contract: chunk membership is a pure function of the
    document text — never of partitioning or arrival order — so a resumed
    or re-sharded indexing job re-derives identical chunk ids.

    Scale shape: a narrow explode in one whole-stage-codegen stage — no
    UDF, no shuffle, no skew surface; the explode fan-out is bounded by
    n_tokens/stride per document. Tokens are materialized once behind the
    Generate node (slice/array_join reference the generated attribute, not
    a re-split)."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.length(F.trim(F.col(text_col))) == 0,
                  F.array().cast("array<string>")).otherwise(toks)
    base = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    # ceil((n-size)/stride) via clamped integer div: both engines' division
    # semantics (Spark truncates toward zero, SQL floor-div) agree once
    # greatest(0, ·) clamps the negative n<=size branch.
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        ((n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("int"))
    starts = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1))
    exploded = base.select(
        F.col(id_col), F.col("_toks"),
        F.explode(F.transform(starts, lambda i: i * stride)).alias("start"))
    return exploded.select(
        F.col(id_col),
        (F.col("start") / stride).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.least(F.lit(size), F.size(F.col("_toks")) - F.col("start"))
        .cast("long").alias("chunk_len"),
        F.array_join(F.slice(F.col("_toks"), F.col("start") + 1, size), " ")
        .alias("chunk_text"))


def compressed_size(col: Column, level: int = 6) -> Column:
    """zlib-compressed byte length of a text column (Arrow-batched pandas
    UDF — compression is genuinely non-JVM work, the one place Python
    belongs; per-row cost is O(bytes) with no shuffle)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None
                     else len(zlib.compress(t.encode("utf-8"), level)))

    return _zlen(col)


def compression_metrics(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Compression-ratio quality signal (the RefinedWeb/CCNet-family
    repetition detector): highly repetitive boilerplate compresses far
    below natural prose, so ``compression_ratio`` = raw bytes / deflated
    bytes separates template spam from real text with one scan.

    Deterministic for a fixed zlib level (the test pins exact equality
    against local ``zlib.compress``); NOT oracle-gated — DuckDB has no
    deflate, and restating deflate closed-form is the codec's job, not a
    SQL oracle's."""
    raw = F.octet_length(F.col(text_col))
    z = compressed_size(F.col(text_col), level)
    return df.select(
        F.col(id_col),
        raw.alias("byte_len"),
        z.alias("zlib_len"),
        (raw.cast("double") / z).alias("compression_ratio"))


def parse_byte_size(col: Column, mode: str = "binary") -> Column:
    """The logstash ``bytes`` filter: parse a human byte-size string
    ("512", "1 kb", "2.5 MiB", "3GB") into a byte count (double).

    ``mode`` is the filter's conversion_method: ``binary`` treats bare
    k/m/g/t/p units as 1024-based, ``metric`` as 1000-based; an explicit
    IEC ``i`` infix (KiB/MiB/...) is ALWAYS 1024-based in either mode.
    Unparsable input -> NULL (error-as-data). One codegen'd
    regexp_extract + literal-map lookup — no Python, no shuffle."""
    if mode not in ("binary", "metric"):
        raise ValueError(f"mode must be binary|metric, got {mode!r}")
    base = 1024.0 if mode == "binary" else 1000.0
    pat = r"^\s*([0-9]*\.?[0-9]+)\s*(?:([kKmMgGtTpP])([iI])?)?[bB]?\s*$"
    num = F.regexp_extract(col, pat, 1)
    unit = F.lower(F.regexp_extract(col, pat, 2))
    iec = F.regexp_extract(col, pat, 3) != ""
    exp = F.element_at(
        F.create_map(F.lit("k"), F.lit(1), F.lit("m"), F.lit(2),
                     F.lit("g"), F.lit(3), F.lit("t"), F.lit(4),
                     F.lit("p"), F.lit(5)), unit)
    mult = (F.when(unit == "", F.lit(1.0))
            .otherwise(F.pow(F.when(iec, F.lit(1024.0)).otherwise(F.lit(base)),
                             exp)))
    return F.when(num != "", num.cast("double") * mult)


def extract_numbers(col: Column) -> Column:
    """The logstash ``extractnumbers`` filter: every decimal number in
    the text as array<double>, in order of appearance (regexp_extract_all
    — JVM-side, vectorized)."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(r"[+-]?\d+(?:\.\d+)?"), 0),
        lambda s: s.cast("double"))
