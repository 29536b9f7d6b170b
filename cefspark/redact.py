"""PII redaction for log/transcript text: detect + mask emails, IPv4
addresses, credit-card numbers, and E.164-ish phone numbers.

A log pipeline that fans transcripts out to per-sink tables (the north-star
shape) routinely has to scrub PII before the sinks become training data —
this is the redaction stage, expressed entirely as JVM-side
``regexp_replace`` / ``regexp_count`` column chains (whole-stage codegen, no
Python in the hot path, no shuffle: a narrow projection that composes with
any downstream write).

Pattern-ordering contract: classes apply in PII_CLASSES order (email before
card before IPv4 before phone) and each replacement token contains no
character that a later pattern could re-match (tokens are ``<UPPER>`` with
no digits/dots/@), so the chain is confluent — rewriting is
order-insensitive for disjoint matches and deterministic for overlaps.

Scale: O(bytes) per row, trivially partition-parallel; the regexes are
backtracking-safe (character classes + bounded quantifiers only — no nested
unbounded groups), so a hostile 10 MB line costs linear time, the same
property the CEF tokenizer's possessive grammar guarantees (parser.py).

Reference scope note: the reference codec (cef.rb) has no redaction stage —
this operator belongs to the training-data-pipeline family the engine adds
on top (SURVEY.md §2 extras), like dedup/langid/quality.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringized hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (class_name, pattern, replacement). Patterns are deliberately in
#: the regex subset with identical semantics in java.util.regex (Spark) and
#: RE2 (DuckDB/Go) — character classes, bounded repetition, \b anchors —
#: so oracles can restate them verbatim if they choose to.
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # 16-digit cards in 4-4-4-4 groups (uniform separator, expanded per
    # separator so no backreference is needed — RE2 has none) or unbroken;
    # must run before IPv4 so dotted-quad fragments inside a card never
    # match first (cards don't contain dots, but ordering is pinned anyway)
    ("card",
     r"\b\d{4}-\d{4}-\d{4}-\d{4}\b|\b\d{4} \d{4} \d{4} \d{4}\b|\b\d{16}\b",
     "<CARD>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "<IP>"),
    # +country-code phones: +1-555-0100 style with -, space or . separators
    ("phone",
     r"\+\d{1,3}[-. ]\d{3}[-. ]\d{3,4}(?:[-. ]\d{1,4})?\b",
     "<PHONE>"),
]


def redact_text(col: Column) -> Column:
    """The redacted text: every PII class replaced by its token, applied in
    PII_CLASSES order in one JVM expression chain."""
    out = col
    for _, pattern, token in PII_CLASSES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(col: Column, class_name: str) -> Column:
    """Match count for one PII class, evaluated INDEPENDENTLY on the
    pre-redaction text. This is the audit contract: counts answer "how much
    of each class did the original contain", not "how many replacements did
    the sequential chain perform" — when one class's match lies inside a
    span an earlier class already consumed (e.g. a dotted-quad inside a
    masked URL), the chain replaces fewer times than this counts. Counting
    against the progressively-redacted text would make ``n_<class>`` depend
    on chain order, which is the less useful audit number (ADVICE r5:
    documented divergence, deliberate)."""
    for name, pattern, _ in PII_CLASSES:
        if name == class_name:
            return F.regexp_count(col, F.lit(pattern))
    raise ValueError(f"unknown PII class {class_name!r}")


def pii_redact(df: DataFrame, text_col: str = "text",
               keep_counts: bool = True) -> DataFrame:
    """Add ``<text_col>_redacted`` plus per-class ``n_<class>`` match counts
    (``keep_counts=False`` skips the counting passes when only the scrubbed
    text is needed — one regex pass per class instead of two)."""
    out = df.withColumn(f"{text_col}_redacted", redact_text(F.col(text_col)))
    if keep_counts:
        for name, _, _ in PII_CLASSES:
            out = out.withColumn(f"n_{name}",
                                 pii_count(F.col(text_col), name).cast("int"))
    return out


def pii_docs(spark, n: int) -> DataFrame:
    """Deterministic PII fixture: doc i's text plants one email, one spaced
    card, one IPv4, and one phone derived from i, interleaved with near-miss
    distractors no class may match (version strings that look like dotted
    numbers, an @ with no TLD, a 15-digit run). Built as pure column
    expressions — the closed form is restatable in SQL for the oracle."""
    i = F.col("id")
    text = F.concat(
        F.lit("contact user"), i, F.lit("@example.com or v1.2.3 build "),
        F.lit("card 4111 1111 1111 "), F.lpad((1000 + i % 9000).cast("string"), 4, "0"),
        F.lit(" host 10."), (i % 200).cast("string"), F.lit(".0."),
        (i % 250).cast("string"),
        F.lit(" call +1-555-01"), F.lpad((i % 100).cast("string"), 2, "0"),
        F.lit(" not-pii: a@b 123456789012345 ver 10.20"))
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))


def pseudonymize(df: DataFrame, cols: list[str], salt: str,
                 length: int = 16, suffix: str = "_pseudo") -> DataFrame:
    """Keyed pseudonymization of identifier columns: each value is replaced
    by the first ``length`` hex chars of ``sha256(salt || value)`` in a new
    ``<col><suffix>`` column — the privacy-preserving transform that keeps
    REFERENTIAL INTEGRITY (the same user id always maps to the same token,
    so joins/sessionization/dedup still work on the pseudonymized corpus)
    while the original ids never leave the cluster. NULL stays NULL.

    The salt is the secret: without it the mapping is not practically
    invertible for high-entropy ids, and rotating it produces an unlinkable
    new pseudonym universe (the GDPR re-keying story). Low-entropy id
    spaces (sequential integers) remain enumerable by anyone HOLDING the
    salt — pseudonymization is reversible-by-design for the key holder,
    unlike :func:`redact_text` masking.

    Pure JVM projection (sha2 + substring per column): no UDF, no shuffle;
    16 hex chars = 64 bits — collision odds ~2e-8 at 10^6 distinct ids,
    raise ``length`` toward 64 for 10^12-id corpora."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= length <= 64:
        raise ValueError("length must be in [1, 64]")
    out = df
    for c in cols:
        tok = F.substring(
            F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256),
            1, length)
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col(c).isNull(), F.lit(None).cast("string"))
            .otherwise(tok))
    return out


def fingerprint_fields(df: DataFrame, sources: list[str],
                       method: str = "SHA256", target: str = "fingerprint",
                       concatenate_sources: bool = True,
                       key: str | None = None) -> DataFrame:
    """Logstash ``fingerprint`` filter parity (event identity hashing).

    Reference semantics (logstash-filter-fingerprint, public plugin docs):
    with ``concatenate_sources => true`` the hashed string is
    ``|field1|value1|field2|value2|…|`` in source order; without it each
    source is hashed on its own and the single ``target`` keeps the LAST
    source's fingerprint. NULL source values render as the empty string
    (logstash's ``to_string(nil)``). With ``key`` set, the digest becomes
    an HMAC keyed on it.

    Methods: ``MD5`` / ``SHA256`` / ``SHA384`` / ``SHA512`` (JVM built-ins,
    whole-stage codegen, cross-engine checkable — the driver gate
    recomputes MD5/SHA256 in DuckDB), ``MURMUR3`` (Spark's own hash —
    engine-specific by nature, pytest-pinned only), and ``HMAC-SHA256``
    when ``key`` is given (Arrow-batched pandas UDF over stdlib ``hmac`` —
    the one non-codegen path, still a narrow no-shuffle projection).

    Scale: a narrow projection over the scan — no shuffle, no UDF except
    the explicit HMAC mode; pair with :func:`cefspark.dedup.exact_dedup`
    for fingerprint-keyed exact dedup at corpus scale.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    method = method.upper()
    if key is not None and method != "HMAC-SHA256":
        raise ValueError("key is only supported with method='HMAC-SHA256'")

    def _s(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit(""))

    if concatenate_sources:
        parts = []
        for c in sources:
            parts += [F.lit("|" + c + "|"), _s(c)]
        data = F.concat(*parts, F.lit("|"))
    else:
        data = _s(sources[-1])

    if method == "MD5":
        fp = F.md5(data)
    elif method in ("SHA256", "SHA384", "SHA512"):
        fp = F.sha2(data, int(method[3:]))
    elif method == "MURMUR3":
        fp = F.hash(data).cast("string")
    elif method == "HMAC-SHA256":
        if key is None:
            raise ValueError("HMAC-SHA256 requires key")
        import hmac as _hmac
        from pyspark.sql.functions import pandas_udf

        kb = key.encode("utf-8")

        @pandas_udf("string")
        def _hmac_hex(s: pd.Series) -> pd.Series:
            return s.map(lambda v: _hmac.new(
                kb, str(v).encode("utf-8"), "sha256").hexdigest())

        fp = _hmac_hex(data)
    else:
        raise ValueError(f"unsupported fingerprint method: {method}")
    return df.withColumn(target, fp)
