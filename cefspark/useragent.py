"""User-agent classification — the logstash ``useragent`` filter family
re-expressed as a pure JVM column chain (no UDF, no shuffle: a narrow
projection that composes with any enrich/route stage).

Reference scope note: logstash's filter wraps the uap-core regex database
(~1000 patterns); this module implements the same ORDERED first-match
architecture over the dozen families that cover the overwhelming majority
of real traffic, with the browser list deliberately ordered
specific-before-generic (Edge/Opera carry ``Chrome/`` tokens, Chrome
carries ``Safari/`` — matching generic-first would misclassify, the
classic uap ordering constraint). Swapping in a fuller pattern set is a
data change, not a code change.

Like grok/dissect/kv, patterns stay in the java-regex-safe subset
(character classes, bounded groups, no backrefs); the driver gate's oracle
restates expected families closed-form from the fixture rather than
re-running the regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (family, detect/extract pattern with the major version as
#: group 1). First match wins.
BROWSERS: list[tuple[str, str]] = [
    ("Edge", r"Edg(?:e|A|iOS)?/(\d+)"),
    ("Opera", r"OPR/(\d+)"),
    ("Chrome", r"Chrome/(\d+)"),
    ("Firefox", r"Firefox/(\d+)"),
    ("Safari", r"Version/(\d+)[\d.]* Safari/"),
    ("IE", r"MSIE (\d+)"),
    ("Bot", r"(?i)(bot|crawler|spider|curl|wget)"),
]

#: ordered (os family, detect pattern) — iOS before macOS (iPad UAs carry
#: "like Mac OS X"), Android before Linux (Android UAs carry "Linux").
OSES: list[tuple[str, str]] = [
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone|iPad|iPod"),
    ("macOS", r"Mac OS X"),
    ("Android", r"Android"),
    ("Linux", r"Linux"),
]


def ua_family(col: Column) -> Column:
    """Browser family by ordered first match; 'Other' when nothing hits."""
    out = F.lit("Other")
    for fam, pat in reversed(BROWSERS):
        out = F.when(col.rlike(pat), F.lit(fam)).otherwise(out)
    return out


def ua_major(col: Column) -> Column:
    """Major version of the FIRST-matching family ('' for versionless
    matches like bots, and for 'Other')."""
    out = F.lit("")
    for fam, pat in reversed(BROWSERS):
        if fam == "Bot":
            out = F.when(col.rlike(pat), F.lit("")).otherwise(out)
        else:
            out = F.when(col.rlike(pat),
                         F.regexp_extract(col, pat, 1)).otherwise(out)
    return out


def ua_os(col: Column) -> Column:
    """OS family by ordered first match; 'Other' when nothing hits."""
    out = F.lit("Other")
    for fam, pat in reversed(OSES):
        out = F.when(col.rlike(pat), F.lit(fam)).otherwise(out)
    return out


def parse_user_agent(df: DataFrame, ua_col: str = "user_agent",
                     prefix: str = "ua_") -> DataFrame:
    """Add ``<prefix>family``, ``<prefix>major``, ``<prefix>os`` columns.
    NULL input yields NULL in all three (distinguishable from a real
    'Other' classification of unrecognized text)."""
    c = F.col(ua_col)
    guard = lambda e: F.when(c.isNull(), F.lit(None).cast("string")).otherwise(e)  # noqa: E731
    return (df.withColumn(f"{prefix}family", guard(ua_family(c)))
            .withColumn(f"{prefix}major", guard(ua_major(c)))
            .withColumn(f"{prefix}os", guard(ua_os(c))))


def ua_fixture(i: Column) -> Column:
    """Deterministic UA string for event ``i`` (residues mod 6) — used by
    the driver gate; the oracle restates the expected classes closed-form.
    Covers the ordering traps: the Edge and Opera strings BOTH carry
    Chrome+Safari tokens, Chrome carries Safari, iPad carries Mac OS X."""
    return (
        F.when(i % 6 == 0, F.concat(
            F.lit("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 "
                  "Chrome/1"), (i % 9).cast("string"),
            F.lit(".0 Safari/537.36 Edg/1"), (i % 9).cast("string"),
            F.lit(".0")))
        .when(i % 6 == 1, F.concat(
            F.lit("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
                  "Chrome/12"), (i % 7).cast("string"),
            F.lit(".0.0.0 Safari/537.36")))
        .when(i % 6 == 2, F.concat(
            F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                  "Gecko/20100101 Firefox/1"), (i % 8).cast("string"),
            F.lit(".0")))
        .when(i % 6 == 3, F.concat(
            F.lit("Mozilla/5.0 (iPad; CPU OS 17_4 like Mac OS X) "
                  "AppleWebKit/605.1.15 Version/1"), (i % 5).cast("string"),
            F.lit(".4 Safari/604.1")))
        .when(i % 6 == 4, F.concat(
            F.lit("Mozilla/5.0 (Linux; Android 14) AppleWebKit/537.36 "
                  "Chrome/12"), (i % 7).cast("string"),
            F.lit(".0 Mobile Safari/537.36 OPR/8"), (i % 5).cast("string"),
            F.lit(".0")))
        .otherwise(F.lit("curl/8.5.0")))
