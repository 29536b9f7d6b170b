"""Generic key=value extraction (the logstash `kv` filter's contract) as
pure Catalyst expressions.

Two surfaces:

- :func:`kv_extract` — pull a KNOWN list of keys into top-level columns,
  one `regexp_extract` per key (first occurrence wins, the kv filter's
  default duplicate handling). Stays entirely inside whole-stage codegen;
  the regex per key is `(?:^|<fs>)<key><vs>value` with the value class
  derived from the field separator, so an oracle can restate the expected
  value closed-form without running the regex.
- :func:`kv_map` — the whole pair set as a `map<string,string>` column via
  the built-in `str_to_map`. CAVEAT, documented because it is a cluster
  config hazard: Spark's map construction honors
  ``spark.sql.mapKeyDedupPolicy`` (default EXCEPTION — a line with a
  repeated key FAILS the job; LAST_WIN silently keeps the last). Untrusted
  log data repeats keys, so the scale-safe default is :func:`kv_extract`;
  use kv_map only where the producer guarantees unique keys or the session
  opts into LAST_WIN.

This is deliberately separate from the CEF extension tokenizer
(parser.py): CEF's grammar has escaped separators and a keyless tail and
must match cef.rb byte-for-byte; kv is the configurable-separator generic
the pipeline offers for everything that is not CEF.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grok import GROK_TYPES


def _value_body(field_split: str) -> str:
    # value runs to the next field separator (or end of line); a 1-char
    # separator becomes a negated class, longer separators use a lazy run
    # bounded by the separator-or-eol — both RE2/java/`re`-portable
    if len(field_split) == 1:
        return f"[^{re.escape(field_split)}]*"
    return f"(?:(?!{re.escape(field_split)}).)*"


def kv_extract(df: DataFrame, keys: list[str] | dict[str, str | None],
               text_col: str = "text", field_split: str = " ",
               value_split: str = "=", prefix: str = "") -> DataFrame:
    """Add one string column per requested key: the FIRST `key<vs>value`
    occurrence's value, NULL when the key is absent. ``keys`` may be a
    dict mapping key -> grok-style cast suffix (int/long/float/double, or
    None to stay string). ``prefix`` namespaces the output columns
    (logstash kv's ``prefix`` option) — use it to avoid collisions.

    Multi-char ``field_split`` uses a bounded lazy run, which requires
    lookahead — that variant is java-only (fine: it never reaches an
    oracle; gates use the 1-char class form)."""
    if isinstance(keys, dict):
        typed = dict(keys)
    else:
        typed = {k: None for k in keys}
    if not typed:
        raise ValueError("kv_extract needs at least one key")
    for k, cast in typed.items():
        if cast is not None and cast not in GROK_TYPES:
            raise ValueError(f"unknown kv cast {cast!r} for key {k!r}; "
                             f"supported: {sorted(GROK_TYPES)}")
    out_cols = {k: f"{prefix}{k}" for k in typed}
    clash = set(out_cols.values()) & set(df.columns)
    if clash:
        raise ValueError(
            f"kv output columns {sorted(clash)} collide with existing "
            "columns (set prefix=)")
    t = F.col(text_col)
    out = df
    vb = _value_body(field_split)
    fs = re.escape(field_split)
    vs = re.escape(value_split)
    for key, cast in typed.items():
        pat = f"(?:^|{fs}){re.escape(key)}{vs}({vb})"
        present = t.rlike(pat)
        col = F.when(present, F.regexp_extract(t, pat, 1))
        if cast is not None:
            col = col.try_cast(GROK_TYPES[cast])
        out = out.withColumn(out_cols[key], col)
    return out


def kv_map(df: DataFrame, text_col: str = "text", field_split: str = " ",
           value_split: str = "=", map_col: str = "kv") -> DataFrame:
    """All pairs as one `map<string,string>` column (pairs without the
    value separator are dropped first — str_to_map would otherwise emit
    them as key->NULL). See the module docstring for the duplicate-key
    dedup-policy hazard before pointing this at untrusted lines."""
    if map_col in df.columns:
        raise ValueError(f"column {map_col!r} already exists")
    pairs = F.filter(
        F.split(F.col(text_col), re.escape(field_split)),
        lambda p: p.contains(value_split))
    joined = F.array_join(pairs, field_split)
    parsed = F.str_to_map(joined, F.lit(re.escape(field_split)),
                          F.lit(re.escape(value_split)))
    # str_to_map('') yields {'': NULL}; an input with no pairs must give {}
    empty = F.map_from_arrays(F.array().cast("array<string>"),
                              F.array().cast("array<string>"))
    return df.withColumn(
        map_col, F.when(F.size(pairs) > 0, parsed).otherwise(empty))
