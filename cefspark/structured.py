"""The logstash ``csv`` and ``xml`` FILTERS (field-level parsing) as
native Catalyst expressions.

These are the filter-plugin siblings of the engine's file-level sources
(sources.py reads whole CSV/JSONL files; this module parses a STRING
COLUMN of an already-framed event — the logstash csv/xml filter
contract, e.g. a syslog line whose MSG part is a CSV record, or a SOAP
payload captured into one field).

Both compile to a single JVM expression (``from_csv`` / ``from_xml``)
— vectorized, whole-stage-codegen adjacent (the parsers are JVM
intrinsics, no Python), pushdown-transparent, zero shuffle. At 100 TB
each is a narrow projection riding the framing scan.

Malformed payloads follow the engine's error-as-data contract: the
struct comes back NULL-filled (PERMISSIVE), never a thrown error, and
``target=None`` expansion leaves NULL columns on the bad rows — callers
route failures like any other decode failure (parser.py D17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _ddl_fields(schema: str) -> list[str]:
    """Field names of a DDL schema string, via the real parser (a naive
    comma-split would break on DECIMAL(10,2) / ARRAY<...> types)."""
    return StructType.fromDDL(schema).fieldNames()


def _expand(df: DataFrame, parsed, fields: list[str],
            target: str | None) -> DataFrame:
    """Either keep the struct under ``target`` or expand its fields as
    top-level columns (the filters' default), refusing to shadow."""
    if target is not None:
        return df.withColumn(target, parsed)
    clash = [f for f in fields if f in df.columns]
    if clash:
        raise ValueError(f"parsed fields {clash} collide with existing "
                         f"columns; pass target= to nest instead")
    tmp = "_parsed_struct"
    out = df.withColumn(tmp, parsed)
    return out.select("*", *[F.col(f"{tmp}.{f}").alias(f) for f in fields]) \
              .drop(tmp)


def parse_csv_field(df: DataFrame, col: str, schema: str,
                    sep: str = ",", quote: str = '"',
                    target: str | None = None) -> DataFrame:
    """The logstash csv filter: parse ``col`` as ONE CSV record into the
    typed fields of ``schema`` (a DDL string, e.g. ``"id INT, msg
    STRING"`` — the filter's columns+convert options in one place).
    Quoted fields may embed the separator, per the filter's quote_char.
    """
    parsed = F.from_csv(F.col(col), F.lit(schema),
                        {"sep": sep, "quote": quote})
    return _expand(df, parsed, _ddl_fields(schema), target)


def parse_xml_field(df: DataFrame, col: str, schema: str,
                    target: str | None = None) -> DataFrame:
    """The logstash xml filter (store_xml mode): parse ``col`` as an XML
    document into the typed fields of ``schema``. Attributes surface
    under Spark's ``_name`` convention (attributePrefix ``_``), child
    elements by tag name; an unparsable document NULL-fills.
    """
    parsed = F.from_xml(F.col(col), F.lit(schema))
    return _expand(df, parsed, _ddl_fields(schema), target)


def parse_date_field(df: DataFrame, col: str, formats: list[str],
                     target: str = "event_ts") -> DataFrame:
    """The logstash ``date`` filter: try ``formats`` in order against
    string column ``col``; the first successful parse lands in
    ``target`` (TimestampType), rows no format fits get NULL
    (error-as-data — route them like any decode failure).

    Formats are Spark datetime patterns (y/M/d/H/m/s/S...), plus the
    filter's specials ``ISO8601`` (Spark's default lenient parser),
    ``UNIX`` (epoch seconds, fractional ok) and ``UNIX_MS`` (epoch
    millis). NOTE: logstash uses Joda patterns — mostly identical for
    the common cases, but e.g. Joda ``YYYY`` (week-year in Spark) should
    be written ``yyyy`` here; this engine rejects nothing at compile
    time, the try-parse just returns NULL.

    One codegen'd coalesce of try_to_timestamp calls — no Python, no
    shuffle. The CEF-exact normalizer (timestamps.py) is NOT this: CEF
    needs the reference's locale/zone/year-inference semantics; this is
    the generic any-log date stage."""
    if not formats:
        raise ValueError("parse_date_field needs at least one format")
    c = F.col(col)
    attempts = []
    for fmt in formats:
        if fmt == "UNIX":
            attempts.append(F.timestamp_seconds(c.try_cast("double")))
        elif fmt == "UNIX_MS":
            attempts.append(F.timestamp_millis(c.try_cast("bigint")))
        elif fmt == "ISO8601":
            attempts.append(F.try_to_timestamp(c))
        else:
            attempts.append(F.try_to_timestamp(c, F.lit(fmt)))
    return df.withColumn(target, F.coalesce(*attempts))
