"""Graphite plaintext codec (decode + encode), Spark-first.

Sibling-codec parity for the logstash codec family (reference repo is
``logstash-codec-cef``; ``logstash-codec-graphite`` handles this format):
the Graphite plaintext protocol is one metric per line,

    ``<dotted.metric.path> <numeric value> <unix epoch seconds>``

Decode maps each line to ``(metric, value, ts)`` with error-as-data for
malformed lines (wrong field count, non-numeric value/timestamp) — the same
failure-fallback contract as the CEF decode path (SURVEY.md §2.1 D17).
Encode mirrors the logstash codec's options: a ``metrics_format`` template
whose ``*`` is replaced by the field name, and ``include``/``exclude`` regex
filters over field names (exclude wins, like the codec).

Everything is built-in Catalyst expressions — ``split``/``try_cast``/
``format_string``/``stack`` — no Python UDFs, so decode and encode stay
inside whole-stage codegen and scale linearly with input splits.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["decode_graphite", "encode_graphite", "metric_components"]


def decode_graphite(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse Graphite plaintext lines into ``metric``/``value``/``ts`` columns.

    Malformed lines (field count != 3, unparseable value or timestamp) keep
    their payload and get ``error`` set; well-formed lines get ``error`` NULL.
    Runs-of-whitespace separate fields (carbon accepts both spaces and tabs).
    """
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    value = F.try_element_at(parts, F.lit(2)).try_cast("double")
    ts = F.try_element_at(parts, F.lit(3)).try_cast("bigint")
    ok = (F.size(parts) == 3) & value.isNotNull() & ts.isNotNull()
    return df.withColumns({
        "metric": F.when(ok, F.element_at(parts, 1)),
        "value": F.when(ok, value),
        "ts": F.when(ok, ts),
        "error": F.when(~ok, F.lit("invalid graphite line")),
    })


def metric_components(df: DataFrame, metric_col: str = "metric",
                      out_col: str = "components") -> DataFrame:
    """Split the dotted metric path into its components array."""
    return df.withColumn(out_col, F.split(F.col(metric_col), r"\."))


def encode_graphite(df: DataFrame, fields: Sequence[str],
                    ts_col: str = "ts",
                    metrics_format: str = "*",
                    include: Optional[str] = None,
                    exclude: Optional[str] = None,
                    out_col: str = "line") -> DataFrame:
    """Render numeric ``fields`` as Graphite lines, one output row per field.

    ``metrics_format`` is the logstash codec's template — its ``*`` is
    replaced by the field name (``"host.*.count"`` → ``host.cpu.count``).
    ``include``/``exclude`` are regexes over FIELD NAMES applied at plan
    build time (the codec applies them per event to a fixed field set, so
    compile-time filtering is equivalent); exclude wins over include.
    NULL field values are skipped (no line emitted), matching the codec's
    behavior of only rendering present metrics.
    """
    import re

    names = [n for n in fields
             if (include is None or re.search(include, n))
             and not (exclude is not None and re.search(exclude, n))]
    if not names:
        return df.select(F.lit(None).cast("string").alias(out_col)).limit(0)
    pairs: list[Column] = []
    for n in names:
        pairs.append(F.lit(metrics_format.replace("*", n)))
        pairs.append(F.col(n).cast("double"))
    exploded = df.select(
        F.col(ts_col).cast("bigint").alias("_ts"),
        F.stack(F.lit(len(names)), *pairs).alias("_metric", "_value"))
    return (exploded
            .where(F.col("_value").isNotNull())
            .select(F.format_string(
                "%s %s %d", F.col("_metric"),
                # %s on the double keeps integral values compact via
                # format_number-free rendering (Spark prints 1.0 → "1.0",
                # same as the Ruby codec's Float#to_s)
                F.col("_value").cast("string"), F.col("_ts"))
                .alias(out_col)))
