"""Multiline event assembly — the logstash `multiline` codec re-expressed
as declarative Spark over an ordered lines table.

Reference semantics (public logstash-codec-multiline docs/source; the CEF
codec's own D1 framing at cef.rb:211-222 hands it single lines): a line
matching ``pattern`` (inverted when ``negate``) is *joined* —

- ``what='previous'``: the joining line belongs to the PREVIOUS line's
  event (stack traces: ``pattern=r'^\\s'``).
- ``what='next'``: the joining line belongs to the NEXT line's event
  (trailing-backslash continuations: ``pattern=r'\\\\$'``).
- ``max_lines``: a logical event longer than ``max_lines`` is flushed in
  ``max_lines``-sized chunks; every full chunk carries the
  ``multiline_codec_max_lines_reached`` tag (the final partial chunk,
  flushed by the next event's start line, does not).

Spark shape — NOT a stateful scan. The codec's sequential buffer is
re-expressed as pure window arithmetic over ``(source, line_no)``:

1. boundary bit per line (``rlike`` xor ``negate``, whole-stage codegen),
2. event id = running sum of boundary bits over a
   ``Window.partitionBy(source).orderBy(line_no)`` (for ``what='next'``
   the sum excludes the current row: a line opens a new event iff the
   line BEFORE it declined to join forward),
3. one hash aggregation reassembling each event's text with an ordered
   in-group sort (``array_sort`` over ``struct(line_no, line)`` —
   collect_list order is nondeterministic under retries, the sort is what
   makes the result exactly-once-stable).

Scale: one shuffle for the window + one for the group-by, both keyed by
``source`` (= file/shard), so parallelism equals the number of log
sources — the semantic lower bound, since line order within a file is the
whole point. A single pathological multi-TB source would serialize; split
such streams upstream (the framing reader already shards by file).
Per-event state is bounded by ``max_lines`` exactly as in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_LINES_TAG = "multiline_codec_max_lines_reached"


def _joins(line: Column, pattern: str, negate: bool) -> Column:
    # a NULL line (corrupt decode, outer-join product) counts as
    # NON-matching — a raw rlike NULL would poison the running sum into a
    # spurious NULL event id
    m = F.coalesce(line.rlike(pattern), F.lit(False))
    return ~m if negate else m


def assemble_multiline(df: DataFrame, pattern: str, negate: bool = False,
                       what: str = "previous", source_col: str = "source",
                       line_col: str = "line", order_col: str = "line_no",
                       sep: str = "\n", max_lines: int | None = None,
                       ) -> DataFrame:
    """Collapse an ordered lines table into one row per multiline event.

    Returns ``(source, first_line_no, n_lines, text[, tags])`` — ``tags``
    only when ``max_lines`` is set. ``line_no`` must be unique per source
    (any monotone ingest counter; gaps are fine)."""
    if what not in ("previous", "next"):
        raise ValueError(f"what must be 'previous' or 'next', got {what!r}")
    if max_lines is not None and max_lines < 1:
        raise ValueError("max_lines must be >= 1")

    joins = _joins(F.col(line_col), pattern, negate)
    w = Window.partitionBy(source_col).orderBy(order_col)
    start = (~joins).cast("int")
    if what == "previous":
        # a non-joining line opens its own event
        ev = F.sum(start).over(w.rowsBetween(Window.unboundedPreceding, 0))
    else:
        # a line opens a new event iff its predecessor declined to join
        # forward; the first line of a source always opens event 1
        ev = F.coalesce(
            F.sum(start).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)) + 1

    lines = df.select(source_col, order_col, line_col).withColumn("_ev", ev)

    group = [source_col, "_ev"]
    if max_lines is not None:
        we = Window.partitionBy(source_col, "_ev").orderBy(order_col)
        lines = lines.withColumn(
            "_chunk", ((F.row_number().over(we) - 1) / max_lines)
            .cast("bigint"))
        group.append("_chunk")

    agg = [
        F.min(order_col).alias("first_line_no"),
        F.count(F.lit(1)).alias("n_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order_col).alias("o"), F.col(line_col).alias("l")))),
                lambda s: s["l"]),
            sep, "").alias("text"),   # NULL lines render as "" (not dropped)
    ]
    out = lines.groupBy(*group).agg(*agg)
    if max_lines is not None:
        out = out.withColumn(
            "tags",
            F.when(F.col("n_lines") >= max_lines,
                   F.array(F.lit(MAX_LINES_TAG)))
            .otherwise(F.array().cast("array<string>")))
    return out.drop("_ev", "_chunk")
