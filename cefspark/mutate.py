"""The logstash `mutate` and `translate` filters as native Catalyst
expressions.

These two filters are the workhorses of real logstash pipelines around the
CEF codec (reference ecosystem; mutate/translate are the most-installed
filters). Both compile ENTIRELY to built-in column expressions — every verb
stays inside whole-stage codegen, nothing touches Python at runtime, and a
chain of verbs collapses into one projection that Catalyst folds with the
surrounding plan (filter pushdown straight through, column pruning of
removed fields).

``mutate(df, ops)`` executes an ordered verb list (order matters, exactly
as in the filter):

    mutate(df, [
        ("rename", "src", "source_ip"),
        ("convert", "spt", "integer"),
        ("gsub", "msg", r"\\d{4}-\\d{4}-\\d{4}-\\d{4}", "[card]"),
        ("uppercase", "proto"),
        ("split", "tags_csv", ","),
        ("join", "tags_csv", ";"),
        ("strip", "host"),
        ("copy", "msg", "msg_raw"),
        ("replace", "summary", "%{proto} from %{source_ip}"),
        ("merge", "tags_all", "tags_a", "tags_b"),
        ("remove", "tmp"),
    ])

``convert`` uses try-cast semantics (unconvertible → NULL, never a thrown
ANSI error — error-as-data, matching the rest of the engine).
``replace`` templates compile ``%{field}`` references to a concat of
columns and literals (the sprintf contract of cef.rb:27-51's header
templating, JVM-side); unknown-field fragments render verbatim.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CONVERT = {"integer": "bigint", "float": "double", "string": "string",
            "boolean": "boolean"}
_FIELD_REF = re.compile(r"%\{(\w+)\}")


def sprintf_col(template: str, columns: list[str]) -> Column:
    """Compile a ``%{field}`` template into a concat of literals and
    columns — unknown fields render the fragment verbatim (the Logstash
    sprintf contract), resolved at COMPILE time against ``columns``."""
    parts: list[Column] = []
    pos = 0
    for m in _FIELD_REF.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        name = m.group(1)
        parts.append(F.col(name).cast("string") if name in columns
                     else F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def mutate(df: DataFrame, ops: list[tuple]) -> DataFrame:
    """Apply an ordered list of mutate verbs (see module docstring)."""
    for op in ops:
        verb, field = op[0], op[1]
        if verb == "rename":
            df = df.withColumnRenamed(field, op[2])
        elif verb == "convert":
            try:
                target = _CONVERT[op[2]]
            except KeyError:
                raise ValueError(f"convert type must be one of "
                                 f"{sorted(_CONVERT)}, got {op[2]!r}")
            df = df.withColumn(field, F.col(field).try_cast(target))
        elif verb == "gsub":
            df = df.withColumn(field, F.regexp_replace(field, op[2], op[3]))
        elif verb == "uppercase":
            df = df.withColumn(field, F.upper(F.col(field)))
        elif verb == "lowercase":
            df = df.withColumn(field, F.lower(F.col(field)))
        elif verb == "strip":
            df = df.withColumn(field, F.trim(F.col(field)))
        elif verb == "split":
            df = df.withColumn(field, F.split(F.col(field), op[2]))
        elif verb == "join":
            df = df.withColumn(field, F.array_join(F.col(field), op[2]))
        elif verb == "copy":
            df = df.withColumn(op[2], F.col(field))
        elif verb == "replace":
            df = df.withColumn(field, sprintf_col(op[2], df.columns))
        elif verb == "merge":
            # a missing (NULL) source is a no-op, as in the filter —
            # bare concat would null the whole result
            df = df.withColumn(field, F.concat(
                *[F.coalesce(F.col(c), F.array()) for c in op[2:]]))
        elif verb == "remove":
            df = df.drop(*op[1:])
        else:
            raise ValueError(f"unknown mutate verb {verb!r}")
    return df


def translate(df: DataFrame, src_col: str, dictionary: dict[str, str],
              dest_col: str, default: str | None = None,
              regex: bool = False) -> DataFrame:
    """The logstash ``translate`` filter: dictionary lookup of
    ``src_col`` into ``dest_col``.

    Exact mode compiles the dictionary to a literal MAP lookup (one
    codegen'd ``element_at`` — the broadcast-dict shape, right for the
    filter's config-file-sized dictionaries; dimension TABLES should use
    the ``enrich``-style broadcast join instead, and the CEF key-mapping
    tables already do). ``regex=True`` tries patterns in dictionary
    order, FIRST match wins (``rlike`` chain — Java regex, partial match
    per the filter's default). Misses fill with ``default`` (NULL when
    not given)."""
    if regex:
        expr: Column = F.lit(default).cast("string")
        for pat, val in reversed(list(dictionary.items())):
            expr = F.when(F.col(src_col).rlike(pat), F.lit(val)).otherwise(expr)
    else:
        kv = [x for pair in dictionary.items() for x in map(F.lit, pair)]
        hit = F.element_at(F.create_map(*kv), F.col(src_col)) if kv \
            else F.lit(None).cast("string")
        expr = F.coalesce(hit, F.lit(default).cast("string"))
    return df.withColumn(dest_col, expr)
