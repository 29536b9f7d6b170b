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

Round-6 verb additions (the rest of the filter's verb set):

- ``("urldecode", field)`` — percent-decoding; an invalid escape keeps
  the original value (the filter tags ``_urldecodefailure`` but never
  destroys the field — ``coalesce(try_url_decode, col)``).
- ``("truncate", field, n)`` — the truncate FILTER's ``length_bytes``:
  cuts at n BYTES (binary substring), not n characters; a cut landing
  mid-codepoint renders replacement chars, exactly the filter's hazard.
- ``("update", field, template)`` — ``replace`` that only fires when the
  field already exists (the mutate update/replace distinction), resolved
  at compile time against the schema.
- ``("coerce", field, value)`` — set ``value`` only where the field is
  NULL (the filter's coerce-on-nil contract).
- ``("capitalize", field)`` — first letter upcased, rest untouched (the
  filter upcases ONLY the first char; ``initcap`` would be wrong — it
  rewrites every word and lowercases the tail).

``prune`` / ``de_dot`` (their own logstash filters, same projection-only
discipline) live beside ``mutate``: both resolve ENTIRELY at plan-compile
time against the schema, so at 100 TB they are free — prune is column
pruning handed to Catalyst (the scan's ReadSchema shrinks), de_dot is a
rename. ``prune_map_keys`` / ``de_dot_map_keys`` are the Column-level
versions for map-typed payloads (the CEF extension map), compiled to
``map_filter`` / ``transform_keys`` — still whole-stage codegen.
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
        elif verb == "urldecode":
            df = df.withColumn(field, F.coalesce(
                F.try_url_decode(F.col(field)), F.col(field)))
        elif verb == "truncate":
            # bytes, not chars: the truncate filter's length_bytes contract
            df = df.withColumn(field, F.substring(
                F.col(field).cast("binary"), 1, int(op[2])).cast("string"))
        elif verb == "update":
            if field in df.columns:
                df = df.withColumn(field, sprintf_col(op[2], df.columns))
        elif verb == "coerce":
            df = df.withColumn(field, F.coalesce(
                F.col(field), F.lit(op[2]).cast(df.schema[field].dataType)))
        elif verb == "capitalize":
            df = df.withColumn(field, F.concat(
                F.upper(F.substring(F.col(field), 1, 1)),
                F.substring(F.col(field), 2, 2147483647)))
        elif verb == "set_if":
            # the alter filter's condrewrite: rewrite field when it
            # currently equals op[2] (NULL-safe equality — a NULL field
            # never matches, it keeps its NULL)
            df = df.withColumn(field, F.when(
                F.col(field).eqNullSafe(F.lit(op[2])) &
                F.col(field).isNotNull(),
                F.lit(op[3])).otherwise(F.col(field)))
        elif verb == "json_encode":
            # the json_encode filter: serialize a complex field (struct/
            # map/array) to its JSON string, in place or into op[2]
            target = op[2] if len(op) > 2 else field
            df = df.withColumn(target, F.to_json(F.col(field)))
        elif verb == "json_decode":
            # the json filter's core: parse a JSON string field with an
            # explicit schema (op[2], DDL string) into op[3] (default: in
            # place); malformed input yields NULL (error-as-data)
            target = op[3] if len(op) > 3 else field
            df = df.withColumn(target, F.from_json(F.col(field), op[2]))
        elif verb == "set_other_if":
            # alter's condrewriteother: when THIS field equals op[2],
            # write op[4] into field op[3] (others keep their value)
            df = df.withColumn(op[3], F.when(
                F.col(field).eqNullSafe(F.lit(op[2])) &
                F.col(field).isNotNull(), F.lit(op[4]))
                .otherwise(F.col(op[3]) if op[3] in df.columns
                           else F.lit(None).cast("string")))
        else:
            raise ValueError(f"unknown mutate verb {verb!r}")
    return df


def prune(df: DataFrame, whitelist: list[str] | None = None,
          blacklist: list[str] | None = None) -> DataFrame:
    """The logstash ``prune`` filter on DataFrame columns: keep only
    columns whose NAME matches a whitelist pattern, then drop any that
    match a blacklist pattern (whitelist wins the filter's precedence
    order — blacklist applies to the survivors). Patterns are Python
    regexes, `re.search` semantics like the filter's interest patterns.

    Resolves at compile time to a plain projection, so Catalyst prunes
    the dropped columns all the way into the scan's ReadSchema — at
    100 TB this verb is not merely cheap, it makes the scan cheaper."""
    cols = df.columns
    if whitelist is not None:
        pats = [re.compile(p) for p in whitelist]
        cols = [c for c in cols if any(p.search(c) for p in pats)]
    if blacklist is not None:
        pats = [re.compile(p) for p in blacklist]
        cols = [c for c in cols if not any(p.search(c) for p in pats)]
    if not cols:
        raise ValueError("prune removed every column; at least one must "
                         "survive (a zero-column relation is unusable)")
    return df.select(*cols)


def de_dot(df: DataFrame, sep: str = "_") -> DataFrame:
    """The logstash ``de_dot`` filter: rename every column containing a
    ``.`` to use ``sep`` instead (dotted names collide with struct-field
    access in every downstream engine — same motivation as the filter).
    Pure compile-time rename; raises on a collision with an existing
    column rather than silently shadowing it."""
    renames = {c: c.replace(".", sep) for c in df.columns if "." in c}
    taken = set(df.columns) - set(renames)
    for old, new in renames.items():
        if new in taken:
            raise ValueError(f"de_dot would rename {old!r} onto existing "
                             f"column {new!r}")
        taken.add(new)
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def prune_map_keys(col: Column, whitelist: str | None = None,
                   blacklist: str | None = None) -> Column:
    """``prune`` for a map-typed payload column (the CEF extension map):
    keep entries whose KEY rlike-matches ``whitelist`` (when given), then
    drop entries matching ``blacklist``. Compiles to ``map_filter`` —
    whole-stage codegen, no Python at runtime."""
    def keep(k: Column, _v: Column) -> Column:
        cond = F.lit(True)
        if whitelist is not None:
            cond = k.rlike(whitelist)
        if blacklist is not None:
            cond = cond & ~k.rlike(blacklist)
        return cond
    return F.map_filter(col, keep)


def de_dot_map_keys(col: Column, sep: str = "_") -> Column:
    """``de_dot`` for a map-typed payload column: rewrite ``.`` to
    ``sep`` in every key via ``transform_keys`` (codegen'd). NOTE: two
    keys that collide after rewriting ("a.b" and "a_b") raise Spark's
    DUPLICATED_MAP_KEY error at runtime under the default policy — loud,
    matching this engine's error-as-error contract for config mistakes."""
    return F.transform_keys(col, lambda k, _v: F.replace(k, F.lit("."),
                                                         F.lit(sep)))


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
    # logstash events are stringly-typed; a convert-ed (e.g. BIGINT)
    # source still looks up by its string rendering
    src = F.col(src_col).cast("string")
    if regex:
        expr: Column = F.lit(default).cast("string")
        for pat, val in reversed(list(dictionary.items())):
            expr = F.when(src.rlike(pat), F.lit(val)).otherwise(expr)
    else:
        kv = [x for pair in dictionary.items() for x in map(F.lit, pair)]
        hit = F.element_at(F.create_map(*kv), src) if kv \
            else F.lit(None).cast("string")
        expr = F.coalesce(hit, F.lit(default).cast("string"))
    return df.withColumn(dest_col, expr)
