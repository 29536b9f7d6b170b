"""Dissect-style positional line tokenization, compiled to one JVM regex.

The dissect workflow (the logstash `dissect` filter's contract, the cheap
sibling of grok for fixed-layout lines): a pattern names fields separated
by LITERAL delimiters —

    dissect_parse(df, "%{ts} %{+ts} %{host} [%{level}] %{msg}")

Tokens:
    %{field}      capture up to the next literal delimiter (string column)
    %{field:int}  typed capture — same coercion suffixes as grok
                  (int/long -> BIGINT, float/double -> DOUBLE via try_cast)
    %{}, %{?x}    skip (matched, not emitted)
    %{+field}     append to an earlier %{field}, joined with the delimiter
                  that separated them (logstash append semantics); pass
                  ``append_separator`` to override the join string
    %{field->}    right-pad skip: swallow REPEATS of the following
                  delimiter (aligned columnar output, e.g. `%{ts->} %{id}`)
    last field    greedy — takes the rest of the line

Execution: the pattern compiles to a single anchored regex — each literal
delimiter is quoted, inner fields become lazy `(.*?)`, the final capture
`(.*)`, a `->` modifier turns its following delimiter into `(?:delim)+`.
Lazy matching finds each delimiter leftmost-first, which IS dissect's
left-to-right scan, so one `rlike` + one `regexp_extract` per field
reproduces the tokenizer entirely inside whole-stage codegen — no UDF, no
shuffle, same plan shape as :mod:`cefspark.grok` (test_plans pins grok's;
dissect emits the identical expression family).

Reference scope note: the reference codec (cef.rb) has no dissect stage —
like grok this is the generic log-pipeline surface (SURVEY.md §2.4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grok import GROK_TYPES

_TOKEN = re.compile(r"%\{(?P<body>[^{}]*)\}")


def compile_dissect(pattern: str,
                    ) -> tuple[str, list[tuple[str, str | None, bool, str]]]:
    """Compile a dissect pattern to ``(regex, specs)`` where each spec is
    ``(field, cast, appended, prev_lit)``; appended fields share the name
    of an earlier field and are merged at parse time, joined by
    ``prev_lit`` (the literal delimiter written before the + token). The
    regex is UNanchored (callers add ^$); group i+1 is specs[i]."""
    specs: list[tuple[str, str | None, bool, str]] = []
    parts: list[str] = []          # alternating literal/capture fragments
    pad_next_literal = False
    pos = 0
    prev_lit = ""
    matches = list(_TOKEN.finditer(pattern))
    if not matches:
        raise ValueError("dissect pattern contains no %{...} tokens")
    for i, m in enumerate(matches):
        lit = pattern[pos:m.start()]
        prev_lit = lit
        if i == 0:
            if lit:
                parts.append(re.escape(lit))
        else:
            if not lit:
                # two adjacent captures have no delimiter to split on —
                # the result would be ambiguous (lazy regex would give the
                # first capture ''), reject like dissect does
                raise ValueError(
                    f"dissect fields #{i} and #{i + 1} are not separated "
                    "by a literal delimiter")
            quoted = re.escape(lit)
            parts.append(f"(?:{quoted})+" if pad_next_literal else quoted)
        pad_next_literal = False
        body = m.group("body")
        if body.endswith("->"):
            pad_next_literal = True
            body = body[:-2]
        if body == "" or body.startswith("?"):
            parts.append(r"(?:.*?)" if i < len(matches) - 1 else r"(?:.*)")
            pos = m.end()
            continue
        appended = body.startswith("+")
        if appended:
            body = body[1:]
        name, _, typ = body.partition(":")
        if not re.fullmatch(r"[A-Za-z0-9_]+", name or ""):
            raise ValueError(f"bad dissect field name {name!r}")
        cast = None
        if typ:
            if typ not in GROK_TYPES:
                raise ValueError(
                    f"unknown dissect type suffix {typ!r}; "
                    f"supported: {sorted(GROK_TYPES)}")
            cast = GROK_TYPES[typ]
        if appended and name not in [n for n, *_ in specs]:
            raise ValueError(f"%{{+{name}}} appends to a field that was "
                             "not captured earlier")
        specs.append((name, cast, appended, prev_lit))
        parts.append("(.*?)" if i < len(matches) - 1 else "(.*)")
        pos = m.end()
    tail = pattern[pos:]
    if tail:
        parts.append(re.escape(tail))
    # output names must be unique once appends merge
    out_names = [n for n, _, a, _ in specs if not a]
    if len(set(out_names)) != len(out_names):
        dupes = sorted({n for n in out_names if out_names.count(n) > 1})
        raise ValueError(f"duplicate dissect field names: {dupes}")
    return "".join(parts), specs


def dissect_parse(df: DataFrame, pattern: str, text_col: str = "text",
                  keep_unmatched: bool = True,
                  append_separator: str | None = None) -> DataFrame:
    """Add one column per dissect field (NULL on rows the pattern does not
    fit; rows dropped entirely with ``keep_unmatched=False``). ``%{+f}``
    append captures concatenate onto ``f`` joined by the literal delimiter
    that separated them in the pattern (or ``append_separator``)."""
    regex, specs = compile_dissect(pattern)
    if not specs:
        raise ValueError("dissect pattern binds no fields")
    fields = [n for n, _, a, _ in specs if not a]
    if text_col in fields:
        raise ValueError(
            f"dissect field {text_col!r} collides with the source column")
    clash = set(fields) & set(df.columns)
    if clash:
        raise ValueError(
            f"dissect fields {sorted(clash)} collide with existing columns")
    anchored = f"^(?:{regex})$"
    t = F.col(text_col)
    matched = t.rlike(anchored)
    out = df
    if not keep_unmatched:
        out = out.where(matched)

    exprs = {}
    for gi, (name, cast, appended, prev_lit) in enumerate(specs, start=1):
        ext = F.regexp_extract(t, anchored, gi)
        if appended:
            sep = prev_lit if append_separator is None else append_separator
            exprs[name] = F.concat(exprs[name], F.lit(sep), ext)
        else:
            exprs[name] = ext
    for name, _, appended, _ in specs:
        if appended:
            continue
        col = exprs[name] if not keep_unmatched else F.when(matched,
                                                            exprs[name])
        cast = next(c for n, c, a, _ in specs if n == name and not a)
        if cast is not None:
            col = col.try_cast(cast)
        out = out.withColumn(name, col)
    return out
