"""Grok-style pattern parsing: `%{PATTERN:field}` expressions compiled to
plain regular expressions and evaluated JVM-side.

The north rule's parse stage names "grok/regex parse"; CEF is the deep
codec, and this module is the GENERIC side — the Logstash-grok workflow of
naming a line format out of a pattern library and getting typed columns
back, re-expressed as Catalyst expressions:

    grok_parse(df, "%{IP:clientip} .. %{INT:response}")

adds one column per named capture. Everything stays whole-stage codegen —
`rlike` + `regexp_extract` per field, no UDF, no shuffle; Catalyst
deduplicates the identical compiled pattern across the extract calls.

The pattern library is the regex subset with identical semantics in
java.util.regex and RE2 (character classes, bounded repetition, (?:...),
anchors — no backreferences, no lookaround), so oracles can restate a
compiled pattern verbatim; base patterns contain only NON-capturing groups,
making named-field group numbering purely positional.

Reference scope note: the reference codec (cef.rb) has no grok stage — this
belongs to the generic log-pipeline surface the engine adds (SURVEY.md §2.4
scalar functions / projections family).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reusable bodies (module-private: BASE_PATTERNS entries may not reference
#: each other by %{NAME} — these constants give the same reuse in Python)
_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
_HOSTNAME = (r"[0-9A-Za-z][0-9A-Za-z-]{0,62}"
             r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?")
_H16 = r"[0-9A-Fa-f]{1,4}"
#: RFC-4291 textual forms: full 8-group, every `::` compression, and the
#: IPv4-in-IPv6 tails (full 6-group and compressed). No lookaround — each
#: compression level is its own alternative.
_IPV6 = "|".join([
    rf"(?:{_H16}:){{7}}{_H16}",                      # full
    rf"(?:{_H16}:){{1,7}}:",                         # a::
    rf"(?:{_H16}:){{1,6}}:{_H16}",                   # a::b
    rf"(?:{_H16}:){{1,5}}(?::{_H16}){{1,2}}",
    rf"(?:{_H16}:){{1,4}}(?::{_H16}){{1,3}}",
    rf"(?:{_H16}:){{1,3}}(?::{_H16}){{1,4}}",
    rf"(?:{_H16}:){{1,2}}(?::{_H16}){{1,5}}",
    rf"{_H16}:(?::{_H16}){{1,6}}",
    r"::(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,6})?",  # :: and ::a…
    rf"(?:{_H16}:){{6}}{_IPV4}",                     # full v4 tail
    rf"::(?:{_H16}:){{0,5}}{_IPV4}",                 # ::v4, ::ffff:v4
    rf"(?:{_H16}:){{1,4}}:(?:{_H16}:){{0,4}}{_IPV4}",  # a::b:v4
])
_MONTH = (r"Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?"
          r"|Jul(?:y)?|Aug(?:ust)?|Sep(?:t(?:ember)?)?|Oct(?:ober)?"
          r"|Nov(?:ember)?|Dec(?:ember)?")
_DAY = (r"Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?"
        r"|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?")
_MONTHNUM = r"0[1-9]|1[0-2]|[1-9]"
_MONTHDAY = r"0[1-9]|[12]\d|3[01]|[1-9]"
_YEAR = r"\d{4}|\d{2}"
_HOUR = r"2[0-3]|[01]?\d"
_MINUTE = r"[0-5]\d"
_SECOND = r"(?:[0-5]\d|60)(?:[.,]\d+)?"
_TIME = rf"(?:{_HOUR}):(?:{_MINUTE})(?::(?:{_SECOND}))?"
_URIPATH = r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+"
_URIPARAM = r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>\-]*"
_USER = r"[a-zA-Z0-9._-]+"
_POSINT = r"[1-9]\d*"
_UNIXPATH = r"(?:/[\w.+=%-]+)+/?"
_WINPATH = r"(?:[A-Za-z]:|\\)(?:\\[^\\?*\r\n]+)+\\?"

#: base pattern library (no capturing groups — named fields add those).
#: Names follow the well-known logstash-patterns-core vocabulary; every
#: BODY is written from scratch for the java/RE2-common subset (no
#: backrefs, lookaround, atomic or possessive groups — so DuckDB/RE2
#: oracles can restate a compiled pattern verbatim). Top-level alternation
#: is fine: inlining always wraps the body in (?:...).
BASE_PATTERNS: dict[str, str] = {
    # --- numbers ---
    "INT": r"[+-]?\d+",
    "POSINT": _POSINT,
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9A-Fa-f]+",
    "BASE16FLOAT": r"[+-]?(?:0[xX])?[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?",
    # --- words / free text ---
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "USERNAME": _USER,
    "USER": _USER,
    "EMAILLOCALPART": r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
                      r"(?:\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*",
    "EMAILADDRESS": r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
                    r"(?:\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*"
                    "@" + _HOSTNAME,
    "LOGLEVEL": r"(?:[Dd]ebug|DEBUG|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?"
                r"|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?"
                r"|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?"
                r"|[Ff]atal|FATAL|[Ss]evere|SEVERE|[Aa]lert|ALERT"
                r"|[Ee]merg(?:ency)?|EMERG(?:ENCY)?|[Tt]race|TRACE)",
    "QS": r'"(?:[^"\\]|\\.)*"',
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"' + "|'(?:[^'\\\\]|\\\\.)*'",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "URN": r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:"
           r"[0-9A-Za-z()+,.:=@;$_!*'/?#%-]+",
    # --- network ---
    "IP": _IPV4 + "|" + _IPV6,
    "IPV4": _IPV4,
    "IPV6": _IPV6,
    "HOSTNAME": _HOSTNAME,
    "IPORHOST": _IPV4 + "|" + _HOSTNAME,
    "HOSTPORT": rf"(?:{_IPV4}|{_HOSTNAME}):{_POSINT}",
    # uniform separator per address, expanded per separator (no backrefs)
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "MAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}"
           r"|(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}"
           r"|(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    # --- uri / paths ---
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "URIHOST": rf"(?:{_IPV4}|{_HOSTNAME})(?::\d+)?",
    "URIPATH": _URIPATH,
    "URIPARAM": _URIPARAM,
    "URIPATHPARAM": rf"{_URIPATH}(?:{_URIPARAM})?",
    "URI": rf"[A-Za-z][A-Za-z0-9+.-]*://(?:{_USER}(?::[^@/\s]*)?@)?"
           rf"(?:{_IPV4}|{_HOSTNAME})(?::\d+)?"
           rf"(?:{_URIPATH}(?:{_URIPARAM})?|{_URIPARAM})?",
    "UNIXPATH": _UNIXPATH,
    "WINPATH": _WINPATH,
    "PATH": _UNIXPATH + "|" + _WINPATH,
    "TTY": r"/dev/(?:pts/\d+|tty[A-Za-z]*\d*)",
    # bracket-free so `program[pid]` splits correctly (logstash PROG is the
    # analogous printable-minus-brackets class)
    "PROG": r"[a-zA-Z0-9._/-]+",
    # --- dates & times ---
    "MONTH": _MONTH,
    "MONTHNUM": _MONTHNUM,
    "MONTHDAY": _MONTHDAY,
    "DAY": _DAY,
    "YEAR": _YEAR,
    "HOUR": _HOUR,
    "MINUTE": _MINUTE,
    "SECOND": _SECOND,
    "TIME": _TIME,
    "DATE_US": rf"(?:{_MONTHNUM})[/-](?:{_MONTHDAY})[/-](?:{_YEAR})",
    "DATE_EU": rf"(?:{_MONTHDAY})[./-](?:{_MONTHNUM})[./-](?:{_YEAR})",
    "DATE": rf"(?:{_MONTHNUM})[/-](?:{_MONTHDAY})[/-](?:{_YEAR})"
            rf"|(?:{_MONTHDAY})[./-](?:{_MONTHNUM})[./-](?:{_YEAR})",
    "DATESTAMP": rf"(?:(?:{_MONTHNUM})[/-](?:{_MONTHDAY})[/-](?:{_YEAR})"
                 rf"|(?:{_MONTHDAY})[./-](?:{_MONTHNUM})[./-](?:{_YEAR}))"
                 rf"[ -]{_TIME}",
    "ISO8601_TIMEZONE": r"Z|[+-]\d{2}(?::?\d{2})?",
    "TZ": r"(?:[A-Z][A-Za-z]{1,3}T|UTC|GMT|[+-]\d{4})",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}",
    "DATESTAMP_RFC822": rf"(?:{_DAY}),? (?:{_MONTHDAY}) (?:{_MONTH}) "
                        rf"(?:{_YEAR}) {_TIME}"
                        r"(?: (?:[A-Z][A-Za-z]{1,3}T|UTC|GMT|[+-]\d{4}))?",
    "DATESTAMP_EVENTLOG": r"\d{4}\d{2}\d{2}\d{2}\d{2}\d{2}",
}

#: composite line formats, themselves grok expressions
COMPOSITE_PATTERNS: dict[str, str] = {
    "COMMONAPACHELOG":
        '%{IP:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] '
        '"%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?" '
        '%{INT:response} (?:%{INT:bytes}|-)',
    "SYSLOGLINE":
        '%{SYSLOGTIMESTAMP:ts} %{NOTSPACE:host} %{PROG:program}'
        '(?:\\[%{INT:pid}\\])?: %{GREEDYDATA:msg}',
    # references COMMONAPACHELOG — composites may nest; the reference graph
    # is acyclic by construction (a composite only names earlier entries)
    "COMBINEDAPACHELOG":
        '%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}',
    "SYSLOGPROG": '%{PROG:program}(?:\\[%{POSINT:pid}\\])?',
    "SYSLOGFACILITY": '<%{NONNEGINT:facility}.%{NONNEGINT:priority}>',
    "SYSLOGBASE":
        '%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?'
        '%{IPORHOST:logsource} %{SYSLOGPROG}:',
}

_REF = re.compile(r"%\{(?P<name>[A-Z0-9_]+)"
                  r"(?::(?P<field>[A-Za-z0-9_]+)"
                  r"(?::(?P<type>[A-Za-z0-9_]+))?)?\}")

#: `%{PAT:field:type}` coercion suffixes -> Spark cast targets. int/long
#: land as BIGINT (logstash's int converts to a Ruby Integer, unbounded —
#: BIGINT is the widest integral Spark column type); float/double as DOUBLE.
GROK_TYPES: dict[str, str] = {
    "int": "bigint",
    "long": "bigint",
    "float": "double",
    "double": "double",
}


def compile_grok_typed(expr: str,
                       extra_patterns: dict[str, str] | None = None
                       ) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand a grok expression to (regex, ordered (field, cast) pairs).
    `%{NAME}` inlines non-capturing; `%{NAME:field}` becomes the next
    capturing group (cast None = stays string); `%{NAME:field:int}` adds a
    ``try_cast`` target — logstash grok's typed-coercion convenience
    (VERDICT r5 #4). Composites expand recursively (cycles impossible:
    a composite only references base patterns or earlier composites).

    ``extra_patterns`` is the logstash ``pattern_definitions`` option:
    caller-supplied base patterns (name -> regex body, CAPTURE-FREE like
    the library's own — a capturing group inside would shift the
    positional extraction), taking precedence over the built-in library
    so a config can locally refine a stock pattern."""
    fields: list[tuple[str, str | None]] = []
    extra = extra_patterns or {}
    for n, body in extra.items():
        if re.search(r"(?<!\\)\((?!\?)", body):
            raise ValueError(
                f"extra pattern {n!r} contains a capturing group; use "
                f"(?:...) — captures would shift positional extraction")

    def sub(m: re.Match) -> str:
        name, field, typ = m.group("name"), m.group("field"), m.group("type")
        if name in extra:
            body = extra[name]
            if field is None:
                return f"(?:{body})"
            cast = None
            if typ is not None:
                if typ not in GROK_TYPES:
                    raise ValueError(
                        f"unknown grok type suffix {typ!r}; supported: "
                        f"{sorted(GROK_TYPES)}")
                cast = GROK_TYPES[typ]
            fields.append((field, cast))
            return f"({body})"
        if name in COMPOSITE_PATTERNS:
            inner, inner_fields = compile_grok_typed(COMPOSITE_PATTERNS[name])
            if field is not None:
                raise ValueError(
                    f"composite %{{{name}}} cannot take a field name "
                    f"(it defines its own: {[f for f, _ in inner_fields]})")
            fields.extend(inner_fields)
            return f"(?:{inner})"
        if name not in BASE_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = BASE_PATTERNS[name]
        if field is None:
            # (a type can't appear without a field: _REF only matches the
            # type segment after a non-empty field segment)
            return f"(?:{body})"
        cast = None
        if typ is not None:
            if typ not in GROK_TYPES:
                raise ValueError(
                    f"unknown grok type suffix {typ!r} in "
                    f"%{{{name}:{field}:{typ}}}; supported: "
                    f"{sorted(GROK_TYPES)}")
            cast = GROK_TYPES[typ]
        fields.append((field, cast))
        return f"({body})"

    pattern = _REF.sub(sub, expr)
    names = [f for f, _ in fields]
    if len(set(names)) != len(names):
        dupes = sorted({f for f in names if names.count(f) > 1})
        raise ValueError(f"duplicate grok field names: {dupes}")
    return pattern, fields


def compile_grok(expr: str) -> tuple[str, list[str]]:
    """Back-compat view of :func:`compile_grok_typed`: (regex, field names)."""
    pattern, fields = compile_grok_typed(expr)
    return pattern, [f for f, _ in fields]


def grok_parse(df: DataFrame, expr: str, text_col: str = "text",
               anchored: bool = True, keep_unmatched: bool = True,
               extra_patterns: dict[str, str] | None = None) -> DataFrame:
    """Add one column per named capture of ``expr`` — string by default, or
    the ``try_cast`` of a `%{PAT:field:int}`-style typed capture (BIGINT /
    DOUBLE; a capture the cast can't parse, including the empty string,
    lands NULL — ANSI-mode-safe). Non-matching rows keep NULL in every
    field (dropped entirely when ``keep_unmatched=False``); an untyped
    empty capture yields '' (distinguishable from no-match). ``anchored``
    wraps the pattern in ^...$ — the usual line-format contract; pass False
    for substring extraction."""
    pattern, typed = compile_grok_typed(expr, extra_patterns)
    fields = [f for f, _ in typed]
    if not fields:
        raise ValueError("grok expression binds no fields")
    if text_col in fields:
        # a field named like the source column would REPLACE it mid-loop,
        # so later extractions (and the match predicate) would silently
        # resolve against the first capture instead of the line
        raise ValueError(
            f"grok field {text_col!r} collides with the source column")
    clash = set(fields) & set(df.columns)
    if clash:
        # ADVICE r5: withColumn silently overwrites ANY pre-existing column,
        # not just the source — reject rather than drop user data
        raise ValueError(
            f"grok fields {sorted(clash)} collide with existing columns")
    if anchored:
        pattern = f"^(?:{pattern})$"
    t = F.col(text_col)
    matched = t.rlike(pattern)
    out = df
    if not keep_unmatched:
        out = out.where(matched)
    for i, (name, cast) in enumerate(typed, start=1):
        ext = F.regexp_extract(t, pattern, i)
        col = ext if not keep_unmatched else F.when(matched, ext)
        if cast is not None:
            col = col.try_cast(cast)
        out = out.withColumn(name, col)
    return out


def grok_parse_any(df: DataFrame, exprs: list[str], text_col: str = "text",
                   match_col: str = "grok_pattern") -> DataFrame:
    """First-match-wins over a LIST of grok expressions — the standard grok
    filter configuration for mixed-format log streams (try the specific
    format first, fall back to the generic one). Adds the union of all
    patterns' fields plus ``match_col`` (the 0-based index of the FIRST
    matching pattern; NULL when none match). Each row's fields come from
    its winning pattern ONLY — fields that pattern does not define stay
    NULL even if a later pattern also matches the row and defines them
    (one parse per row, logstash-grok `break_on_match` semantics). Typed
    captures coerce like :func:`grok_parse`; a field shared across patterns
    must carry one consistent type.

    Still pure JVM expression work: per pattern one rlike + one
    regexp_extract per field, gated by the first-match predicate — no UDF,
    no shuffle. Cost grows with patterns × fields; order patterns
    most-specific-first both for semantics and so hot rows exit early via
    the cheapest predicate short-circuit."""
    if not exprs:
        raise ValueError("no grok expressions given")
    compiled = []
    casts: dict[str, str | None] = {}
    for e in exprs:
        pattern, typed = compile_grok_typed(e)
        fields = [f for f, _ in typed]
        for reserved in (text_col, match_col):
            if reserved in fields:
                # overwriting either would corrupt the later extractions
                # that reference it by name (same hazard as in grok_parse)
                raise ValueError(
                    f"grok field {reserved!r} collides with the "
                    f"{'source' if reserved == text_col else 'match'} column")
        clash = set(fields) & set(df.columns)
        if clash:
            raise ValueError(
                f"grok fields {sorted(clash)} collide with existing columns")
        for name, cast in typed:
            if name in casts and casts[name] != cast:
                # one output column, one type: a field shared across
                # patterns must coerce consistently or the coalesce would
                # need an implicit (ANSI-hostile) unification
                raise ValueError(
                    f"grok field {name!r} has conflicting types across "
                    f"patterns: {casts[name] or 'string'} vs "
                    f"{cast or 'string'}")
            casts[name] = cast
        compiled.append((f"^(?:{pattern})$", fields))
    t = F.col(text_col)
    matches = [t.rlike(p) for p, _ in compiled]
    # first-match index: coalesce of when-chains in order
    first = F.coalesce(*[F.when(m, F.lit(i)) for i, m in enumerate(matches)],
                       F.lit(None).cast("int"))
    out = df.withColumn(match_col, first)
    seen: dict[str, list] = {}
    for i, (p, fields) in enumerate(compiled):
        for gi, name in enumerate(fields, start=1):
            seen.setdefault(name, []).append(
                F.when(F.col(match_col) == i, F.regexp_extract(t, p, gi)))
    for name, branches in seen.items():
        col = F.coalesce(*branches) if len(branches) > 1 else branches[0]
        if casts[name] is not None:
            col = col.try_cast(casts[name])
        out = out.withColumn(name, col)
    return out
