"""The logstash ``syslog_pri`` filter as native Catalyst expressions.

Syslog lines open with an RFC 3164 priority tag ``<PRI>`` where
``PRI = facility * 8 + severity`` (facility 0-23, severity 0-7, so PRI is
0-191). The filter decomposes the number into the two codes plus their
human labels; real pipelines run it right after framing, before the CEF
codec sees the remainder (the codec's own syslog-prelude handling,
cef.rb:58-63 / parser.py:261-263, deals with the TIMESTAMP+HOST part —
this module deals with the ``<PRI>`` byte prefix that precedes it).

Everything compiles to one codegen'd projection: ``regexp_extract`` for
the prefix, integer div/mod for the codes, ``element_at`` on literal
arrays for the labels. No Python at runtime, no shuffle, scan-pushdown
transparent — at 100 TB this stage is a free rider on the framing scan.

Label tables are the filter's documented defaults (public logstash
docs); facility 4 and 10 genuinely share the "security/authorization"
label and 9/15 share "clock" — that is the RFC's table, not a typo.

Error-as-data: a line with no ``<PRI>`` prefix, or a numerically
out-of-range PRI (>191), yields NULL codes/labels and keeps the ORIGINAL
line intact in the message column, mirroring the engine's decode-failure
contract (parser.py D17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FACILITY_LABELS = [
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock",
    "security/authorization", "ftp", "ntp", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
]

SEVERITY_LABELS = [
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug",
]


def parse_syslog_pri(df: DataFrame, col: str = "message",
                     prefix: str = "syslog") -> DataFrame:
    """Split the ``<PRI>`` tag off ``col`` and decompose it.

    Adds five columns (named ``{prefix}_pri``, ``_facility_code``,
    ``_severity_code``, ``_facility``, ``_severity``) and rewrites
    ``col`` to the remainder after the tag. Rows without a well-formed,
    in-range tag get NULLs in all five and keep ``col`` untouched.
    """
    raw = F.regexp_extract(F.col(col), r"^<(\d{1,3})>", 1)
    pri = F.when(raw != "", raw).otherwise(F.lit(None)).try_cast("int")
    pri = F.when(pri <= 191, pri)  # out-of-range -> NULL (error-as-data)
    fac = (pri / 8).cast("int")
    sev = pri % 8
    # the NULL guard is NOT redundant: element_at with a runtime-NULL
    # (non-foldable) index mis-resolves to the LAST element on Spark 4.1
    # (a constant-folded NULL index correctly yields NULL) — negative-index
    # semantics leaking through codegen's null path
    fac_lbl = F.when(fac.isNotNull(), F.element_at(
        F.array(*[F.lit(x) for x in FACILITY_LABELS]), fac + 1))
    sev_lbl = F.when(sev.isNotNull(), F.element_at(
        F.array(*[F.lit(x) for x in SEVERITY_LABELS]), sev.cast("int") + 1))
    rest = F.when(pri.isNotNull(),
                  F.expr(f"substring({col}, length(regexp_extract({col}, "
                         f"'^<[0-9]{{1,3}}>', 0)) + 1)")
                  ).otherwise(F.col(col))
    return df.withColumns({
        f"{prefix}_pri": pri,
        f"{prefix}_facility_code": fac,
        f"{prefix}_severity_code": sev.cast("int"),
        f"{prefix}_facility": fac_lbl,
        f"{prefix}_severity": sev_lbl,
        col: rest,
    })


# ------------------------------------------------------------------------------
# RFC 5424 (the "new" syslog protocol; logstash-input-syslog's other grammar)
# ------------------------------------------------------------------------------

_5424_HEAD = (r"^<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) "
              r"(-|(?:\[[^\]\\]*(?:\\.[^\]\\]*)*\])+)(?: (.*))?$")
_SD_ELEM = r"\[([^\]\\]*(?:\\.[^\]\\]*)*)\]"
_SD_PARAM = r'\S+="(?:[^"\\]|\\.)*"'


def parse_syslog5424(df: DataFrame, col: str = "message") -> DataFrame:
    """Parse RFC 5424 syslog lines: ``<PRI>VERSION TS HOST APP PROCID
    MSGID SD [MSG]`` with full STRUCTURED-DATA decomposition.

    Adds ``pri5424``/``facility5424``/``severity5424``, ``version``,
    ``ts5424`` (timestamp; NULL for the nil ``-``), ``hostname5424``,
    ``appname``, ``procid``, ``msgid`` (nil ``-`` → NULL), ``msg5424``,
    and ``sd_params`` — a ``map<string,string>`` keyed ``<sd-id>/<param>``
    with the spec's escapes (``\\"``, ``\\]``, ``\\\\``) undone. Non-5424
    lines yield NULLs across the board (error-as-data).

    Pure Catalyst: one anchored header regex, ``regexp_extract_all`` for
    elements/params, higher-order ``transform``/``flatten`` +
    ``map_from_entries`` for the SD map — codegen-resident, no UDF, no
    shuffle, so it rides the framing scan like the 3164 filter above.
    """
    line = F.col(col)
    grp = lambda i: F.regexp_extract(line, _5424_HEAD, i)  # noqa: E731
    ok = line.rlike(_5424_HEAD)
    pri = grp(1).cast("int")
    ok = ok & (pri <= 191) & (grp(2).cast("int") >= 1)
    nil = lambda c: F.when(c != "-", c)  # noqa: E731
    sd = grp(8)
    elems = F.regexp_extract_all(sd, F.lit(_SD_ELEM), 1)
    unesc = lambda c: F.regexp_replace(c, r'\\(["\\\]])', r"$1")  # noqa: E731
    entries = F.flatten(F.transform(elems, lambda e: F.transform(
        F.regexp_extract_all(e, F.lit(_SD_PARAM), 0),
        lambda kv: F.struct(
            F.concat(F.substring_index(e, " ", 1), F.lit("/"),
                     F.substring_index(kv, "=", 1)).alias("key"),
            unesc(F.regexp_replace(kv, r'^\S+="(.*)"$', r"$1"))
            .alias("value")))))
    return df.withColumns({
        "pri5424": F.when(ok, pri),
        "facility5424": F.when(ok, F.floor(pri / 8).cast("int")),
        "severity5424": F.when(ok, pri % 8),
        "version": F.when(ok, grp(2).cast("int")),
        "ts5424": F.when(ok, nil(grp(3)).try_cast("timestamp")),
        "hostname5424": F.when(ok, nil(grp(4))),
        "appname": F.when(ok, nil(grp(5))),
        "procid": F.when(ok, nil(grp(6))),
        "msgid": F.when(ok, nil(grp(7))),
        "sd_params": F.when(ok & (sd != "-"), F.map_from_entries(entries)),
        "msg5424": F.when(ok, nil(F.when(grp(9) != "", grp(9)))),
    })
