"""Declarative filter-chain compiler: a logstash-config-shaped list of
filter specs compiled into one DataFrame transformation chain.

Logstash's product surface IS its config file — ``filter { grok {...}
mutate {...} translate {...} }``. This module gives a reference user the
same shape against this engine: a JSON/YAML-friendly list of
``{"<filter>": {<options>}}`` dicts, applied in order. Each entry
delegates to the already-gated library operator — this file contains NO
parsing/transform logic of its own, only the dispatch table, so the
correctness story is exactly the per-operator gates'.

    from cefspark.config import apply_filters
    out = apply_filters(df, [
        {"grok":      {"match": "%{COMMONAPACHELOG}", "source": "text"}},
        {"mutate":    {"ops": [["convert", "response", "integer"],
                               ["remove", "ident"]]}},
        {"translate": {"source": "response", "target": "klass",
                       "dictionary": {"200": "ok"}, "default": "err"}},
        {"syslog_pri": {"source": "text"}},
        {"csv":       {"source": "rec", "schema": "a INT, b STRING"}},
        {"de_dot":    {}},
        {"prune":     {"whitelist": ["^(text|klass|a|b)$"]}},
        {"drop":      {"where": "klass = 'err'"}},
    ])

Conditions (``drop.where``, ``split``'s field, …) are SQL expression
strings — ``F.expr`` — because a config file can't carry Column objects.
Everything compiles to the same single-projection plans the operators
are plan-pinned to; the chain adds no shuffles beyond what the
operators themselves declare.

Unknown filter names and unknown option keys raise immediately
(config typos must fail the pipeline at COMPILE time, not silently
skip a security redaction at 100 TB).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _opts(spec: dict, allowed: set, name: str) -> dict:
    extra = set(spec) - allowed
    if extra:
        raise ValueError(f"{name}: unknown option(s) {sorted(extra)}; "
                         f"allowed: {sorted(allowed)}")
    return spec


def _f_grok(df, o):
    from .grok import grok_parse, grok_parse_any
    _opts(o, {"match", "source", "anchored", "keep_unmatched",
              "pattern_definitions"}, "grok")
    pats = o["match"]
    src = o.get("source", "text")
    kw = {"anchored": o.get("anchored", True),
          "keep_unmatched": o.get("keep_unmatched", True)}
    if isinstance(pats, list):
        return grok_parse_any(df, pats, text_col=src, **kw)
    return grok_parse(df, pats, text_col=src,
                      extra_patterns=o.get("pattern_definitions"), **kw)


def _f_dissect(df, o):
    from .dissect import dissect_parse
    _opts(o, {"mapping", "source", "keep_unmatched"}, "dissect")
    return dissect_parse(df, o["mapping"], text_col=o.get("source", "text"),
                         keep_unmatched=o.get("keep_unmatched", True))


def _f_kv(df, o):
    from .kv import kv_extract
    _opts(o, {"keys", "source", "field_split", "value_split", "prefix"}, "kv")
    return kv_extract(df, o["keys"], text_col=o.get("source", "text"),
                      field_split=o.get("field_split", " "),
                      value_split=o.get("value_split", "="),
                      prefix=o.get("prefix", ""))


def _f_mutate(df, o):
    from .mutate import mutate
    _opts(o, {"ops"}, "mutate")
    return mutate(df, [tuple(op) for op in o["ops"]])


def _f_translate(df, o):
    from .mutate import translate
    _opts(o, {"source", "target", "dictionary", "default", "regex"},
          "translate")
    return translate(df, o["source"], o["dictionary"], o["target"],
                     default=o.get("default"), regex=o.get("regex", False))


def _f_csv(df, o):
    from .structured import parse_csv_field
    _opts(o, {"source", "schema", "separator", "quote", "target"}, "csv")
    return parse_csv_field(df, o.get("source", "message"), o["schema"],
                           sep=o.get("separator", ","),
                           quote=o.get("quote", '"'),
                           target=o.get("target"))


def _f_xml(df, o):
    from .structured import parse_xml_field
    _opts(o, {"source", "schema", "target"}, "xml")
    return parse_xml_field(df, o.get("source", "message"), o["schema"],
                           target=o.get("target"))


def _f_syslog_pri(df, o):
    from .syslog_pri import parse_syslog_pri
    _opts(o, {"source", "prefix"}, "syslog_pri")
    return parse_syslog_pri(df, o.get("source", "message"),
                            prefix=o.get("prefix", "syslog"))


def _f_prune(df, o):
    from .mutate import prune
    _opts(o, {"whitelist", "blacklist"}, "prune")
    return prune(df, whitelist=o.get("whitelist"),
                 blacklist=o.get("blacklist"))


def _f_de_dot(df, o):
    from .mutate import de_dot
    _opts(o, {"separator"}, "de_dot")
    return de_dot(df, sep=o.get("separator", "_"))


def _f_drop(df, o):
    from .pipeline import drop_events
    _opts(o, {"where", "percentage", "hash_cols"}, "drop")
    return drop_events(df, F.expr(o["where"]),
                       percentage=o.get("percentage"),
                       hash_cols=o.get("hash_cols"))


def _f_clone(df, o):
    from .pipeline import clone_events
    _opts(o, {"clones", "type_col"}, "clone")
    return clone_events(df, o["clones"],
                        type_col=o.get("type_col", "clone_type"))


def _f_split(df, o):
    from .pipeline import split_events
    _opts(o, {"field", "terminator", "keep_empty"}, "split")
    return split_events(df, o["field"], sep=o.get("terminator", "\n"),
                        keep_empty=o.get("keep_empty", False))


def _f_metricize(df, o):
    from .pipeline import metricize
    _opts(o, {"metrics", "metric_col", "value_col", "drop"}, "metricize")
    return metricize(df, o["metrics"],
                     metric_col=o.get("metric_col", "metric"),
                     value_col=o.get("value_col", "value"),
                     drop=o.get("drop", True))


def _f_useragent(df, o):
    from .useragent import parse_user_agent
    _opts(o, {"source", "prefix"}, "useragent")
    return parse_user_agent(df, o.get("source", "user_agent"),
                            prefix=o.get("prefix", "ua_"))


def _f_urldecode(df, o):
    from .mutate import mutate
    _opts(o, {"field"}, "urldecode")
    return mutate(df, [("urldecode", o["field"])])


def _f_truncate(df, o):
    from .mutate import mutate
    _opts(o, {"field", "length_bytes"}, "truncate")
    return mutate(df, [("truncate", o["field"], o["length_bytes"])])


def _f_date(df, o):
    from .structured import parse_date_field
    _opts(o, {"source", "match", "target"}, "date")
    return parse_date_field(df, o.get("source", "message"), o["match"],
                            target=o.get("target", "event_ts"))


def _f_fingerprint(df, o):
    from .redact import fingerprint_fields
    _opts(o, {"sources", "method", "target", "concatenate_sources", "key"},
          "fingerprint")
    return fingerprint_fields(df, o["sources"],
                              method=o.get("method", "SHA256"),
                              target=o.get("target", "fingerprint"),
                              concatenate_sources=o.get(
                                  "concatenate_sources", True),
                              key=o.get("key"))


def _f_aggregate(df, o):
    from .pipeline import aggregate_tasks
    _opts(o, {"task_id", "map_col", "ts_col", "order_cols"}, "aggregate")
    return aggregate_tasks(df, o["task_id"], o.get("map_col", "map"),
                           ts_col=o.get("ts_col", "ts"),
                           order_cols=o.get("order_cols"))


def _f_syslog5424(df, o):
    from .syslog_pri import parse_syslog5424
    _opts(o, {"field"}, "syslog5424")
    return parse_syslog5424(df, o.get("field", "message"))


def _f_cipher(df, o):
    from .cipher import decrypt_field, encrypt_field
    _opts(o, {"mode", "field", "key", "target", "iv_random_length"},
          "cipher")
    mode = o.get("mode", "encrypt")
    kwargs = dict(target=o.get("target"),
                  iv_random_length=int(o.get("iv_random_length", 0)))
    if mode == "encrypt":
        return encrypt_field(df, o["field"], o["key"], **kwargs)
    if mode == "decrypt":
        return decrypt_field(df, o["field"], o["key"], **kwargs)
    raise ValueError(f"cipher: mode must be encrypt|decrypt, got {mode!r}")


def _f_range(df, o):
    from .pipeline import range_check
    _opts(o, {"ranges", "negate", "tags_col"}, "range")
    return range_check(df, [tuple(r) for r in o["ranges"]],
                       negate=bool(o.get("negate", False)),
                       tags_col=o.get("tags_col", "tags"))


def _f_dns(df, o):
    from .dnsres import dns_lookup, dns_resolve_udf, fake_resolver
    _opts(o, {"field", "lookup", "name_col", "addr_col", "target",
              "failed_tag", "resolver"}, "dns")
    common = {k: o[k] for k in ("target", "failed_tag") if k in o}
    if "lookup" in o:
        return dns_lookup(df, o["field"], o["lookup"],
                          name_col=o.get("name_col", "name"),
                          addr_col=o.get("addr_col", "addr"), **common)
    resolver = o.get("resolver")
    if resolver == "fake":
        resolver = fake_resolver
    if not callable(resolver):
        raise ValueError("dns: need a 'lookup' DataFrame or a callable "
                         "'resolver' (or the literal 'fake' for tests)")
    return dns_resolve_udf(df, o["field"], resolver, **common)


FILTERS = {
    "date": _f_date,
    "fingerprint": _f_fingerprint, "aggregate": _f_aggregate,
    "grok": _f_grok, "dissect": _f_dissect, "kv": _f_kv,
    "mutate": _f_mutate, "translate": _f_translate, "csv": _f_csv,
    "xml": _f_xml, "syslog_pri": _f_syslog_pri, "prune": _f_prune,
    "de_dot": _f_de_dot, "drop": _f_drop, "clone": _f_clone,
    "split": _f_split, "metricize": _f_metricize,
    "useragent": _f_useragent, "urldecode": _f_urldecode,
    "truncate": _f_truncate, "range": _f_range, "dns": _f_dns,
    "cipher": _f_cipher, "syslog5424": _f_syslog5424,
}


def apply_filters(df: DataFrame, filters: list[dict[str, Any]]) -> DataFrame:
    """Apply an ordered list of ``{"<filter>": {<options>}}`` specs."""
    for i, entry in enumerate(filters):
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(f"filter #{i} must be a single-key dict "
                             f"{{name: options}}, got {entry!r}")
        (name, opts), = entry.items()
        fn = FILTERS.get(name)
        if fn is None:
            raise ValueError(f"filter #{i}: unknown filter {name!r}; "
                             f"known: {sorted(FILTERS)}")
        df = fn(df, dict(opts or {}))
    return df
