"""CEF encode: events -> CEF-formatted lines.

From-scratch batch implementation of the encode semantics of the reference
codec (/root/reference/lib/logstash/codecs/cef.rb:330-355 and the sanitizers
at cef.rb:144-162, 580-648). Operates on batches (list of event dicts or a
pandas DataFrame); wrapped into an Arrow-batched pandas UDF by
:mod:`cefspark.udfs`.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np
import pandas as pd

from .mappings import Mappings, get_mappings

# header sanitizer (cef.rb:144-151, 580-584): \r\n -> \n first, then
# \ -> \\, | -> \|, \n -> ' ', \r -> ' '
_HEADER_SAN = re.compile(r"\\|\||\n|\r")
_HEADER_SAN_MAP = {"\\": "\\\\", "|": "\\|", "\n": " ", "\r": " "}

# extension value sanitizer (cef.rb:155-162, 596-600): \r\n -> \n first, then
# \ -> \\, = -> \=, \n -> '\n' literal, \r -> '\n' literal
_EXT_SAN = re.compile(r"\\|=|\n|\r")
_EXT_SAN_MAP = {"\\": "\\\\", "=": "\\=", "\n": "\\n", "\r": "\\n"}

# extension keys must be alphanumeric (cef.rb:588-591)
_KEY_SAN = re.compile(r"[^a-zA-Z0-9]")

# %{fieldref} sprintf-style interpolation (Logstash event templating)
_SPRINTF = re.compile(r"%\{([^}]+)\}")

_DEFAULTS = {
    "vendor": "Elasticsearch",
    "product": "Logstash",
    "version": "1.0",
    "signature": "Logstash",
    "name": "Logstash",
    "severity": "6",
}


def sanitize_header_field(value: Any) -> str:
    s = "" if value is None else str(value)
    s = s.replace("\r\n", "\n")
    return _HEADER_SAN.sub(lambda m: _HEADER_SAN_MAP[m.group(0)], s)


def sanitize_extension_key(value: Any) -> str:
    return _KEY_SAN.sub("", "" if value is None else str(value))


def sanitize_extension_val(value: Any) -> str:
    s = "" if value is None else str(value)
    s = s.replace("\r\n", "\n")
    return _EXT_SAN.sub(lambda m: _EXT_SAN_MAP[m.group(0)], s)


def valid_severity(sev: Any) -> bool:
    """Integer-valued number within [0, 10] (cef.rb:641-648)."""
    try:
        f = float(sev)
    except (TypeError, ValueError):
        return False
    return not math.isnan(f) and f % 1 == 0 and 0 <= f <= 10


@dataclass
class EncoderConfig:
    """Encode-side plugin configuration (cef.rb:27-60). Header settings
    support ``%{field}`` interpolation against the event."""

    vendor: str = _DEFAULTS["vendor"]
    product: str = _DEFAULTS["product"]
    version: str = _DEFAULTS["version"]
    signature: str = _DEFAULTS["signature"]
    name: str = _DEFAULTS["name"]
    severity: str = _DEFAULTS["severity"]
    fields: Sequence[str] = field(default_factory=list)
    reverse_mapping: bool = False
    ecs_mode: bool = False
    device: str = "observer"
    delimiter: str = ""

    def mappings(self) -> Mappings:
        return get_mappings(self.ecs_mode, self.reverse_mapping, self.device)


def _sprintf(template: str, event: dict) -> str:
    """Interpolate %{field} from the event; unknown fields render the
    template fragment verbatim (Logstash sprintf behavior)."""

    def repl(m: re.Match) -> str:
        v = event.get(m.group(1))
        return m.group(0) if v is None else str(v)

    return _SPRINTF.sub(repl, template)


def _json_default(val: Any) -> Any:
    """json.dumps fallback for non-JSON elements inside complex cells.
    numpy scalars stay numbers and nested ndarrays stay arrays (the reference
    to_json at cef.rb:625-632 keeps numbers and nesting); only genuinely
    non-numeric objects (timestamps etc.) fall back to string rendering."""
    if isinstance(val, np.generic):
        return val.item()
    if isinstance(val, np.ndarray):
        return val.tolist()
    return _stringify(val)


def _stringify(val: Any) -> str:
    """Encode complex values (cef.rb:625-632): list/dict -> JSON, timestamps
    -> ISO8601, everything else str()."""
    if isinstance(val, np.generic):
        val = val.item()
    if isinstance(val, np.ndarray):
        # ArrayType cells cross the Arrow boundary as numpy arrays; ragged
        # array<array<T>> cells arrive as 1-D object ndarrays whose elements
        # are ndarrays — _json_default keeps the inner levels as arrays
        val = val.tolist()
    if isinstance(val, (list, tuple, dict)):
        return json.dumps(val, separators=(",", ":"), ensure_ascii=False,
                          default=_json_default)
    if val is pd.NaT:
        # NaT slips through scalar null filters (it is datetime-typed, and
        # pd.Timestamp(NaT) is NaT again — unguarded, _stringify would recurse
        # forever); render like a nil field would never have been emitted.
        return ""
    if isinstance(val, pd.Timestamp):
        t = val.tz_convert("UTC") if val.tzinfo else val.tz_localize("UTC")
        ms = t.microsecond // 1000
        return f"{t.strftime('%Y-%m-%dT%H:%M:%S')}.{ms:03d}Z"
    if isinstance(val, dt.datetime):
        return _stringify(pd.Timestamp(val))
    return str(val)


def _sanitize_severity(event: dict, template: str) -> str:
    sev = sanitize_header_field(_sprintf(template, event)).strip()
    if not valid_severity(sev):
        sev = _DEFAULTS["severity"]
    return str(int(float(sev)))  # "1.0" -> "1" (Ruby to_i, cef.rb:638)


def encode_event(event: dict, config: Optional[EncoderConfig] = None) -> str:
    """Encode one event dict to a CEF line (cef.rb:330-355)."""
    cfg = config or EncoderConfig()
    maps = cfg.mappings()

    headers = ["CEF:0"]
    for attr in ("vendor", "product", "version", "signature", "name"):
        val = sanitize_header_field(_sprintf(getattr(cfg, attr), event))
        if not val:
            val = _DEFAULTS[attr]  # empty -> plugin default (cef.rb:334-346)
        headers.append(val)
    headers.append(_sanitize_severity(event, cfg.severity))

    pairs = []
    for fieldname in cfg.fields:
        val = event.get(fieldname)
        if val is None or val is pd.NaT:
            continue  # nil skip (cef.rb:352); NaT is the datetime-typed null
        key = maps.encode_map.get(fieldname, fieldname)
        key = sanitize_extension_key(key)
        if isinstance(val, (pd.Timestamp, dt.datetime)):
            pairs.append(f"{key}={_stringify(val)}")  # timestamps not re-sanitized (cef.rb:629)
        else:
            pairs.append(f"{key}={sanitize_extension_val(_stringify(val))}")

    return "|".join(headers) + "|" + " ".join(pairs) + cfg.delimiter


def encode_batch(events: pd.DataFrame, config: Optional[EncoderConfig] = None) -> pd.Series:
    """Encode a batch: each DataFrame row is an event (columns = fields).

    NaN/None cells are absent fields. Returns a Series of CEF lines aligned
    with the input index.

    Batch-specialized implementation of :func:`encode_event` (which remains
    the per-event semantics of record, differentially pinned by
    test_encoder.py's batch-vs-event comparison): everything row-invariant
    is hoisted out of the row loop (r7, guide §4.2) — headers without a
    ``%{field}`` template (the common config) sanitize ONCE per batch, as
    does each extension field's sanitized key and the severity fallback;
    per row only templated headers, null-skips and value sanitizing remain,
    with a no-op fast path when the value contains no sanitized character.
    """
    cfg = config or EncoderConfig()
    maps = cfg.mappings()
    n = len(events)
    idx = events.index
    cols = {c: events[c].to_numpy(dtype=object, copy=False)
            for c in events.columns}

    # headers: constant templates render+sanitize once (sprintf of a
    # template without %{ is the identity; empty -> plugin default)
    hdr_attrs = ("vendor", "product", "version", "signature", "name")
    parts: list = ["CEF:0"]  # str for constants, (attr, template) for %{}
    templated = False
    for attr in hdr_attrs:
        tmpl = getattr(cfg, attr)
        if "%{" not in tmpl:
            parts.append(sanitize_header_field(tmpl) or _DEFAULTS[attr])
        else:
            parts.append((attr, tmpl))
            templated = True
    sev_tmpl = cfg.severity
    const_sev = None if "%{" in sev_tmpl else _sanitize_severity({}, sev_tmpl)

    # the row dict only feeds %{field} lookups; build it lazily per row
    # from just the referenced columns (never the whole row)
    ref_fields = sorted({f for attr in (*hdr_attrs, "severity")
                         for f in _SPRINTF.findall(getattr(cfg, attr))
                         if f in cols})

    # extension fields: sanitized key + column array resolved once
    enc_get = maps.encode_map.get
    ext_fields = [(sanitize_extension_key(enc_get(f, f)) + "=", cols[f])
                  for f in cfg.fields if f in cols]
    ext_san_search = _EXT_SAN.search
    ext_san_sub = _EXT_SAN.sub
    ext_san_map = _EXT_SAN_MAP
    delimiter = cfg.delimiter
    isnan = math.isnan
    NaT = pd.NaT

    def _is_null(v) -> bool:
        return (v is None or v is NaT
                or (isinstance(v, float) and isnan(v)))

    dynamic = templated or const_sev is None
    prefix = "" if dynamic else "|".join([*parts, const_sev])
    out = np.empty(n, dtype=object)
    for i in range(n):
        if dynamic:
            event = {}
            for f in ref_fields:
                v = cols[f][i]
                if not _is_null(v):
                    event[f] = v
            headers = [p if isinstance(p, str) else
                       (sanitize_header_field(_sprintf(p[1], event))
                        or _DEFAULTS[p[0]])
                       for p in parts]
            headers.append(const_sev if const_sev is not None
                           else _sanitize_severity(event, sev_tmpl))
            prefix = "|".join(headers)
        pairs = []
        for key_eq, vals in ext_fields:
            v = vals[i]
            if _is_null(v):
                continue  # nil skip (cef.rb:352); NaT is the datetime null
            if type(v) is str:
                s = v
            elif isinstance(v, (pd.Timestamp, dt.datetime)):
                # timestamps are not re-sanitized (cef.rb:629)
                pairs.append(key_eq + _stringify(v))
                continue
            else:
                s = _stringify(v)
            if "\r\n" in s:
                s = s.replace("\r\n", "\n")
            if ext_san_search(s) is not None:
                s = ext_san_sub(lambda m: ext_san_map[m.group(0)], s)
            pairs.append(key_eq + s)
        out[i] = prefix + "|" + " ".join(pairs) + delimiter
    return pd.Series(out, index=idx, dtype=object)
