"""Encode corpus — transliteration of the reference RSpec encode specs
(/root/reference/spec/codecs/cef_spec.rb:16-377) plus round-trip identity
(cef_spec.rb:1038-1089)."""

import pandas as pd
import pytest

from cefspark.encoder import (EncoderConfig, encode_batch, encode_event,
                              sanitize_extension_key, sanitize_extension_val,
                              sanitize_header_field, valid_severity)
from cefspark.parser import DecodeConfig, decode_one


def test_default_header():
    # cef_spec.rb:37-43
    assert encode_event({}) == "CEF:0|Elasticsearch|Logstash|1.0|Logstash|Logstash|6|"


def test_configured_headers():
    cfg = EncoderConfig(vendor="vendor", product="product", version="2.0",
                        signature="signature", name="name", severity="1")
    assert encode_event({}, cfg) == "CEF:0|vendor|product|2.0|signature|name|1|"


def test_sprintf_interpolation():
    # cef_spec.rb:60-92 — %{field} templating in header configs
    cfg = EncoderConfig(vendor="%{vendor_field}", severity="%{sev_field}")
    got = encode_event({"vendor_field": "acme", "sev_field": "3"}, cfg)
    assert got.startswith("CEF:0|acme|Logstash|1.0|Logstash|Logstash|3|")


def test_empty_interpolation_falls_back_to_default():
    # cef.rb:334-346
    cfg = EncoderConfig(vendor="%{missing...}")
    # unresolvable sprintf renders the pattern (Logstash behavior) — but an
    # empty *resolved* value falls back to the default:
    cfg2 = EncoderConfig(vendor="%{v}")
    assert encode_event({"v": ""}, cfg2).split("|")[1] == "Elasticsearch"


@pytest.mark.parametrize("sev,expected", [
    ("0", "0"), ("10", "10"), ("5", "5"),
    ("1.0", "1"),          # integer-valued float -> to_i (cef_spec.rb:105)
    ("-1", "6"), ("11", "6"), ("5.4", "6"), ("foo", "6"), ("", "6"),  # invalid -> default
])
def test_severity_validation_matrix(sev, expected):
    # cef_spec.rb:94-128
    cfg = EncoderConfig(severity=sev)
    assert encode_event({}, cfg).split("|")[6] == expected


def test_extension_fields_and_nil_skip():
    # cef_spec.rb:130-144
    cfg = EncoderConfig(fields=["foo", "missing", "bar"])
    got = encode_event({"foo": "foo value", "bar": "bar value"}, cfg)
    assert got.endswith("|foo=foo value bar=bar value")


def test_reverse_mapping_uses_short_keys():
    # cef_spec.rb:222-303
    cfg = EncoderConfig(fields=["sourceAddress", "sourcePort"], reverse_mapping=True)
    got = encode_event({"sourceAddress": "1.2.3.4", "sourcePort": "80"}, cfg)
    assert got.endswith("|src=1.2.3.4 spt=80")


def test_long_name_mapping_default():
    cfg = EncoderConfig(fields=["sourceAddress"])
    got = encode_event({"sourceAddress": "1.2.3.4"}, cfg)
    assert got.endswith("|sourceAddress=1.2.3.4")


def test_ecs_name_encodes_to_cef_name():
    # cef_spec.rb:231-259 — ECS field refs map back to CEF names
    cfg = EncoderConfig(fields=["[source][ip]"], ecs_mode=True)
    got = encode_event({"[source][ip]": "1.2.3.4"}, cfg)
    assert got.endswith("|sourceAddress=1.2.3.4")


def test_header_sanitization():
    # cef_spec.rb:146-160: pipes/backslashes escaped, newlines -> space
    cfg = EncoderConfig(name="bar|baz")
    assert encode_event({}, cfg).split("|")[5:7] == ["bar\\", "baz"]
    assert sanitize_header_field("back\\slash") == "back\\\\slash"
    assert sanitize_header_field("multi\nline") == "multi line"
    assert sanitize_header_field("crlf\r\nline") == "crlf line"
    assert sanitize_header_field("equals=ok") == "equals=ok"


def test_extension_value_sanitization():
    # cef_spec.rb:162-174
    assert sanitize_extension_val("back\\slash") == "back\\\\slash"
    assert sanitize_extension_val("eq=uals") == "eq\\=uals"
    assert sanitize_extension_val("multi\nline") == "multi\\nline"
    assert sanitize_extension_val("crlf\r\nline") == "crlf\\nline"
    assert sanitize_extension_val("cr\rline") == "cr\\nline"


def test_extension_key_sanitization():
    # cef.rb:588-591
    assert sanitize_extension_key("f o.o[0]") == "foo0"


def test_valid_severity_truth_table():
    # cef_spec.rb:306-377
    for v, exp in [("5", True), ("0", True), ("10", True), ("10.0", True),
                   ("5.4", False), ("-1", False), ("11", False),
                   ("", False), ("foo", False), (None, False)]:
        assert valid_severity(v) is exp, v


def test_json_encoding_of_complex_values():
    # cef_spec.rb:176-207
    cfg = EncoderConfig(fields=["arr", "hash"])
    got = encode_event({"arr": ["a", "b"], "hash": {"k": "v"}}, cfg)
    assert 'arr=["a","b"]' in got
    assert 'hash={"k":"v"}' in got.replace("\\=", "=")  # '=' inside JSON is sanitized


def test_timestamp_encoding():
    # cef_spec.rb:209-215
    cfg = EncoderConfig(fields=["ts"])
    got = encode_event({"ts": pd.Timestamp("2021-03-24T22:06:31.694", tz="UTC")}, cfg)
    assert got.endswith("|ts=2021-03-24T22:06:31.694Z")


def test_delimiter_appended():
    cfg = EncoderConfig(delimiter="\r\n")
    assert encode_event({}, cfg).endswith("|\r\n")


def test_encode_batch_frame():
    df = pd.DataFrame({"sourceAddress": ["1.1.1.1", None], "sourcePort": ["80", "443"]})
    got = encode_batch(df, EncoderConfig(fields=["sourceAddress", "sourcePort"]))
    assert got[0].endswith("|sourceAddress=1.1.1.1 sourcePort=80")
    assert got[1].endswith("|sourcePort=443")  # None skipped


# --- round-trip identity (cef_spec.rb:1038-1089) ------------------------------

@pytest.mark.parametrize("reverse", [False, True])
def test_roundtrip_encode_then_decode(reverse):
    fields = {
        "deviceAction": "blocked a shady thing",
        "sourceAddress": "1.2.3.4",
        "sourcePort": "1232",
        "destinationAddress": "5.6.7.8",
        "message": "this is a message with = signs and \\ backslashes",
    }
    cfg = EncoderConfig(vendor="security", product="threatmanager", version="1.0",
                        signature="100", name="trojan successfully stopped",
                        severity="10", fields=list(fields), reverse_mapping=reverse)
    line = encode_event(fields, cfg)
    decoded = decode_one(line)
    assert decoded["tags"] is None, decoded.get("error")
    assert decoded["deviceVendor"] == "security"
    assert decoded["severity"] == "10"
    for k, v in fields.items():
        assert decoded[k] == v, k


def test_roundtrip_header_escapes():
    cfg = EncoderConfig(vendor="ven|dor", product="pro\\duct", name="na\nme")
    line = encode_event({}, cfg)
    decoded = decode_one(line)
    assert decoded["deviceVendor"] == "ven|dor"
    assert decoded["deviceProduct"] == "pro\\duct"
    assert decoded["name"] == "na me"  # newline sanitized to space on encode


def test_nat_timestamp_cells_are_skipped_not_recursed():
    # a null TimestampType cell reaches encode_batch as pd.NaT; it must be
    # dropped like any nil field (cef.rb:352), not crash with RecursionError
    df = pd.DataFrame({
        "sourceAddress": ["1.2.3.4", "5.6.7.8"],
        "endTime": [pd.Timestamp("2025-01-02T03:04:05.678", tz="UTC"), pd.NaT],
    })
    lines = encode_batch(df, EncoderConfig(fields=["sourceAddress", "endTime"]))
    assert lines.iloc[0].endswith("sourceAddress=1.2.3.4 endTime=2025-01-02T03:04:05.678Z")
    assert lines.iloc[1].endswith("sourceAddress=5.6.7.8")
    assert "endTime" not in lines.iloc[1]
