"""Property-based round-trip: encode∘decode is identity for every encodable
event (the generalized form of cef_spec.rb:1038-1089)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cefspark.encoder import EncoderConfig, encode_event, sanitize_extension_key
from cefspark.mappings import get_mappings
from cefspark.parser import decode_one

# extension values the CEF wire format can carry: the encoder sanitizes
# backslash/equals/newlines; anything except "" (nil-skip ambiguity) and
# strings that are pure whitespace (trailing-ws is consumed by the separator
# grammar, matching the reference) must round-trip exactly.
_VALUE = st.text(
    alphabet=st.sampled_from(list("abz AZ09|\\=.:[]/\n\r\t,;'\"!?-_う")),
    min_size=1, max_size=40,
).filter(lambda v: v.strip(" \t") == v and v)

_HEADER = st.text(
    alphabet=st.sampled_from(list("abz AZ09|\\=.:")), min_size=1, max_size=20,
).filter(lambda v: v.strip() == v)

_KEYS = ["alpha", "beta_2", "sourceAddress", "message", "requestUrl", "cn7"]


@settings(max_examples=250, deadline=None)
@given(st.dictionaries(st.sampled_from(_KEYS), _VALUE, min_size=0, max_size=6),
       _HEADER, _HEADER, st.integers(min_value=0, max_value=10),
       st.booleans())
def test_encode_decode_identity(fields, vendor, name, severity, reverse):
    cfg = EncoderConfig(vendor=vendor, product="prod", version="1.0",
                        signature="sig", name=name, severity=str(severity),
                        fields=list(fields), reverse_mapping=reverse)
    line = encode_event(fields, cfg)
    dec = decode_one(line)
    assert dec["tags"] is None, (line, dec.get("error"))
    # headers: newlines were sanitized to spaces on encode; values here have
    # none, so identity holds
    assert dec["deviceVendor"] == vendor
    assert dec["name"] == name
    assert dec["severity"] == str(severity)
    maps = get_mappings(reverse_mapping=reverse)
    for k, v in fields.items():
        # the wire key is mapped (reverse -> short key) then stripped to
        # alphanumerics (cef.rb:588-591, 617-623); decode re-expands it
        wire_key = sanitize_extension_key(maps.encode_map.get(k, k))
        decoded_key = maps.decode_map.get(wire_key, wire_key)
        # encode canonicalizes \r\n and \r to \n (cef.rb:596-600)
        expected = v.replace("\r\n", "\n").replace("\r", "\n")
        assert dec[decoded_key] == expected, (k, decoded_key, line)
