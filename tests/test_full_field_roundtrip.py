"""Full field-dictionary round-trips (the reference's long-name / short-name
tables at cef_spec.rb:222-303, extended to all 239 mapped fields) and the
ECS view."""

import pandas as pd
import pytest

from cefspark.encoder import EncoderConfig, encode_event
from cefspark.mappings import cef_fields, get_mappings
from cefspark.parser import DecodeConfig, decode_one


def _event_for_all_fields():
    # deviceTimeZone gets a real zone name (it feeds D15 in ECS decode)
    ev = {}
    for i, f in enumerate(cef_fields()):
        ev[f.name] = "Europe/Moscow" if f.name == "deviceTimeZone" else f"value{i}"
    return ev


@pytest.mark.parametrize("reverse", [False, True])
def test_all_239_fields_roundtrip_disabled_mode(reverse):
    ev = _event_for_all_fields()
    cfg = EncoderConfig(fields=list(ev), reverse_mapping=reverse)
    line = encode_event(ev, cfg)
    dec = decode_one(line)
    assert dec["tags"] is None, dec.get("error")
    for f in cef_fields():
        assert dec[f.name] == ev[f.name], (f.name, reverse)


def test_all_fields_decode_to_ecs_names():
    # when several CEF fields share one ECS target (e.g. agentDnsDomain /
    # agentNtDomain), the LAST pair in payload order wins the event slot —
    # reference behavior (event.set overwrite, cef.rb:317-319). Keep one
    # source per ECS target so expectations are unambiguous.
    m_probe = get_mappings(ecs_mode=True)
    seen_targets: dict = {}
    for f in cef_fields():
        if f.is_timestamp or f.name == "deviceTimeZone":
            continue
        seen_targets[m_probe.decode_map[f.name]] = f  # last writer wins
    ev = {f.name: f"v{i}" for i, f in enumerate(cef_fields())
          if f in seen_targets.values()}
    cfg = EncoderConfig(fields=list(ev))
    line = encode_event(ev, cfg)
    dec = decode_one(line, DecodeConfig(ecs_mode=True))
    assert dec["tags"] is None, dec.get("error")
    m = get_mappings(ecs_mode=True)
    for name, val in ev.items():
        assert dec[m.decode_map[name]] == val, name


def test_short_keys_decode_to_same_fields_as_long_names():
    m = get_mappings()
    keyed = [f for f in cef_fields() if f.key is not None]
    assert len(keyed) >= 50
    pairs = " ".join(f"{f.key}=x{i}" for i, f in enumerate(keyed[:40]))
    dec = decode_one(f"CEF:0|v|p|1|s|n|5|{pairs}")
    for i, f in enumerate(keyed[:40]):
        assert dec[f.name] == f"x{i}"


def test_ecs_view_columns(spark):
    from cefspark import fixtures
    from cefspark.udfs import decode_dataframe, ecs_view

    df = spark.createDataFrame(fixtures.transcripts_pdf(200))
    dec = decode_dataframe(df, config=DecodeConfig(ecs_mode=True, now="2026-08-16T00:00:00Z"))
    v = ecs_view(dec)
    cols = set(v.columns)
    assert {"[observer][vendor]", "[event][severity]", "[cef][version]",
            "[log][syslog][header]", "@timestamp"} <= cols
    row = v.where(v["@timestamp"].isNotNull()).first()
    assert row is not None and row["@timestamp"].year in (2017, 2018, 2021)
