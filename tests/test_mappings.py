"""Field-dictionary tests (reference: cef.rb:416-576, docs/index.asciidoc:96-393)."""

from cefspark.mappings import Mappings, cef_fields, get_mappings


def test_field_table_size():
    fields = cef_fields()
    # 119 named + 15*8 numbered custom = 239 (cef.rb:421-551, 465-476)
    assert len(fields) == 239
    assert len({f.name for f in fields}) == 239


def test_spot_mappings_disabled():
    m = get_mappings(ecs_mode=False)
    assert m.decode_map["src"] == "sourceAddress"
    assert m.decode_map["dst"] == "destinationAddress"
    assert m.decode_map["spt"] == "sourcePort"
    assert m.decode_map["sourceAddress"] == "sourceAddress"
    assert m.decode_map["cs1"] == "deviceCustomString1"
    assert m.decode_map["cfp15Label"] == "deviceCustomFloatingPoint15Label"
    assert m.decode_map["reason"] == "Reason"
    # legacy pass-through as-provided in disabled mode (cef.rb:566)
    assert m.decode_map["destinationLatitude"] == "destinationLatitude"
    assert m.timestamp_fields == frozenset()


def test_spot_mappings_ecs():
    m = get_mappings(ecs_mode=True)
    assert m.decode_map["src"] == "[source][ip]"
    assert m.decode_map["sourceAddress"] == "[source][ip]"
    assert m.decode_map["rt"] == "@timestamp"
    assert m.decode_map["destinationLatitude"] == "[destination][geo][location][lat]"
    assert m.decode_map["c6a12"] == "[cef][device_custom_ipv6_address_12][value]"
    # 8 timestamp-flagged fields (cef.rb:570); fileCreateTime is NOT flagged (cef.rb:502)
    assert m.timestamp_fields == frozenset({
        "[event][created]", "@timestamp", "[event][end]", "[file][mtime]",
        "[event][ingested]", "[cef][old_file][created]", "[cef][old_file][mtime]",
        "[event][start]",
    })
    assert "[file][created]" not in m.timestamp_fields


def test_encode_mapping_priority_collision():
    # sourceDnsDomain (priority 10) must beat sourceNtDomain for the shared
    # ECS name [source][registered_domain] (cef.rb:530,535,552)
    m = get_mappings(ecs_mode=True)
    assert m.encode_map["[source][registered_domain]"] == "sourceDnsDomain"
    assert m.encode_map["[destination][registered_domain]"] == "destinationDnsDomain"
    rev = get_mappings(ecs_mode=True, reverse_mapping=True)
    # sourceDnsDomain has no abbreviated key, so key == name
    assert rev.encode_map["[source][ip]"] == "src"
    assert rev.encode_map["sourceAddress"] == "src"


def test_device_parameterization():
    host = Mappings(ecs_mode=True, device="host")
    obs = Mappings(ecs_mode=True, device="observer")
    assert host.decode_map["dvc"] == "[host][ip]"
    assert obs.decode_map["dvc"] == "[observer][ip]"
    assert host.decode_map["deviceHostName"] == "[host][name]"
    assert obs.decode_map["deviceHostName"] == "[observer][hostname]"
    assert host.decode_map["deviceExternalId"] == "[host][id]"
    assert obs.decode_map["deviceExternalId"] == "[observer][name]"


def test_encode_map_disabled_identity_and_reverse():
    m = get_mappings(ecs_mode=False)
    assert m.encode_map["sourceAddress"] == "sourceAddress"
    assert m.encode_map["destinationLongitude"] == "destinationLongitude"
    rev = get_mappings(ecs_mode=False, reverse_mapping=True)
    assert rev.encode_map["sourceAddress"] == "src"
    assert rev.encode_map["destinationLongitude"] == "dlong"


def test_decode_map_values_are_array_rewrite_fixed_points():
    """The hot decode loop skips the D13 array-key regex for map-expanded
    keys (parser.py) — legal only while every decode_map value is a fixed
    point of EXT_KEY_ARRAY_CAPTURE: ECS bracket refs start with '[' (the
    ^([^\\[\\]]+) anchor can't match) and v1 long names carry no trailing
    ']'. Any future mapping entry that breaks this must fail here."""
    from cefspark.parser import EXT_KEY_ARRAY_CAPTURE

    for ecs in (False, True):
        for device in ("observer", "host"):
            m = get_mappings(ecs, False, device)
            for v in m.decode_map.values():
                assert EXT_KEY_ARRAY_CAPTURE.sub(r"[\1]\2", v) == v, v
