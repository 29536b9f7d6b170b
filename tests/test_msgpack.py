"""MessagePack + fluent forward codec: goldens, round-trips, Spark decode."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from cefspark import msgpackc as m


def test_spec_golden_encodings():
    assert m.pack(7) == b"\x07" and m.pack(-1) == b"\xff"
    assert m.pack(None) == b"\xc0"
    assert m.pack(True) == b"\xc3" and m.pack(False) == b"\xc2"
    assert m.pack("abc") == b"\xa3abc"
    assert m.pack([1, 2]) == b"\x92\x01\x02"
    assert m.pack({"a": 1}) == b"\x81\xa1a\x01"
    assert m.pack(128) == b"\xcc\x80" and m.pack(65535) == b"\xcd\xff\xff"
    assert m.pack(-33) == b"\xd0\xdf"
    assert m.pack(1.5) == b"\xcb" + struct.pack(">d", 1.5)
    assert m.pack(b"\x00\x01") == b"\xc4\x02\x00\x01"


def test_roundtrip_every_width():
    objs = [0, 127, -32, 255, 65535, 2**32 - 1, 2**40, -2**40, 2**63 - 1,
            -2**63, 2**64 - 1, "x" * 31, "x" * 300, "x" * 70000, b"b" * 300,
            list(range(20)), {f"k{i}": i for i in range(20)},
            [None, True, {"n": [1, {"d": 2.25}]}], 3.14159, "héllo ✓"]
    for o in objs:
        assert m.unpack(m.pack(o)) == o, o


def test_ext_and_reserved():
    assert m.unpack(b"\xd6\x01abcd") == ("ext", 1, b"abcd")
    assert m.unpack(b"\xc7\x03\x05xyz") == ("ext", 5, b"xyz")
    with pytest.raises(ValueError):
        m.unpack(b"\xc1")  # reserved
    with pytest.raises(ValueError):
        m.unpack(b"\xa5ab")  # truncated fixstr
    with pytest.raises(ValueError):
        m.unpack(m.pack(1) + b"\x00")  # trailing bytes


def test_stream_decode():
    s = m.pack(1) + m.pack("two") + m.pack([3])
    assert m.unpack_stream(s) == [1, "two", [3]]
    assert m.unpack_stream(b"") == []


def test_spark_decode_both_wire_modes(spark):
    df = m.decode_fluent(m.synthesize_fluent_assets(spark, 20))
    rows = {(r.asset_id, r.event_idx): r for r in df.collect()}
    assert len(rows) == sum(1 + i % 6 for i in range(20))
    for i in (0, 1, 6, 19):  # even = forward batch, odd = message stream
        for j in range(1 + i % 6):
            tag, t, rec = m.fixture_event(i, j)
            r = rows[(f"fl-{i:06d}", j)]
            assert r.error is None
            assert (r.tag, r.time) == (tag, t)
            assert json.loads(r.record_json) == rec


def test_spark_decode_error_as_data(spark):
    good = m.pack(["app.x", 1700000000, {"k": 1}])
    df = spark.createDataFrame(
        [("ok", good), ("reserved", b"\xc1"),
         ("notfluent", m.pack({"just": "a map"}))],
        "asset_id string, payload binary")
    out = m.decode_fluent(df)
    errs = {r.asset_id: r.error for r in out.collect()}
    assert errs["ok"] is None
    assert "reserved" in errs["reserved"] or "0xc1" in errs["reserved"]
    assert "not a fluent message" in errs["notfluent"]


def test_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = (st.none() | st.booleans()
               | st.integers(min_value=-2**63, max_value=2**64 - 1)
               | st.text(max_size=40) | st.binary(max_size=40))
    trees = st.recursive(
        scalars,
        lambda kids: st.lists(kids, max_size=5)
        | st.dictionaries(st.text(max_size=8), kids, max_size=5),
        max_leaves=25)

    @settings(max_examples=150, deadline=None)
    @given(trees)
    def check(o):
        assert m.unpack(m.pack(o)) == o

    check()
