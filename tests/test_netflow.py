"""NetFlow v5 codec: wire-byte decode parity, traps, and error-as-data."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cefspark import netflow


def test_builder_emits_spec_layout():
    p = netflow.build_packet_v5(3)
    version, count = struct.unpack(">HH", p[:4])
    assert version == 5 and count == netflow.packet_count(3)
    assert len(p) == 24 + count * 48  # i=3 not a trailing-garbage packet


def test_trailing_garbage_only_on_every_5th():
    for i in (0, 5, 10, 2, 7):
        p = netflow.build_packet_v5(i)
        extra = len(p) - 24 - netflow.packet_count(i) * 48
        assert extra == (12 if i % 5 == 0 else 0)


def test_decode_recovers_every_field(spark):
    df = netflow.decode_netflow(netflow.synthesize_netflow_assets(spark, 40))
    rows = {(r.asset_id, r.record_idx): r for r in df.collect()}
    total = sum(netflow.packet_count(i) for i in range(40))
    assert len(rows) == total
    for i in (0, 5, 13, 39):
        for j in range(netflow.packet_count(i)):
            r = rows[(f"nf-{i:06d}", j)]
            assert r.error is None
            assert r.flow_sequence == i * 100
            assert r.unix_secs == 1_700_000_000 + i * 60
            for k, v in netflow.record_fields(i, j).items():
                assert getattr(r, k) == v, (i, j, k)


def test_count_honored_over_datagram_length(spark):
    # i=5 carries 12 trailing bytes: len//48 would over-read by 0.25 records
    # and a length-derived count would crash or fabricate a record.
    df = netflow.decode_netflow(netflow.synthesize_netflow_assets(spark, 6))
    got = (df.where(F.col("asset_id") == "nf-000005")
             .agg(F.count("*").alias("n")).collect()[0].n)
    assert got == netflow.packet_count(5)


def test_malformed_packets_become_error_rows(spark):
    bad_version = bytearray(netflow.build_packet_v5(1))
    bad_version[0:2] = struct.pack(">H", 9)
    truncated = netflow.build_packet_v5(2)[:-20]
    df = spark.createDataFrame(
        [("ok", netflow.build_packet_v5(0)),
         ("bad_ver", bytes(bad_version)),
         ("short", b"\x00\x05"),
         ("trunc", truncated)],
        "asset_id string, payload binary")
    out = netflow.decode_netflow(df)
    errs = {r.asset_id: r.error for r in out.where(F.col("error").isNotNull())
            .collect()}
    assert errs == {"bad_ver": "unsupported_version:9",
                    "short": "short_header",
                    "trunc": "truncated_records"}
    ok = out.where(F.col("error").isNull())
    assert ok.count() == netflow.packet_count(0)
    # error rows carry NULL record fields, not garbage
    assert all(r.srcaddr is None for r in
               out.where(F.col("error").isNotNull()).collect())


def test_meta_reports_header_and_trailing(spark):
    meta = {r.asset_id: r for r in netflow.extract_netflow_meta(
        netflow.synthesize_netflow_assets(spark, 12)).collect()}
    for i in range(12):
        r = meta[f"nf-{i:06d}"]
        assert r.error is None
        assert r.version == 5 and r["count"] == netflow.packet_count(i)
        assert r.sys_uptime == 3_600_000 + i * 1000
        assert r.engine_id == i % 4
        assert r.n_trailing_bytes == (12 if i % 5 == 0 else 0)


def test_count_ceiling_rejected():
    p = bytearray(netflow.build_packet_v5(0))
    p[2:4] = struct.pack(">H", 31)
    _, err = netflow._parse_header(bytes(p))
    assert err == "count_exceeds_spec:31"
