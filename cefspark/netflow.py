"""NetFlow v5 export-packet codec (decode side), Spark-first.

Sibling-codec parity for the logstash codec family (the reference repo is
``logstash-codec-cef``; ``logstash-codec-netflow`` handles this format in the
same ecosystem).  The v5 wire layout is the public Cisco NetFlow export
format: a 24-byte big-endian header (version, record count, sysUptime,
unix_secs, unix_nsecs, flow_sequence, engine type/id, sampling interval)
followed by ``count`` fixed 48-byte flow records.

Spark mapping: packets arrive as an opaque ``binary`` column (one packet per
row, e.g. from a ``binaryFile`` scan or a UDP-capture table).  Decoding is a
``mapInPandas`` pass — per Arrow batch, each packet's record block is viewed
through ONE ``numpy.frombuffer`` structured-dtype cast (vectorized across all
records of the packet; no per-field Python loop), then exploded to one output
row per flow record.  Header-only extraction (:func:`extract_netflow_meta`)
avoids materializing records when only packet metadata is needed.

Scale notes: the decode is embarrassingly parallel (no shuffle), output rows
are ~25× smaller than a naive string rendering, and malformed packets become
error-as-data rows (``error`` column) instead of task failures, so one bad
datagram can't kill a 100-TB backfill.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType)

__all__ = [
    "HEADER_LEN", "RECORD_LEN", "build_packet_v5", "decode_netflow",
    "extract_netflow_meta", "packet_count", "record_fields",
    "synthesize_netflow_assets",
]

HEADER_LEN = 24
RECORD_LEN = 48

# v5 header, big-endian (public Cisco layout).
_HDR_DTYPE = np.dtype([
    ("version", ">u2"), ("count", ">u2"), ("sys_uptime", ">u4"),
    ("unix_secs", ">u4"), ("unix_nsecs", ">u4"), ("flow_sequence", ">u4"),
    ("engine_type", "u1"), ("engine_id", "u1"), ("sampling_interval", ">u2"),
])

# v5 flow record, big-endian, 48 bytes.
_REC_DTYPE = np.dtype([
    ("srcaddr", ">u4"), ("dstaddr", ">u4"), ("nexthop", ">u4"),
    ("input", ">u2"), ("output", ">u2"),
    ("d_pkts", ">u4"), ("d_octets", ">u4"),
    ("first", ">u4"), ("last", ">u4"),
    ("srcport", ">u2"), ("dstport", ">u2"),
    ("pad1", "u1"), ("tcp_flags", "u1"), ("prot", "u1"), ("tos", "u1"),
    ("src_as", ">u2"), ("dst_as", ">u2"),
    ("src_mask", "u1"), ("dst_mask", "u1"), ("pad2", ">u2"),
])

assert _HDR_DTYPE.itemsize == HEADER_LEN
assert _REC_DTYPE.itemsize == RECORD_LEN


# ------------------------------------------------------------------------------
# Deterministic fixture (shared formulas: builder, tests, and the DuckDB oracle
# restate these independently — a hash match proves the byte walk).
# ------------------------------------------------------------------------------

def packet_count(i: int) -> int:
    """Record count of fixture packet ``i``."""
    return 1 + i % 13


def record_fields(i: int, j: int) -> dict:
    """Closed-form field values for record ``j`` of fixture packet ``i``."""
    return {
        "srcaddr": (10 << 24) + (i * 251 + j * 7) % 65536,
        "dstaddr": (192 << 24) + (168 << 16) + (i * 13 + j * 101) % 65536,
        "nexthop": 0,
        "input": j % 4, "output": (j + 1) % 4,
        "d_pkts": 1 + (i * 7 + j) % 100,
        "d_octets": 40 + (i * 31 + j * 17) % 1400,
        "first": 3_600_000 + i * 1000 - 1000 - j,
        "last": 3_600_000 + i * 1000 - j,
        "srcport": 1024 + (i * 17 + j * 29) % 50000,
        "dstport": 443 if (i + j) % 2 == 0 else 80,
        "tcp_flags": 0x1B, "prot": 17 if (i + j) % 3 == 0 else 6, "tos": 0,
        "src_as": (i * 3 + j) % 64512, "dst_as": (i * 5 + j * 11) % 64512,
        "src_mask": 24, "dst_mask": 16,
    }


def build_packet_v5(i: int) -> bytes:
    """Serialize fixture packet ``i`` as real NetFlow v5 wire bytes.

    Structural trap: every 5th packet carries trailing garbage after its
    records — receivers must honor the header's record COUNT, never infer it
    from the datagram length (fixed-stride ``len//48`` guessing fails here).
    """
    import struct

    cnt = packet_count(i)
    hdr = struct.pack(
        ">HHIIIIBBH", 5, cnt, 3_600_000 + i * 1000,
        1_700_000_000 + i * 60, 0, i * 100, 0, i % 4, 0)
    recs = np.zeros(cnt, dtype=_REC_DTYPE)
    for j in range(cnt):
        f = record_fields(i, j)
        for name in f:
            recs[j][name] = f[name]
    tail = b"\xde\xad\xbe\xef" * 3 if i % 5 == 0 else b""
    return hdr + recs.tobytes() + tail


def synthesize_netflow_assets(spark: SparkSession, n: int) -> DataFrame:
    """``n`` fixture packets as (asset_id, payload) rows, built executor-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(f"nf-{int(i):06d}", build_packet_v5(int(i)))
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    schema = StructType([StructField("asset_id", StringType()),
                         StructField("payload", BinaryType())])
    return spark.range(0, n, 1, min(16, max(1, n // 10))).mapInPandas(
        gen, schema=schema)


# ------------------------------------------------------------------------------
# Decode
# ------------------------------------------------------------------------------

_HEADER_FIELDS = ["version", "count", "sys_uptime", "unix_secs", "unix_nsecs",
                  "flow_sequence", "engine_type", "engine_id",
                  "sampling_interval"]

_RECORD_OUT = ["srcaddr", "dstaddr", "nexthop", "input", "output", "d_pkts",
               "d_octets", "first", "last", "srcport", "dstport", "tcp_flags",
               "prot", "tos", "src_as", "dst_as", "src_mask", "dst_mask"]

RECORD_SCHEMA = StructType(
    [StructField("asset_id", StringType()),
     StructField("record_idx", IntegerType()),
     StructField("flow_sequence", LongType()),
     StructField("unix_secs", LongType())]
    + [StructField(n, LongType()) for n in _RECORD_OUT]
    + [StructField("error", StringType())])

META_SCHEMA = StructType(
    [StructField("asset_id", StringType())]
    + [StructField(n, LongType()) for n in _HEADER_FIELDS]
    + [StructField("n_trailing_bytes", LongType()),
       StructField("error", StringType())])


def _parse_header(payload: bytes) -> tuple[Optional[dict], Optional[str]]:
    if payload is None or len(payload) < HEADER_LEN:
        return None, "short_header"
    hdr = np.frombuffer(payload[:HEADER_LEN], dtype=_HDR_DTYPE)[0]
    if int(hdr["version"]) != 5:
        return None, f"unsupported_version:{int(hdr['version'])}"
    cnt = int(hdr["count"])
    if cnt > 30:  # v5 spec ceiling per datagram
        return None, f"count_exceeds_spec:{cnt}"
    if len(payload) < HEADER_LEN + cnt * RECORD_LEN:
        return None, "truncated_records"
    return {n: int(hdr[n]) for n in _HEADER_FIELDS}, None


def decode_netflow(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "asset_id") -> DataFrame:
    """Explode v5 packets into one row per flow record (error-as-data).

    One vectorized structured-dtype cast per packet covers all its records;
    malformed packets yield a single row with ``error`` set and record fields
    NULL (mirrors the CEF decode path's failure-fallback contract,
    SURVEY.md §2.1 D17).
    """
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in RECORD_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                hdr, err = _parse_header(bytes(payload) if payload is not None
                                         else None)
                if err is not None:
                    out["asset_id"].append(aid)
                    out["record_idx"].append(-1)
                    out["error"].append(err)
                    for n in ("flow_sequence", "unix_secs", *_RECORD_OUT):
                        out[n].append(None)
                    continue
                cnt = hdr["count"]
                recs = np.frombuffer(
                    payload, dtype=_REC_DTYPE, count=cnt, offset=HEADER_LEN)
                for name in _RECORD_OUT:
                    out[name].extend(recs[name].astype(np.int64).tolist())
                out["asset_id"].extend([aid] * cnt)
                out["record_idx"].extend(range(cnt))
                out["flow_sequence"].extend([hdr["flow_sequence"]] * cnt)
                out["unix_secs"].extend([hdr["unix_secs"]] * cnt)
                out["error"].extend([None] * cnt)
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=RECORD_SCHEMA)


def extract_netflow_meta(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "asset_id") -> DataFrame:
    """Header-only packet metadata (records never materialized)."""
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else None
                hdr, err = _parse_header(raw)
                if err is not None:
                    rows.append((aid, *([None] * len(_HEADER_FIELDS)),
                                 None, err))
                else:
                    trailing = len(raw) - HEADER_LEN - hdr["count"] * RECORD_LEN
                    rows.append((aid, *(hdr[n] for n in _HEADER_FIELDS),
                                 trailing, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              META_SCHEMA.fields])

    return src.mapInPandas(gen, schema=META_SCHEMA)
