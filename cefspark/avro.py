"""Avro Object Container File codec (decode + encode), from scratch.

Sibling-codec parity for the logstash codec family
(``logstash-codec-avro``): Spark ships the Avro JAVA library jar but not
the ``spark-avro`` datasource module, so this implements the PUBLIC Avro
1.x spec directly — container layout (``Obj\\x01`` magic, metadata map
with schema JSON + codec, 16-byte sync marker, blocks of
``(record_count, byte_size, payload)``), binary encoding (zigzag varint
ints/longs, little-endian IEEE float/double, length-prefixed bytes/
strings, records as field concatenation, arrays/maps as signed-count
blocks, unions as branch-index + value, enums as index, fixed as raw
bytes), and the ``null``/``deflate`` codecs (deflate = RAW DEFLATE,
no zlib header — ``zlib…wbits=-15``).

Tests round-trip against this module's own writer, pin a hand-built
byte-level golden file, and — when the JVM is up — differentially verify
against the bundled ``org.apache.avro`` reader through the session
gateway, so the byte format is proven against the reference
implementation, not just self-consistent.

Spark mapping: container blobs are rows of a ``binary`` column
(``binaryFile`` scan or a message-bus capture table); ``decode_avro``
explodes records via one ``mapInPandas`` (no shuffle, error-as-data),
projecting only requested fields. At 100 TB the schema lives in the
driver (broadcast implicitly via the UDF closure); payload bytes never
leave executors.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator
from typing import Any, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

__all__ = ["MAGIC", "build_container", "decode_avro", "parse_container",
           "read_avro", "schema_of", "synthesize_avro_assets"]

MAGIC = b"Obj\x01"


# ------------------------------------------------------------------------------
# Binary primitives (Avro spec §binary encoding)
# ------------------------------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = z = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("EOF inside varint")
        b = raw[0]
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (z >> 1) ^ -(z & 1)  # un-zigzag


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _need(buf: io.BytesIO, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("truncated avro data")
    return b


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative byte-length")
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("EOF inside bytes")
    return b


def _branch_accepts(branch: Any, v: Any) -> bool:
    """Spec-faithful union resolution: match the VALUE'S TYPE to the
    branch, not merely null vs non-null."""
    bt = branch["type"] if isinstance(branch, dict) else branch
    if bt == "null":
        return v is None
    if v is None:
        return False
    if bt == "boolean":
        return isinstance(v, bool)
    if bt in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if bt in ("float", "double"):
        return isinstance(v, float)
    if bt == "string":
        return isinstance(v, str)
    if bt in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if bt in ("record", "map"):
        return isinstance(v, dict)
    if bt == "array":
        return isinstance(v, (list, tuple))
    if bt == "enum":
        return isinstance(v, str)
    return False


def _write_datum(out: io.BytesIO, schema: Any, v: Any) -> None:
    s = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(s, list):  # union: branch index + datum
        for i, branch in enumerate(s):
            if _branch_accepts(branch, v):
                _write_long(out, i)
                return _write_datum(out, branch, v)
        raise ValueError(f"no union branch for {v!r}")
    if s == "null":
        return
    if s == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif s in ("int", "long"):
        _write_long(out, int(v))
    elif s == "float":
        out.write(struct.pack("<f", v))
    elif s == "double":
        out.write(struct.pack("<d", v))
    elif s == "bytes":
        _write_bytes(out, v)
    elif s == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif s == "record":
        for f in schema["fields"]:
            _write_datum(out, f["type"], v[f["name"]])
    elif s == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _write_datum(out, schema["items"], item)
        _write_long(out, 0)
    elif s == "map":
        if v:
            _write_long(out, len(v))
            for k, item in v.items():
                _write_bytes(out, k.encode("utf-8"))
                _write_datum(out, schema["values"], item)
        _write_long(out, 0)
    elif s == "enum":
        _write_long(out, schema["symbols"].index(v))
    elif s == "fixed":
        if len(v) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(v)
    else:
        raise ValueError(f"unsupported schema {s!r}")


def _read_datum(buf: io.BytesIO, schema: Any) -> Any:
    s = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(s, list):
        idx = _read_long(buf)
        if not 0 <= idx < len(s):
            raise ValueError("union branch out of range")
        return _read_datum(buf, s[idx])
    if s == "null":
        return None
    if s == "boolean":
        raw = buf.read(1)
        if not raw:
            raise ValueError("EOF in boolean")
        return raw[0] == 1
    if s in ("int", "long"):
        return _read_long(buf)
    if s == "float":
        return struct.unpack("<f", _need(buf, 4))[0]
    if s == "double":
        return struct.unpack("<d", _need(buf, 8))[0]
    if s == "bytes":
        return _read_bytes(buf)
    if s == "string":
        return _read_bytes(buf).decode("utf-8")
    if s == "record":
        return {f["name"]: _read_datum(buf, f["type"])
                for f in schema["fields"]}
    if s == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count block: byte size follows
                _read_long(buf)
                n = -n
            for _ in range(n):
                before = buf.tell()
                out.append(_read_datum(buf, schema["items"]))
                if buf.tell() == before:
                    # zero-width item + attacker-controlled count (up to
                    # ~2^62) would spin this loop forever; a corrupt blob
                    # must yield one typed error row instead (ADVICE r6)
                    raise ValueError("zero-byte array item with nonzero count")
    if s == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                before = buf.tell()
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_datum(buf, schema["values"])
                if buf.tell() == before:
                    raise ValueError("zero-byte map entry with nonzero count")
    if s == "enum":
        idx = _read_long(buf)
        if not 0 <= idx < len(schema["symbols"]):
            # mirror the union-branch range check: a negative zigzag index
            # must be a typed error, not Python negative indexing silently
            # returning the wrong symbol (ADVICE r6)
            raise ValueError("enum index out of range")
        return schema["symbols"][idx]
    if s == "fixed":
        return _need(buf, schema["size"])
    raise ValueError(f"unsupported schema {s!r}")


# ------------------------------------------------------------------------------
# Container layout
# ------------------------------------------------------------------------------

def build_container(schema: dict, records: list, codec: str = "null",
                    sync: bytes = b"\x00" * 16,
                    records_per_block: int = 1000) -> bytes:
    """Serialize records into a spec-conformant Object Container File."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null|deflate")
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("ascii")}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    for i in range(0, max(len(records), 1), records_per_block):
        block = records[i:i + records_per_block]
        if not block:
            break
        body = io.BytesIO()
        for r in block:
            _write_datum(body, schema, r)
        payload = body.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # strip zlib framing
        _write_long(out, len(block))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def parse_container(payload: bytes) -> tuple[dict, list]:
    """Walk a container: verify magic + per-block sync markers, inflate,
    decode every record. Returns (schema, records)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("bad magic")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("EOF in sync marker")
    records = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        if count < 0 or size < 0:
            raise ValueError("negative block header")
        body = buf.read(size)
        if len(body) != size:
            raise ValueError("EOF inside block")
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        bb = io.BytesIO(body)
        for _ in range(count):
            before = bb.tell()
            records.append(_read_datum(bb, schema))
            if bb.tell() == before:
                # a zero-field-record schema plus a huge varint count would
                # spin effectively forever consuming nothing; corrupt blobs
                # must stay one typed error row (ADVICE r6)
                raise ValueError("zero-byte datum in block")
        if bb.read(1):
            raise ValueError("trailing bytes inside block")
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


def schema_of(payload: bytes) -> dict:
    """Header-only schema extraction (blocks never decoded)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("bad magic")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    return json.loads(meta["avro.schema"].decode("utf-8"))


# ------------------------------------------------------------------------------
# Spark surface
# ------------------------------------------------------------------------------

def decode_avro(df: DataFrame, fields: list[str],
                payload_col: str = "payload",
                id_col: str = "asset_id") -> DataFrame:
    """Explode container blobs into one row per record, projecting
    ``fields`` (rendered as strings; cast downstream) — error-as-data:
    a corrupt container yields ONE row with ``error`` set."""
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("payload"))
    out_schema = StructType(
        [StructField("asset_id", StringType()),
         StructField("record_idx", LongType())]
        + [StructField(n, StringType()) for n in fields]
        + [StructField("error", StringType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    _, records = parse_container(bytes(payload))
                except Exception as e:
                    rows.append((aid, -1, *([None] * len(fields)),
                                 f"{type(e).__name__}: {e}"))
                    continue
                for i, r in enumerate(records):
                    rows.append((aid, i,
                                 *[None if r.get(n) is None else str(r[n])
                                   for n in fields], None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              out_schema.fields])

    return src.mapInPandas(gen, schema=out_schema)


def read_avro(spark: SparkSession, path: str, fields: list[str]) -> DataFrame:
    """Read ``*.avro`` container files under ``path`` via a binaryFile scan
    + :func:`decode_avro` (file = asset)."""
    blobs = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias("asset_id"),
                     F.col("content").alias("payload")))
    return decode_avro(blobs, fields)


# ------------------------------------------------------------------------------
# Deterministic fixtures (shared closed forms for the gate oracle)
# ------------------------------------------------------------------------------

FIXTURE_SCHEMA = {
    "type": "record", "name": "Turn", "fields": [
        {"name": "turn_id", "type": "long"},
        {"name": "role", "type": {"type": "enum", "name": "Role",
                                  "symbols": ["user", "assistant", "tool"]}},
        {"name": "text", "type": "string"},
        {"name": "score", "type": ["null", "long"]},
    ]}


def fixture_record(i: int, j: int) -> dict:
    return {
        "turn_id": i * 1000 + j,
        "role": ["user", "assistant", "tool"][(i + j) % 3],
        "text": f"turn-{i}-{j}",
        "score": None if (i + j) % 5 == 0 else (i * 7 + j) % 100,
    }


def synthesize_avro_assets(spark: SparkSession, n: int) -> DataFrame:
    """``n`` container blobs, executor-built; every 3rd is deflate-coded
    and every 4th splits records across two blocks (multi-block walk)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                i = int(raw)
                cnt = 1 + i % 7
                recs = [fixture_record(i, j) for j in range(cnt)]
                rows.append((f"av-{i:06d}", build_container(
                    FIXTURE_SCHEMA, recs,
                    codec="deflate" if i % 3 == 0 else "null",
                    sync=bytes(range(16)),
                    records_per_block=3 if i % 4 == 0 else 1000)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    schema = StructType([StructField("asset_id", StringType()),
                         StructField("payload", BinaryType())])
    return spark.range(0, n, 1, min(16, max(1, n // 10))).mapInPandas(
        gen, schema=schema)
