"""MessagePack codec + Fluent forward-protocol decode, from scratch.

Sibling-codec parity for the logstash codec family
(``logstash-codec-msgpack`` / ``logstash-codec-fluent``): no msgpack
library ships in this container, so this implements the PUBLIC
MessagePack spec directly — positive/negative fixint, fixmap/fixarray/
fixstr, nil/bool, bin 8/16/32, float 32/64, uint/int 8-64, str 8/16/32,
array 16/32, map 16/32, and ext types surfaced as ``(code, bytes)``
tuples. The Fluent *forward* wire shapes decode per the protocol spec:
``[tag, time, record]`` (Message mode) and ``[tag, [[time, record], …]]``
(Forward mode, one event per entry).

Spark mapping mirrors the Avro/NetFlow codecs: blobs are rows of a
``binary`` column; ``decode_fluent`` explodes events via one
``mapInPandas`` (no shuffle, error-as-data). A malformed blob yields one
``error`` row instead of a task failure.
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

__all__ = ["decode_fluent", "fixture_event", "pack", "synthesize_fluent_assets",
           "unpack", "unpack_stream"]


# ------------------------------------------------------------------------------
# Pack (writer — fixtures, tests, encode parity)
# ------------------------------------------------------------------------------

def _pack_into(out: io.BytesIO, o: Any) -> None:
    if o is None:
        out.write(b"\xc0")
    elif o is True:
        out.write(b"\xc3")
    elif o is False:
        out.write(b"\xc2")
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.write(bytes((o,)))
        elif -32 <= o < 0:
            out.write(struct.pack("b", o))
        elif 0 <= o <= 0xFF:
            out.write(b"\xcc" + struct.pack("B", o))
        elif 0 <= o <= 0xFFFF:
            out.write(b"\xcd" + struct.pack(">H", o))
        elif 0 <= o <= 0xFFFFFFFF:
            out.write(b"\xce" + struct.pack(">I", o))
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out.write(b"\xcf" + struct.pack(">Q", o))
        elif -0x80 <= o < 0:
            out.write(b"\xd0" + struct.pack("b", o))
        elif -0x8000 <= o < 0:
            out.write(b"\xd1" + struct.pack(">h", o))
        elif -0x80000000 <= o < 0:
            out.write(b"\xd2" + struct.pack(">i", o))
        elif -0x8000000000000000 <= o < 0:
            out.write(b"\xd3" + struct.pack(">q", o))
        else:
            raise ValueError("int out of msgpack range")
    elif isinstance(o, float):
        out.write(b"\xcb" + struct.pack(">d", o))
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.write(bytes((0xA0 | n,)))
        elif n <= 0xFF:
            out.write(b"\xd9" + struct.pack("B", n))
        elif n <= 0xFFFF:
            out.write(b"\xda" + struct.pack(">H", n))
        else:
            out.write(b"\xdb" + struct.pack(">I", n))
        out.write(b)
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out.write(b"\xc4" + struct.pack("B", n))
        elif n <= 0xFFFF:
            out.write(b"\xc5" + struct.pack(">H", n))
        else:
            out.write(b"\xc6" + struct.pack(">I", n))
        out.write(bytes(o))
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.write(bytes((0x90 | n,)))
        elif n <= 0xFFFF:
            out.write(b"\xdc" + struct.pack(">H", n))
        else:
            out.write(b"\xdd" + struct.pack(">I", n))
        for item in o:
            _pack_into(out, item)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.write(bytes((0x80 | n,)))
        elif n <= 0xFFFF:
            out.write(b"\xde" + struct.pack(">H", n))
        else:
            out.write(b"\xdf" + struct.pack(">I", n))
        for k, v in o.items():
            _pack_into(out, k)
            _pack_into(out, v)
    else:
        raise ValueError(f"cannot pack {type(o).__name__}")


def pack(o: Any) -> bytes:
    out = io.BytesIO()
    _pack_into(out, o)
    return out.getvalue()


# ------------------------------------------------------------------------------
# Unpack
# ------------------------------------------------------------------------------

def _need(buf: io.BytesIO, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("truncated msgpack data")
    return b


_EXT_FIX = {0xD4: 1, 0xD5: 2, 0xD6: 4, 0xD7: 8, 0xD8: 16}


def _map_key(buf: io.BytesIO) -> Any:
    """Map keys must be hashable — arrays/maps as keys are a typed decode
    error, not a TypeError escaping the error-as-data contract."""
    k = _unpack_one(buf)
    if isinstance(k, (list, dict)):
        raise ValueError("unhashable msgpack map key (array/map)")
    return k


def _unpack_one(buf: io.BytesIO) -> Any:
    t = _need(buf, 1)[0]
    if t <= 0x7F:
        return t
    if t >= 0xE0:
        return t - 0x100
    if 0x80 <= t <= 0x8F:
        return {_map_key(buf): _unpack_one(buf) for _ in range(t & 0x0F)}
    if 0x90 <= t <= 0x9F:
        return [_unpack_one(buf) for _ in range(t & 0x0F)]
    if 0xA0 <= t <= 0xBF:
        return _need(buf, t & 0x1F).decode("utf-8")
    if t == 0xC0:
        return None
    if t == 0xC2:
        return False
    if t == 0xC3:
        return True
    if t == 0xC4:
        return _need(buf, _need(buf, 1)[0])
    if t == 0xC5:
        return _need(buf, struct.unpack(">H", _need(buf, 2))[0])
    if t == 0xC6:
        return _need(buf, struct.unpack(">I", _need(buf, 4))[0])
    if t == 0xCA:
        return struct.unpack(">f", _need(buf, 4))[0]
    if t == 0xCB:
        return struct.unpack(">d", _need(buf, 8))[0]
    if t == 0xCC:
        return _need(buf, 1)[0]
    if t == 0xCD:
        return struct.unpack(">H", _need(buf, 2))[0]
    if t == 0xCE:
        return struct.unpack(">I", _need(buf, 4))[0]
    if t == 0xCF:
        return struct.unpack(">Q", _need(buf, 8))[0]
    if t == 0xD0:
        return struct.unpack("b", _need(buf, 1))[0]
    if t == 0xD1:
        return struct.unpack(">h", _need(buf, 2))[0]
    if t == 0xD2:
        return struct.unpack(">i", _need(buf, 4))[0]
    if t == 0xD3:
        return struct.unpack(">q", _need(buf, 8))[0]
    if t in _EXT_FIX:
        code = struct.unpack("b", _need(buf, 1))[0]
        return ("ext", code, _need(buf, _EXT_FIX[t]))
    if t == 0xC7:
        n = _need(buf, 1)[0]
        code = struct.unpack("b", _need(buf, 1))[0]
        return ("ext", code, _need(buf, n))
    if t == 0xC8:
        n = struct.unpack(">H", _need(buf, 2))[0]
        code = struct.unpack("b", _need(buf, 1))[0]
        return ("ext", code, _need(buf, n))
    if t == 0xC9:
        n = struct.unpack(">I", _need(buf, 4))[0]
        code = struct.unpack("b", _need(buf, 1))[0]
        return ("ext", code, _need(buf, n))
    if t == 0xD9:
        return _need(buf, _need(buf, 1)[0]).decode("utf-8")
    if t == 0xDA:
        return _need(buf, struct.unpack(">H", _need(buf, 2))[0]).decode("utf-8")
    if t == 0xDB:
        return _need(buf, struct.unpack(">I", _need(buf, 4))[0]).decode("utf-8")
    if t == 0xDC:
        return [_unpack_one(buf)
                for _ in range(struct.unpack(">H", _need(buf, 2))[0])]
    if t == 0xDD:
        return [_unpack_one(buf)
                for _ in range(struct.unpack(">I", _need(buf, 4))[0])]
    if t == 0xDE:
        return {_map_key(buf): _unpack_one(buf)
                for _ in range(struct.unpack(">H", _need(buf, 2))[0])}
    if t == 0xDF:
        return {_map_key(buf): _unpack_one(buf)
                for _ in range(struct.unpack(">I", _need(buf, 4))[0])}
    raise ValueError(f"reserved/unsupported type byte 0x{t:02x}")


def unpack(payload: bytes) -> Any:
    """Decode exactly one object; trailing bytes are an error."""
    buf = io.BytesIO(payload)
    o = _unpack_one(buf)
    if buf.read(1):
        raise ValueError("trailing bytes after object")
    return o


def unpack_stream(payload: bytes) -> list:
    """Decode a concatenated object stream (the fluent wire: back-to-back
    msgpack objects on one connection) until EOF."""
    buf = io.BytesIO(payload)
    out = []
    while True:
        if not buf.read(1):
            return out
        buf.seek(-1, io.SEEK_CUR)
        out.append(_unpack_one(buf))


# ------------------------------------------------------------------------------
# Fluent forward protocol -> event rows
# ------------------------------------------------------------------------------

EVENT_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("event_idx", LongType()),
    StructField("tag", StringType()),
    StructField("time", LongType()),
    StructField("record_json", StringType()),
    StructField("error", StringType()),
])


def _fluent_events(obj: Any) -> list[tuple[str, int, dict]]:
    """One decoded top-level object -> [(tag, time, record)] per the
    forward spec: Message mode [tag, time, record] or Forward mode
    [tag, [[time, record], ...]]."""
    if (not isinstance(obj, list) or len(obj) < 2
            or not isinstance(obj[0], str)):
        raise ValueError("not a fluent message")
    tag = obj[0]
    if isinstance(obj[1], list):  # Forward mode
        return [(tag, int(t), r) for t, r in obj[1]]
    if len(obj) < 3:
        raise ValueError("message mode needs [tag, time, record]")
    return [(tag, int(obj[1]), obj[2])]


def decode_fluent(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "asset_id") -> DataFrame:
    """Explode fluent-forward blobs into one row per event
    (tag, time, record-as-JSON with sorted keys; error-as-data)."""
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    events = []
                    for obj in unpack_stream(bytes(payload)):
                        events.extend(_fluent_events(obj))
                except Exception as e:
                    rows.append((aid, -1, None, None, None,
                                 f"{type(e).__name__}: {e}"))
                    continue
                for i, (tag, t, rec) in enumerate(events):
                    rows.append((aid, i, tag, t,
                                 json.dumps(rec, sort_keys=True,
                                            separators=(",", ":")), None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              EVENT_SCHEMA.fields])

    return src.mapInPandas(gen, schema=EVENT_SCHEMA)


# ------------------------------------------------------------------------------
# Deterministic fixtures (closed forms shared with the gate oracle)
# ------------------------------------------------------------------------------

def fixture_event(i: int, j: int) -> tuple[str, int, dict]:
    return (f"app.svc{i % 5}", 1_700_000_000 + i * 60 + j,
            {"seq": i * 100 + j, "msg": f"m-{i}-{j}",
             "level": ["info", "warn", "error"][(i + j) % 3]})


def synthesize_fluent_assets(spark: SparkSession, n: int) -> DataFrame:
    """``n`` fluent blobs: every even asset uses Forward mode (one
    [tag, [[t, r], ...]] batch), every odd a stream of Message-mode
    objects — both wire shapes decode identically."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                i = int(raw)
                cnt = 1 + i % 6
                evs = [fixture_event(i, j) for j in range(cnt)]
                if i % 2 == 0:
                    blob = pack([evs[0][0], [[t, r] for _, t, r in evs]])
                else:
                    blob = b"".join(pack([tag, t, r]) for tag, t, r in evs)
                rows.append((f"fl-{i:06d}", blob))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    schema = StructType([StructField("asset_id", StringType()),
                         StructField("payload", BinaryType())])
    return spark.range(0, n, 1, min(16, max(1, n // 10))).mapInPandas(
        gen, schema=schema)
