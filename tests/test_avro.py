"""Avro container codec: round-trip, spec goldens, Spark decode, and a
differential against the bundled org.apache.avro JVM reference reader."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cefspark import avro


def test_roundtrip_all_types():
    sch = {"type": "record", "name": "T", "fields": [
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "u", "type": ["null", "double"]},
        {"name": "e", "type": {"type": "enum", "name": "E",
                               "symbols": ["x", "y"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "F3", "size": 3}},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"}]}
    recs = [{"n": -(2**40), "i": 42, "xs": [0, -1, 2**33], "m": {"a": "á"},
             "u": 2.5, "e": "y", "fx": b"abc", "b": True, "raw": b"\x00\xff"},
            {"n": 0, "i": -1, "xs": [], "m": {}, "u": None, "e": "x",
             "fx": b"zzz", "b": False, "raw": b""}]
    for codec in ("null", "deflate"):
        _, out = avro.parse_container(
            avro.build_container(sch, recs, codec=codec))
        assert out == recs, codec


def test_zigzag_varint_spec_values():
    # Avro spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    import io
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                    (64, b"\x80\x01")]:
        b = io.BytesIO()
        avro._write_long(b, n)
        assert b.getvalue() == want, n
        assert avro._read_long(io.BytesIO(want)) == n


def test_container_golden_layout():
    sch = {"type": "record", "name": "R",
           "fields": [{"name": "a", "type": "long"}]}
    blob = avro.build_container(sch, [{"a": 3}], sync=b"S" * 16)
    assert blob[:4] == b"Obj\x01"
    # one block: count=1 (zigzag 02), size=1 (02), datum 3 (06), sync
    assert blob.endswith(b"\x02\x02\x06" + b"S" * 16)
    assert avro.schema_of(blob)["name"] == "R"


def test_corruption_detected():
    sch = {"type": "record", "name": "R",
           "fields": [{"name": "a", "type": "long"}]}
    blob = bytearray(avro.build_container(sch, [{"a": 3}], sync=b"S" * 16))
    with pytest.raises(ValueError, match="bad magic"):
        avro.parse_container(b"Nope" + bytes(blob[4:]))
    blob[-1] = ord("X")  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync marker mismatch"):
        avro.parse_container(bytes(blob))


def test_spark_decode_multiblock_and_deflate(spark):
    df = avro.decode_avro(
        avro.synthesize_avro_assets(spark, 24),
        fields=["turn_id", "role", "text", "score"])
    rows = {(r.asset_id, r.record_idx): r for r in df.collect()}
    assert len(rows) == sum(1 + i % 7 for i in range(24))
    for i in (0, 3, 4, 23):  # multi-block (0,4), deflate (0,3), plain
        for j in range(1 + i % 7):
            r = rows[(f"av-{i:06d}", j)]
            want = avro.fixture_record(i, j)
            assert r.error is None
            assert r.turn_id == str(want["turn_id"])
            assert r.role == want["role"] and r.text == want["text"]
            assert r.score == (None if want["score"] is None
                               else str(want["score"]))


def test_spark_decode_error_as_data(spark):
    good = avro.build_container(
        avro.FIXTURE_SCHEMA, [avro.fixture_record(1, 0)])
    df = spark.createDataFrame(
        [("ok", good), ("bad", b"junkjunkjunk")],
        "asset_id string, payload binary")
    out = avro.decode_avro(df, fields=["turn_id"])
    errs = {r.asset_id: r.error for r in out.collect()}
    assert errs["ok"] is None and "bad magic" in errs["bad"]


def test_read_avro_from_files(spark, tmp_path):
    p = os.path.join(tmp_path, "one.avro")
    with open(p, "wb") as f:
        f.write(avro.build_container(
            avro.FIXTURE_SCHEMA,
            [avro.fixture_record(9, j) for j in range(3)]))
    out = avro.read_avro(spark, str(tmp_path), ["turn_id", "text"])
    assert out.count() == 3
    assert {r.text for r in out.collect()} == {f"turn-9-{j}"
                                               for j in range(3)}


def test_jvm_reference_reads_our_bytes(spark, tmp_path):
    """Differential vs the bundled org.apache.avro reader: our writer's
    bytes must be readable by the reference implementation, record for
    record (proves the format, not just self-consistency)."""
    jvm = spark._jvm
    try:
        jvm.org.apache.avro.file.DataFileReader
    except Exception:
        pytest.skip("avro jar not reachable through the gateway")
    sch = {"type": "record", "name": "KV", "fields": [
        {"name": "k", "type": "string"}, {"name": "n", "type": "long"}]}
    recs = [{"k": f"key-{i}", "n": i * 7 - 3} for i in range(25)]
    for codec in ("null", "deflate"):
        path = os.path.join(tmp_path, f"ours_{codec}.avro")
        with open(path, "wb") as f:
            f.write(avro.build_container(sch, recs, codec=codec,
                                         records_per_block=4))
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader())
        got = []
        while reader.hasNext():
            got.append(json.loads(reader.next().toString()))
        reader.close()
        assert got == recs, codec


def test_our_parser_reads_jvm_bytes(spark, tmp_path):
    """Reverse differential: bytes produced by the reference JVM writer
    (incl. its random sync marker and deflate codec) parse back exactly."""
    jvm = spark._jvm
    try:
        jvm.org.apache.avro.file.DataFileWriter
    except Exception:
        pytest.skip("avro jar not reachable through the gateway")
    sch_json = json.dumps({"type": "record", "name": "KV", "fields": [
        {"name": "k", "type": "string"}, {"name": "n", "type": "long"}]})
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    for codec in ("null", "deflate"):
        path = os.path.join(tmp_path, f"jvm_{codec}.avro")
        w = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(schema))
        if codec == "deflate":
            w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(schema, jvm.java.io.File(path))
        for i in range(10):
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("k", f"key-{i}")
            rec.put("n", jvm.java.lang.Long.parseLong(str(i * 11 - 5)))
            w.append(rec)
        w.close()
        with open(path, "rb") as f:
            _, recs = avro.parse_container(f.read())
        assert recs == [{"k": f"key-{i}", "n": i * 11 - 5}
                        for i in range(10)], codec


def test_union_resolves_by_value_type():
    sch = {"type": "record", "name": "U", "fields": [
        {"name": "v", "type": ["null", "string", "long"]},
        {"name": "w", "type": ["null", "long", "string"]}]}
    recs = [{"v": 5, "w": "hello"}, {"v": "five", "w": 7},
            {"v": None, "w": None}]
    _, out = avro.parse_container(avro.build_container(sch, recs))
    assert out == recs  # 5 stays a long, "hello" stays a string


def test_truncated_float_and_fixed_are_typed_errors():
    import io
    with pytest.raises(ValueError):
        avro._read_datum(io.BytesIO(b"\x00\x01"), "double")
    with pytest.raises(ValueError):
        avro._read_datum(io.BytesIO(b"ab"),
                         {"type": "fixed", "name": "F", "size": 3})
