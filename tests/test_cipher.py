"""Cipher filter: published RC4 vectors, round-trip, IV, failure tagging."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from cefspark import cipher
from cefspark.cipher import rc4_keystream


def _rc4(key: bytes, pt: bytes) -> bytes:
    ks = rc4_keystream(key, len(pt))
    return bytes(a ^ b for a, b in zip(pt, ks))


def test_published_rc4_vectors():
    # The classic published RC4 known-answer vectors.
    assert _rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert _rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (_rc4(b"Secret", b"Attack at dawn").hex().upper()
            == "45A01F645FC35B383552544B9BF5")


def test_keystream_rfc6229_40bit():
    # RFC 6229, key 0x0102030405, keystream offset 0..15.
    ks = rc4_keystream(bytes([1, 2, 3, 4, 5]), 16)
    assert ks.hex() == "b2396305f03dc027ccc3524a0a1118a8"


def test_roundtrip_no_iv(spark):
    df = spark.createDataFrame(
        [("hello world",), ("héllo ünïcode ✓",), (None,)], "msg string")
    enc = cipher.encrypt_field(df, "msg", key="k3y", target="ct")
    dec = cipher.decrypt_field(enc, "ct", key="k3y", target="pt")
    rows = dec.collect()
    got = {r.msg: (r.pt, r.tags) for r in rows}
    assert got["hello world"] == ("hello world", None)
    assert got["héllo ünïcode ✓"] == ("héllo ünïcode ✓", None)
    assert got[None] == (None, None)
    # ciphertext is real armor, not passthrough
    assert all(r.ct != r.msg for r in rows if r.msg is not None)


def test_roundtrip_with_random_iv_differs_per_row(spark):
    df = spark.createDataFrame([("same text",), ("same text",)],
                               "msg string")
    enc = cipher.encrypt_field(df, "msg", key="k", iv_random_length=8,
                               target="ct")
    cts = [r.ct for r in enc.collect()]
    assert cts[0] != cts[1]  # random IV → distinct ciphertexts
    dec = cipher.decrypt_field(enc, "ct", key="k", iv_random_length=8,
                               target="pt")
    assert [r.pt for r in dec.collect()] == ["same text", "same text"]


def test_in_place_and_failure_tagging(spark):
    good = base64.b64encode(_rc4(b"k", b"ok")).decode()
    df = spark.createDataFrame(
        [("a", good), ("b", "!!!not-base64!!!"), ("c", None)],
        "id string, payload string")
    out = cipher.decrypt_field(df, "payload", key="k")
    rows = {r.id: r for r in out.collect()}
    assert rows["a"].payload == "ok" and rows["a"].tags is None
    assert rows["b"].payload is None
    assert rows["b"].tags == ["_decryptfailure"]
    assert rows["c"].payload is None and rows["c"].tags is None


def test_wrong_key_garbage_is_tagged_or_mojibake_never_plaintext(spark):
    df = spark.createDataFrame([("top secret message",)], "msg string")
    enc = cipher.encrypt_field(df, "msg", key="right", target="ct")
    dec = cipher.decrypt_field(enc, "ct", key="wrong", target="pt")
    r = dec.collect()[0]
    assert r.pt != "top secret message"


def test_unknown_field_raises(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError):
        cipher.encrypt_field(df, "nope", key="k")
    with pytest.raises(ValueError):
        cipher.decrypt_field(df, "nope", key="k")
