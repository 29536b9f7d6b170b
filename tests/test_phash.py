"""Perceptual image hashing: reference parity, invariances, banded pairs."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from cefspark import multimodal


def _bmp_from(arr: np.ndarray) -> bytes:
    """24-bpp grayscale BMP whose DECODED top-down raster equals ``arr``."""
    h, w = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    px = bytearray()
    for y in range(h):  # file stores bottom row first
        row = bytearray()
        for x in range(w):
            v = int(arr[h - 1 - y][x])
            row += bytes((v, v, v))
        row += b"\x00" * (row_bytes - 3 * w)
        px += row
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    return bytes(header + info + px)


def _hashes(spark, named_arrays):
    df = spark.createDataFrame(
        [(name, _bmp_from(a)) for name, a in named_arrays],
        "asset_id string, payload binary")
    return {r.asset_id: r for r in
            multimodal.perceptual_hashes(df).collect()}


def _ref_hash(arr: np.ndarray, grid: int = 8):
    h, w = arr.shape
    g = arr.astype(np.int64)
    ys = (np.arange(grid) * h) // grid
    d = g[ys][:, (np.arange(grid + 1) * w) // (grid + 1)]
    a = g[ys][:, (np.arange(grid) * w) // grid]
    drows = ((d[:, 1:] > d[:, :-1]) << np.arange(grid)).sum(axis=1)
    arows = ((a * grid * grid >= a.sum()) << np.arange(grid)).sum(axis=1)
    return [int(v) for v in drows], [int(v) for v in arows]


def test_matches_independent_reference(spark):
    rng = np.random.RandomState(7)
    arrays = [(f"a{i}", rng.randint(0, 256, size=(11 + i, 13 + 2 * i)))
              for i in range(4)]
    got = _hashes(spark, arrays)
    for name, arr in arrays:
        dref, aref = _ref_hash(arr)
        assert got[name].dhash_rows == dref
        assert got[name].ahash_rows == aref
        assert got[name].dhash_hex == "".join(f"{v:02x}" for v in dref)


def test_dhash_invariant_under_brightness_shift(spark):
    rng = np.random.RandomState(3)
    base = rng.randint(30, 200, size=(32, 32))
    got = _hashes(spark, [("base", base), ("bright", base + 40)])
    assert got["base"].dhash_hex == got["bright"].dhash_hex
    assert got["base"].ahash_hex == got["bright"].ahash_hex  # mean shifts too


def test_near_dup_small_perturbation(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(64, 64))
    tweaked = base.copy()
    tweaked[5:8, 5:8] = 255  # small localized edit
    unrelated = rng.randint(0, 256, size=(64, 64))
    got = _hashes(spark, [("a", base), ("b", tweaked), ("c", unrelated)])

    def dist(x, y):
        return bin(int(x, 16) ^ int(y, 16)).count("1")

    assert dist(got["a"].dhash_hex, got["b"].dhash_hex) <= 6
    assert dist(got["a"].dhash_hex, got["c"].dhash_hex) > 10


def test_banded_pairs_exact_at_small_distance(spark):
    # 40 deterministic 64-bit hashes + planted near pairs; banding with
    # max_dist=3 < n_bands=4 must find EXACTLY the brute-force pairs.
    rng = np.random.RandomState(5)
    vals = [int(rng.randint(0, 2**31)) << 33 | int(rng.randint(0, 2**31))
            for _ in range(40)]
    vals += [vals[0] ^ 0b101, vals[7] ^ (1 << 50), vals[12] ^ 0]
    hexes = [f"{v:016x}" for v in vals]
    ids = [f"h{i:03d}" for i in range(len(hexes))]
    brute = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            if bin(vals[i] ^ vals[j]).count("1") <= 3:
                brute.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert len(brute) >= 3
    df = spark.createDataFrame(list(zip(ids, hexes)),
                               "asset_id string, dhash_hex string")
    got = {(r.id_a, r.id_b)
           for r in multimodal.phash_hamming_pairs(df, max_dist=3).collect()}
    assert got == brute


def test_grid_bounds_validated(spark):
    df = spark.createDataFrame([("x", b"")], "asset_id string, payload binary")
    with pytest.raises(ValueError):
        multimodal.perceptual_hashes(df, grid=1)


def test_hamming_pairs_rejects_non64bit_digests(spark):
    df = spark.createDataFrame([("a", "ff"), ("b", "0f")],
                               "asset_id string, dhash_hex string")
    with pytest.raises(Exception) as ei:
        multimodal.phash_hamming_pairs(df).collect()
    assert "16-hex" in str(ei.value)
    with pytest.raises(ValueError):
        multimodal.phash_hamming_pairs(df, n_bands=3)
