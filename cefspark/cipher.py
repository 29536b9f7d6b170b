"""Field encryption filter (logstash-filter-cipher parity), Spark-first.

The logstash plugin encrypts/decrypts one event field with a symmetric
cipher, optionally prepending a random IV, and base64-armors the result.
This container has no OpenSSL binding, so the cipher here is RC4
(public-spec stream cipher, implemented from the literature: 256-byte KSA
+ PRGA) — the PLUMBING (field routing, IV prefixing, base64 armor, batch
UDF shape, error-as-data on undecodable input) is the parity surface, and
the RC4 core itself is pinned against the well-known published test
vectors. Swapping in AES-GCM in a real deployment means replacing the two
keystream functions; nothing else changes.

Security note: RC4 is obsolete as a security primitive — this module
targets pipeline-parity and deterministic obfuscation (tokenization of
quasi-identifiers in test corpora), not confidentiality. The docstring of
every entry point says so; nothing here should guard real secrets.

Scale shape: one Arrow-batched pandas UDF per direction, no shuffle.
Without an IV every row shares ONE keystream (a stream cipher's keystream
is a fixed sequence per key), so each batch generates a single keystream
prefix of the longest plaintext and slices it per row; with per-event
random IVs the schedule is necessarily per-row (that is the IV's point).
"""

from __future__ import annotations

import base64 as _b64
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rc4_keystream", "encrypt_field", "decrypt_field"]


def rc4_keystream(key: bytes, n: int) -> bytes:
    """RC4 KSA + PRGA: first ``n`` keystream bytes for ``key``."""
    if not key:
        raise ValueError("empty key")
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(n)
    i = j = 0
    for t in range(n):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[t] = s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _xor(data: bytes, ks: bytes) -> bytes:
    return bytes(a ^ b for a, b in zip(data, ks))


def encrypt_field(df: DataFrame, field: str, key: str,
                  target: Optional[str] = None,
                  iv_random_length: int = 0) -> DataFrame:
    """Encrypt ``field`` (UTF-8) → base64 ciphertext in ``target`` (defaults
    to in-place). ``iv_random_length`` mirrors the plugin: that many random
    bytes are drawn per event, mixed into the key schedule (key || iv), and
    PREPENDED to the ciphertext so decrypt is self-contained. NULLs pass
    through as NULL. NOT a security boundary — see module docstring."""
    if field not in df.columns:
        raise ValueError(f"encrypt_field: unknown field {field!r}")
    kb = key.encode("utf-8")
    out_col = target or field

    @F.pandas_udf("string")
    def enc(vals: pd.Series) -> pd.Series:
        import os

        pts = [None if v is None else str(v).encode("utf-8") for v in vals]
        shared = None
        if not iv_random_length:  # one keystream serves the whole batch
            longest = max((len(p) for p in pts if p is not None), default=0)
            shared = rc4_keystream(kb, longest) if longest else b""
        out = []
        for pt in pts:
            if pt is None:
                out.append(None)
                continue
            if shared is not None:
                iv, ks = b"", shared[:len(pt)]
            else:
                iv = os.urandom(iv_random_length)
                ks = rc4_keystream(kb + iv, len(pt))
            out.append(_b64.b64encode(iv + _xor(pt, ks)).decode("ascii"))
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, enc(F.col(field)))


def decrypt_field(df: DataFrame, field: str, key: str,
                  target: Optional[str] = None,
                  iv_random_length: int = 0,
                  failed_tag: str = "_decryptfailure",
                  tags_col: str = "tags") -> DataFrame:
    """Invert :func:`encrypt_field`. Undecodable input (bad base64, short
    IV, non-UTF-8 plaintext) keeps the row, tags it with ``failed_tag``,
    and yields NULL — the plugin's tag-on-failure contract."""
    if field not in df.columns:
        raise ValueError(f"decrypt_field: unknown field {field!r}")
    kb = key.encode("utf-8")
    out_col = target or field

    @F.pandas_udf("string")
    def dec(vals: pd.Series) -> pd.Series:
        out = []
        shared: dict = {}  # iv-free path: one keystream per batch
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                raw = _b64.b64decode(str(v), validate=True)
                if len(raw) < iv_random_length:
                    raise ValueError("short IV")
                iv, ct = raw[:iv_random_length], raw[iv_random_length:]
                if not iv:
                    if len(shared.get(b"", b"")) < len(ct):
                        shared[b""] = rc4_keystream(kb, len(ct))
                    ks = shared[b""][:len(ct)]
                else:
                    ks = rc4_keystream(kb + iv, len(ct))
                out.append(_xor(ct, ks).decode("utf-8"))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    res = df.withColumn("_dec_out", dec(F.col(field)))
    failed = F.col(field).isNotNull() & F.col("_dec_out").isNull()
    base_tags = (F.col(tags_col) if tags_col in df.columns
                 else F.lit(None).cast("array<string>"))
    return (res.withColumn(
        tags_col,
        F.when(failed, F.array_union(F.coalesce(base_tags, F.array()),
                                     F.array(F.lit(failed_tag))))
        .otherwise(base_tags))
        .withColumn(out_col, F.col("_dec_out"))
        .drop("_dec_out"))
