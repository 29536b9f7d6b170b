"""GeoIP-style CIDR enrichment: ip -> subnet attributes at event scale.

The lookup the logstash `geoip`/`cidr` filters provide, re-expressed as a
Spark join that stays cheap at 100 TB:

- The subnet dimension (CIDR -> attrs) is EXPANDED once into fixed
  ``/prefix_bits`` buckets; each event computes the same bucket from its
  ip (``ip_long >> (32 - prefix_bits)``). The join is then a hash
  EQUI-join on the bucket with the range check as a join filter — never a
  BroadcastNestedLoopJoin over a pure range predicate (test_plans pins the
  BroadcastHashJoin). Same banded-blocking discipline as the LSH joins.
- Longest-prefix-match is resolved ON THE DIMENSION, not per event: CIDR
  blocks either nest or are disjoint (aligned power-of-2 ranges), so the
  expanded dim is swept into DISJOINT intervals whose attrs are the
  innermost covering block's. Every event then matches at most ONE
  interval — no per-event aggregation, no window, no extra shuffle on the
  big side; the sweep shuffles only the (tiny) dimension.
- Malformed ips produce NULL ``ip_long`` and keep NULL attrs under the
  left join (error-as-data, like the decode path).

A GeoIP city dim (~3M blocks) expands to well under executor-broadcast
size at /16; bigger dims can lower ``prefix_bits`` (fewer duplicate rows
per wide block) or skip ``broadcast`` to shuffle the dim side only.

Reference scope note: cef.rb carries no subnet lookup; this is pipeline
surface for the enrich stage (SURVEY.md §2.4 joins family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OCTET = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_IPV4_RE = rf"^{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}$"


def ipv4_to_long(col: F.Column) -> F.Column:
    """Dotted-quad string -> BIGINT in [0, 2^32); NULL on anything that is
    not a well-formed IPv4 (wrong arity, empty octet, octet > 255, junk).
    Pure codegen — regexp gate + split arithmetic, no UDF."""
    ok = col.rlike(_IPV4_RE)
    p = F.split(col, r"\.")
    val = (F.element_at(p, 1).cast("bigint") * 16777216
           + F.element_at(p, 2).cast("bigint") * 65536
           + F.element_at(p, 3).cast("bigint") * 256
           + F.element_at(p, 4).cast("bigint"))
    return F.when(ok, val)


def cidr_bounds(cidr: F.Column):
    """'a.b.c.d/p' -> (start_long, end_long, plen) with the host bits of
    the base address masked off (10.0.0.9/8 means 10.0.0.0/8). NULLs on a
    malformed base ip or prefix outside [0, 32]."""
    base = ipv4_to_long(F.substring_index(cidr, "/", 1))
    plen = F.when(cidr.contains("/"),
                  F.substring_index(cidr, "/", -1).try_cast("int")
                  ).otherwise(F.lit(32))
    plen = F.when((plen >= 0) & (plen <= 32), plen)
    # block size 2^(32-plen): pow is double-exact through 2^32
    block = F.pow(F.lit(2.0), (F.lit(32) - plen)).cast("bigint")
    start = F.floor(base / block) * block
    end = start + block - 1
    return start, end, plen


def expand_cidr_dim(dim: DataFrame, cidr_col: str = "cidr",
                    prefix_bits: int = 16, lpm: bool = True) -> DataFrame:
    """Expand a (cidr, attrs...) dimension into per-bucket DISJOINT ranges:
    ``(_bucket, _start, _end, attrs...)``. A block wider than the bucket
    size appears once per covered bucket (a /8 at /16 buckets -> 256
    rows), clipped to the bucket. With ``lpm`` (default) nested blocks are
    swept into disjoint intervals carrying the innermost block's attrs —
    the longest-prefix-match contract of real routing/GeoIP tables;
    ``lpm=False`` trusts the dim to be disjoint already (cheaper: no
    sweep). Rows with a malformed cidr are dropped.

    All work here is dim-sized; cache/persist the result when enriching
    many frames against one table."""
    if not 0 < prefix_bits <= 32:
        raise ValueError("prefix_bits must be in (0, 32]")
    attrs = [c for c in dim.columns if c != cidr_col]
    if not attrs:
        raise ValueError("dimension has no attribute columns")
    reserved = {"_bucket", "_start", "_end", "_plen"} & set(attrs)
    if reserved:
        raise ValueError(f"attribute columns {sorted(reserved)} collide "
                         "with the expansion's internal names")
    start, end, plen = cidr_bounds(F.col(cidr_col))
    bsize = 1 << (32 - prefix_bits)
    rows = (dim
            .withColumn("_start", start).withColumn("_end", end)
            .withColumn("_plen", plen)
            .where(F.col("_start").isNotNull() & F.col("_plen").isNotNull())
            .withColumn("_bucket", F.explode(F.sequence(
                F.floor(F.col("_start") / bsize),
                F.floor(F.col("_end") / bsize))))
            # clip to the bucket so per-bucket ranges are self-contained
            .withColumn("_start", F.greatest("_start",
                                             F.col("_bucket") * bsize))
            .withColumn("_end", F.least("_end",
                                        F.col("_bucket") * bsize + (bsize - 1))))
    if not lpm:
        return rows.select("_bucket", "_start", "_end", *attrs)
    # boundary sweep per bucket: candidate cut points are every range's
    # start and end+1; consecutive points bound intervals over which the
    # covering set is CONSTANT. CIDR nesting makes the innermost covering
    # block the one with the greatest (start, plen) — pick it with max_by.
    pts = (rows.select("_bucket", F.col("_start").alias("_p"))
           .unionByName(rows.select("_bucket",
                                    (F.col("_end") + 1).alias("_p")))
           .distinct())
    from pyspark.sql.window import Window

    nxt = F.lead("_p").over(Window.partitionBy("_bucket").orderBy("_p"))
    iv = (pts.withColumn("_q", nxt - 1).where(F.col("_q").isNotNull())
          .withColumnRenamed("_p", "_lo"))
    covered = iv.join(rows, ["_bucket"]).where(
        (F.col("_lo") >= F.col("_start")) & (F.col("_lo") <= F.col("_end")))
    win = covered.groupBy("_bucket", "_lo", "_q").agg(
        F.max_by(F.struct(*attrs),
                 F.struct(F.col("_start"), F.col("_plen"))).alias("_w"))
    return win.select("_bucket", F.col("_lo").alias("_start"),
                      F.col("_q").alias("_end"),
                      *[F.col(f"_w.{a}").alias(a) for a in attrs])


def enrich_cidr(df: DataFrame, dim: DataFrame, ip_col: str,
                cidr_col: str = "cidr", prefix_bits: int = 16,
                lpm: bool = True, broadcast: bool = True) -> DataFrame:
    """Left-join subnet attrs onto every row of ``df`` by ip: unmatched
    and malformed ips keep NULL attrs. ``dim`` is (cidr, attrs...) — pass
    a pre-:func:`expand_cidr_dim` frame via the same parameter to amortize
    the expansion (detected by its ``_bucket`` column)."""
    exp = (dim if "_bucket" in dim.columns
           else expand_cidr_dim(dim, cidr_col, prefix_bits, lpm))
    clash = set(exp.columns) & set(df.columns)
    if clash - {"_bucket"}:
        raise ValueError(f"dim attribute columns {sorted(clash)} collide "
                         "with event columns")
    ipl = ipv4_to_long(F.col(ip_col))
    lhs = df.withColumn("_ip_long", ipl).withColumn(
        "_bucket", F.shiftright(F.col("_ip_long"), 32 - prefix_bits))
    rhs = F.broadcast(exp) if broadcast else exp
    joined = lhs.join(
        rhs,
        (lhs["_bucket"] == rhs["_bucket"])
        & (F.col("_ip_long") >= F.col("_start"))
        & (F.col("_ip_long") <= F.col("_end")),
        "left")
    return joined.drop("_bucket", "_start", "_end", "_ip_long")


# ------------------------------------------------------------------------------
# IPv6 (the logstash cidr filter accepts IPv6 blocks; same design, 128-bit)
# ------------------------------------------------------------------------------
#
# 128-bit addresses don't fit a BIGINT, so the v6 path works on FIXED-WIDTH
# 32-char lowercase hex strings: zero-padded hex compares in exactly numeric
# order, so every v4 trick (bucket equi-join, range filter, greatest/least
# clipping, the LPM sweep) carries over with string comparisons. All pure
# Catalyst — split/transform/filter/forall higher-order functions, no UDF.

_HEX_GROUP = r"^[0-9a-f]{1,4}$"


def _side_groups(side: F.Column) -> F.Column:
    """Split one side of '::' into its groups; empty side -> []."""
    return F.when(side == "", F.array().cast("array<string>")) \
            .otherwise(F.split(side, ":"))


def _groups_ok(arr: F.Column) -> F.Column:
    return F.forall(arr, lambda g: g.rlike(_HEX_GROUP))


def _expand_last_v4(arr: F.Column) -> F.Column:
    """If the final group is an embedded dotted-quad ('::ffff:1.2.3.4'),
    replace it with its two hex groups; NULL if it looks like v4 but isn't."""
    last = F.try_element_at(arr, F.lit(-1))
    has4 = F.coalesce(last.contains("."), F.lit(False))
    v4 = ipv4_to_long(last)
    hex8 = F.lpad(F.lower(F.conv(v4.cast("string"), 10, 16)), 8, "0")
    expanded = F.concat(
        F.slice(arr, F.lit(1), F.size(arr) - 1),
        F.array(F.substring(hex8, 1, 4), F.substring(hex8, 5, 4)))
    return (F.when(F.size(arr) == 0, arr)
            .when(has4 & v4.isNotNull(), expanded)
            .when(~has4, arr))


def _join_groups(arr: F.Column) -> F.Column:
    return F.concat_ws("", F.transform(arr, lambda g: F.lpad(g, 4, "0")))


def ipv6_to_hex(col: F.Column) -> F.Column:
    """IPv6 text -> canonical 32-char lowercase hex, or NULL on anything
    malformed (bad chars, >1 '::', wrong group count, empty groups, bad
    embedded IPv4). Accepts full form, '::' compression, and the
    v4-mapped tail. Pure codegen."""
    s = F.lower(F.trim(col))
    shape = s.rlike(r"^[0-9a-f:.]+$")
    parts = F.split(s, "::", -1)
    n = F.size(parts)
    # full form (no '::'): exactly 8 groups after v4-tail expansion
    g_full = _expand_last_v4(_side_groups(F.element_at(parts, 1)))
    full_ok = (g_full.isNotNull() & (F.size(g_full) == 8)
               & _groups_ok(g_full))
    # compressed: left + right < 8 groups, middle zero-filled
    gl = _side_groups(F.element_at(parts, 1))
    gr = _expand_last_v4(_side_groups(F.try_element_at(parts, F.lit(2))))
    comp_ok = (gr.isNotNull() & _groups_ok(gl) & _groups_ok(gr)
               & (F.size(gl) + F.size(gr) <= 7))
    filled = F.concat(
        gl, F.array_repeat(F.lit("0"), 8 - F.size(gl) - F.size(gr)), gr)
    return (F.when(shape & (n == 1) & full_ok, _join_groups(g_full))
             .when(shape & (n == 2) & comp_ok, _join_groups(filled)))


def _hex_at(hexs: F.Column, pos: F.Column) -> F.Column:
    return F.conv(F.substring(hexs, pos, F.lit(1)), 16, 10).cast("int")


def cidr6_bounds(cidr: F.Column):
    """'<ipv6>/p' -> (start_hex, end_hex, plen), host bits masked off.
    Only ONE hex digit straddles the prefix boundary, so masking never
    carries: start = prefix + masked digit + '0'*rest, end = prefix +
    (masked digit | low bits) + 'f'*rest."""
    base = ipv6_to_hex(F.substring_index(cidr, "/", 1))
    plen = F.when(cidr.contains("/"),
                  F.substring_index(cidr, "/", -1).try_cast("int")
                  ).otherwise(F.lit(128))
    plen = F.when((plen >= 0) & (plen <= 128), plen)
    full = F.floor(plen / 4).cast("int")
    rem = (plen % 4).cast("int")
    p2 = F.pow(F.lit(2.0), (4 - rem)).cast("int")  # exact through 16
    digit = _hex_at(base, full + 1)
    keep = F.floor(digit / p2).cast("int") * p2
    hx = lambda c: F.lower(F.conv(c.cast("string"), 10, 16))  # noqa: E731
    prefix = F.substring(base, F.lit(1), full)
    mid_s = F.when(rem > 0, hx(keep)).otherwise(F.lit(""))
    mid_e = F.when(rem > 0, hx(keep + p2 - 1)).otherwise(F.lit(""))
    pad = 32 - full - F.when(rem > 0, 1).otherwise(0)
    start = F.concat(prefix, mid_s, F.repeat(F.lit("0"), pad))
    end = F.concat(prefix, mid_e, F.repeat(F.lit("f"), pad))
    ok = base.isNotNull() & plen.isNotNull()
    return F.when(ok, start), F.when(ok, end), F.when(ok, plen)


def _hex_inc(hexs: F.Column) -> F.Column:
    """Successor of a 32-char hex string (NULL past ffff...f): bump the
    rightmost non-f digit, zero the trailing f-run — no loops, one regexp."""
    k = F.length(F.regexp_extract(hexs, "(f*)$", 1))
    bump = F.lower(F.conv((_hex_at(hexs, 32 - k) + 1).cast("string"), 10, 16))
    inc = F.concat(F.substring(hexs, F.lit(1), 31 - k), bump,
                   F.repeat(F.lit("0"), k))
    return F.when(k < 32, inc)


def expand_cidr6_dim(dim: DataFrame, cidr_col: str = "cidr",
                     prefix_hex: int = 4, lpm: bool = True) -> DataFrame:
    """IPv6 counterpart of :func:`expand_cidr_dim`: per-bucket disjoint
    ranges ``(_bucket, _start, _end, attrs...)`` where the bucket is the
    first ``prefix_hex`` hex chars (4 bits each). Same LPM sweep, with
    string comparisons and the carry-free hex successor."""
    if not 0 < prefix_hex <= 15:  # bucket int must fit a BIGINT
        raise ValueError("prefix_hex must be in (0, 15]")
    attrs = [c for c in dim.columns if c != cidr_col]
    if not attrs:
        raise ValueError("dimension has no attribute columns")
    reserved = {"_bucket", "_start", "_end", "_plen"} & set(attrs)
    if reserved:
        raise ValueError(f"attribute columns {sorted(reserved)} collide "
                         "with the expansion's internal names")
    start, end, plen = cidr6_bounds(F.col(cidr_col))
    w = 32 - prefix_hex
    bnum = lambda h: F.conv(F.substring(h, 1, prefix_hex), 16, 10) \
        .cast("bigint")  # noqa: E731
    rows = (dim
            .withColumn("_start", start).withColumn("_end", end)
            .withColumn("_plen", plen)
            .where(F.col("_start").isNotNull() & F.col("_plen").isNotNull())
            .withColumn("_bucket", F.explode(F.sequence(
                bnum(F.col("_start")), bnum(F.col("_end")))))
            .withColumn("_bucket", F.lpad(
                F.lower(F.conv(F.col("_bucket").cast("string"), 10, 16)),
                prefix_hex, "0"))
            .withColumn("_start", F.greatest(
                "_start", F.concat(F.col("_bucket"),
                                   F.repeat(F.lit("0"), F.lit(w)))))
            .withColumn("_end", F.least(
                "_end", F.concat(F.col("_bucket"),
                                 F.repeat(F.lit("f"), F.lit(w))))))
    if not lpm:
        return rows.select("_bucket", "_start", "_end", *attrs)
    # "g" sorts after every 32-char hex string: the exclusive upper cut of
    # a block ending at ffff...f (no hex successor) without widening types
    pts = (rows.select("_bucket", F.col("_start").alias("_p"))
           .unionByName(rows.select(
               "_bucket",
               F.coalesce(_hex_inc(F.col("_end")), F.lit("g")).alias("_p")))
           .distinct())
    from pyspark.sql.window import Window

    nxt = F.lead("_p").over(Window.partitionBy("_bucket").orderBy("_p"))
    iv = (pts.withColumn("_q", nxt).where(F.col("_q").isNotNull())
          .withColumnRenamed("_p", "_lo"))
    covered = iv.join(rows, ["_bucket"]).where(
        (F.col("_lo") >= F.col("_start")) & (F.col("_lo") <= F.col("_end")))
    win = covered.groupBy("_bucket", "_lo", "_q").agg(
        F.max_by(F.struct(*attrs),
                 F.struct(F.col("_start"), F.col("_plen"))).alias("_w"))
    # _q is the next cut point, i.e. an EXCLUSIVE upper bound — kept as
    # such (_end_excl) so no decrement/carry is ever needed
    return win.select(
        "_bucket", F.col("_lo").alias("_start"),
        F.col("_q").alias("_end_excl"),
        *[F.col(f"_w.{a}").alias(a) for a in attrs])


def enrich_cidr6(df: DataFrame, dim: DataFrame, ip_col: str,
                 cidr_col: str = "cidr", prefix_hex: int = 4,
                 lpm: bool = True, broadcast: bool = True) -> DataFrame:
    """IPv6 left-join subnet attrs by ip (NULL attrs on miss/malformed).
    Pre-expanded dims (``_bucket`` present) are accepted like the v4 path."""
    exp = (dim if "_bucket" in dim.columns
           else expand_cidr6_dim(dim, cidr_col, prefix_hex, lpm))
    clash = set(exp.columns) & set(df.columns)
    if clash - {"_bucket"}:
        raise ValueError(f"dim attribute columns {sorted(clash)} collide "
                         "with event columns")
    lhs = df.withColumn("_ip_hex", ipv6_to_hex(F.col(ip_col))).withColumn(
        "_bucket", F.substring(F.col("_ip_hex"), 1, prefix_hex))
    rhs = F.broadcast(exp) if broadcast else exp
    upper = (F.col("_ip_hex") < F.col("_end_excl")
             if "_end_excl" in exp.columns
             else F.col("_ip_hex") <= F.col("_end"))
    joined = lhs.join(
        rhs,
        (lhs["_bucket"] == rhs["_bucket"])
        & (F.col("_ip_hex") >= F.col("_start")) & upper,
        "left")
    return joined.drop("_bucket", "_start", "_end", "_end_excl", "_ip_hex",
                       "_plen")
