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
