"""IPv6 CIDR enrich: differential vs stdlib ipaddress, LPM, plan shape."""

from __future__ import annotations

import ipaddress

import pytest
from pyspark.sql import functions as F

from cefspark import cidr

VALID = [
    "2001:db8:85a3:0:0:8a2e:370:7334",
    "2001:0DB8:85A3:0000:0000:8A2E:0370:7334",  # case + zero padding
    "2001:db8::8a2e:370:7334",
    "::1", "::", "1::", "fe80::",
    "a:b:c:d:e:f:1:2",
    "::ffff:192.168.1.7",               # v4-mapped tail
    "64:ff9b::255.255.255.255",
    "1:2:3:4:5:6:7.8.9.10",             # full form with v4 tail
]

INVALID = [
    "", ":", ":::", "1::2::3", "1:2:3:4:5:6:7:8:9", "12345::",
    "g::1", "1:2:3:4:5:6:7", "::ffff:1.2.3.256", "::ffff:1.2.3",
    "fe80::1%eth0", "1.2.3.4", ":1:2:3:4:5:6:7", "1:2:3:4:5:6:7:",
    "1:2:3:4:5:6:7:8::", "::1:2:3:4:5:6:7:8",
]


def _hex(ip: str) -> str:
    return f"{int(ipaddress.IPv6Address(ip)):032x}"


def test_parse_matches_stdlib(spark):
    df = spark.createDataFrame([(s,) for s in VALID], "ip string")
    got = {r.ip: r.h for r in df.select(
        "ip", cidr.ipv6_to_hex(F.col("ip")).alias("h")).collect()}
    for s in VALID:
        assert got[s] == _hex(s), s


def test_malformed_all_null(spark):
    df = spark.createDataFrame([(s,) for s in INVALID], "ip string")
    rows = df.select("ip", cidr.ipv6_to_hex(F.col("ip")).alias("h")).collect()
    bad = [r.ip for r in rows if r.h is not None]
    assert bad == []


def test_bounds_match_stdlib_networks(spark):
    nets = ["2001:db8::/32", "2001:db8:85a3::8a2e:0:0/96", "::/0",
            "fe80::/10", "2001:db8::7334/128", "2001:db8::ff00/121",
            "64:ff9b::/96", "fc00::/7"]
    df = spark.createDataFrame([(n,) for n in nets], "c string")
    s, e, p = cidr.cidr6_bounds(F.col("c"))
    got = {r.c: (r.s, r.e, r.p) for r in
           df.select("c", s.alias("s"), e.alias("e"), p.alias("p"))
           .collect()}
    for n in nets:
        net = ipaddress.ip_network(n, strict=False)
        assert got[n] == (f"{int(net.network_address):032x}",
                          f"{int(net.broadcast_address):032x}",
                          net.prefixlen), n


def test_hex_inc(spark):
    cases = [("0" * 32, "0" * 31 + "1"),
             ("0" * 31 + "f", "0" * 30 + "10"),
             ("2001" + "f" * 28, "2002" + "0" * 28),
             ("f" * 32, None)]
    df = spark.createDataFrame([(a,) for a, _ in cases], "h string")
    got = {r.h: r.i for r in
           df.select("h", cidr._hex_inc(F.col("h")).alias("i")).collect()}
    for a, want in cases:
        assert got[a] == want


def test_enrich_longest_prefix_match_vs_bruteforce(spark):
    dim_rows = [("2001:db8::/32", "doc-block"),
                ("2001:db8:aaaa::/48", "doc-sub"),
                ("2001:db8:aaaa:bb00::/56", "doc-subsub"),
                ("fc00::/7", "ula"),
                ("::ffff:0:0/96", "v4mapped")]
    ips = ["2001:db8::1", "2001:db8:aaaa::5", "2001:db8:aaaa:bb00::9",
           "2001:db8:aaaa:bbff::1", "2001:db9::1", "fd12:3456::1",
           "::ffff:10.0.0.1", "not-an-ip", "9999::1"]

    def expected(ip):
        try:
            a = ipaddress.IPv6Address(ip)
        except ValueError:
            return None
        best, best_len = None, -1
        for c, name in dim_rows:
            net = ipaddress.ip_network(c, strict=False)
            if a in net and net.prefixlen > best_len:
                best, best_len = name, net.prefixlen
        return best

    dim = spark.createDataFrame(dim_rows, "cidr string, net_name string")
    df = spark.createDataFrame([(i,) for i in ips], "ip string")
    out = cidr.enrich_cidr6(df, dim, "ip")
    got = {r.ip: r.net_name for r in out.collect()}
    assert len(got) == len(ips)  # LPM ⇒ at most one match per ip
    for ip in ips:
        assert got[ip] == expected(ip), ip


def test_enrich_plan_is_broadcast_hash_join(spark):
    dim = spark.createDataFrame([("2001:db8::/32", "x")],
                                "cidr string, tier string")
    df = spark.createDataFrame([("2001:db8::1",)], "ip string")
    plan = (cidr.enrich_cidr6(df, dim, "ip")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wide_block_bucket_expansion(spark):
    # fc00::/7 at prefix_hex=4 spans buckets fc00..fdff = 512 rows
    dim = spark.createDataFrame([("fc00::/7", "ula")],
                                "cidr string, tier string")
    exp = cidr.expand_cidr6_dim(dim, lpm=False)
    assert exp.count() == 512
    bks = [r._bucket for r in exp.select("_bucket").collect()]
    assert min(bks) == "fc00" and max(bks) == "fdff"


def test_param_validation(spark):
    dim = spark.createDataFrame([("::/0", "x")], "cidr string, t string")
    with pytest.raises(ValueError):
        cidr.expand_cidr6_dim(dim, prefix_hex=16)
    with pytest.raises(ValueError):
        cidr.expand_cidr6_dim(dim.select("cidr"))
