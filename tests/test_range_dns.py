"""range filter (value/length checks) and dns filter (broadcast + UDF paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cefspark import dnsres
from cefspark.config import apply_filters
from cefspark.pipeline import range_check


def _df(spark):
    return spark.createDataFrame(
        [(1, 50, "short", None),
         (2, 150, "a perfectly reasonable message", ["keep"]),
         (3, None, None, None)],
        "id int, latency int, message string, tags array<string>")


def test_numeric_range_tags_within(spark):
    out = range_check(_df(spark), [("latency", 100, 200, "tag:slow")])
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] is None
    assert tags[2] == ["keep", "slow"]
    assert tags[3] is None  # NULL never fires


def test_string_field_checks_length(spark):
    out = range_check(_df(spark), [("message", 0, 10, "tag:short_msg")])
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] == ["short_msg"] and tags[2] == ["keep"]


def test_negate_fires_outside_but_not_on_null(spark):
    out = range_check(_df(spark), [("latency", 0, 100, "tag:out")],
                      negate=True)
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] is None and tags[2] == ["keep", "out"] and tags[3] is None


def test_drop_and_field_actions(spark):
    out = range_check(_df(spark), [
        ("latency", 100, 999, "drop"),
        ("latency", 0, 99, "field:speed:fast"),
    ])
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1].speed == "fast" and rows[3].speed is None


def test_bad_entries_raise(spark):
    with pytest.raises(ValueError):
        range_check(_df(spark), [("nope", 0, 1, "drop")])
    with pytest.raises(ValueError):
        range_check(_df(spark), [("latency", 0, 1)])
    with pytest.raises(ValueError):
        range_check(_df(spark), [("latency", 0, 1, "explode")])


def test_dns_broadcast_lookup_replace_and_tag(spark):
    df = spark.createDataFrame(
        [("db.internal",), ("web.internal",), ("ghost.internal",)],
        "host string")
    lookup = spark.createDataFrame(
        [("db.internal", "10.0.0.5"), ("web.internal", "10.0.0.6")],
        "name string, addr string")
    out = dnsres.dns_lookup(df, "host", lookup)
    rows = {r.host: r.tags for r in out.collect()}
    assert rows["10.0.0.5"] is None and rows["10.0.0.6"] is None
    assert rows["ghost.internal"] == ["_dnsfailure"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dns_lookup_target_keeps_source(spark):
    df = spark.createDataFrame([("db.internal",)], "host string")
    lookup = spark.createDataFrame([("db.internal", "10.0.0.5")],
                                   "name string, addr string")
    r = dnsres.dns_lookup(df, "host", lookup, target="ip").collect()[0]
    assert r.host == "db.internal" and r.ip == "10.0.0.5"


def test_dns_udf_path_resolves_and_tags_failures(spark):
    df = spark.createDataFrame(
        [("app.example.com",), ("gone.invalid",)], "host string")
    out = dnsres.dns_resolve_udf(df, "host", dnsres.fake_resolver,
                                 target="ip")
    rows = {r.host: r for r in out.collect()}
    assert rows["app.example.com"].ip == dnsres.fake_resolver(
        "app.example.com")
    assert rows["gone.invalid"].ip is None
    assert rows["gone.invalid"].tags == ["_dnsfailure"]


def test_config_chain_dispatch(spark):
    df = spark.createDataFrame([(120, "db.internal")],
                               "latency int, host string")
    lookup = spark.createDataFrame([("db.internal", "10.0.0.5")],
                                   "name string, addr string")
    out = apply_filters(df, [
        {"range": {"ranges": [["latency", 100, 200, "tag:slow"]]}},
        {"dns": {"field": "host", "lookup": lookup}},
    ])
    r = out.collect()[0]
    assert r.tags == ["slow"] and r.host == "10.0.0.5"
    with pytest.raises(ValueError):
        apply_filters(df, [{"dns": {"field": "host"}}])


def test_dns_round_robin_records_never_multiply_rows(spark):
    df = spark.createDataFrame([("db.internal",)], "host string")
    lookup = spark.createDataFrame(
        [("db.internal", "10.0.0.6"), ("db.internal", "10.0.0.5")],
        "name string, addr string")
    out = dnsres.dns_lookup(df, "host", lookup).collect()
    assert len(out) == 1
    assert out[0].host == "10.0.0.5"  # deterministic min-addr pick
