"""Graphite plaintext codec: decode, encode options, round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from cefspark import graphite


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "line string")


def test_decode_well_formed_and_whitespace_runs(spark):
    df = graphite.decode_graphite(_lines(spark, [
        "web.host1.cpu 42 1700000000",
        "a.b.c\t3.5   1700000001",
    ]))
    rows = df.orderBy("ts").collect()
    assert [r.metric for r in rows] == ["web.host1.cpu", "a.b.c"]
    assert rows[0].value == 42.0 and rows[1].value == 3.5
    assert [r.ts for r in rows] == [1700000000, 1700000001]
    assert all(r.error is None for r in rows)


def test_decode_malformed_error_as_data(spark):
    df = graphite.decode_graphite(_lines(spark, [
        "only.two.fields 42",
        "four fields here 1 2",
        "path NaNish 1700000000x",
        "path notanumber 1700000000",
    ]))
    rows = df.collect()
    assert all(r.error == "invalid graphite line" for r in rows)
    assert all(r.metric is None and r.value is None and r.ts is None
               for r in rows)
    # payload survives for quarantine/replay
    assert rows[0].line == "only.two.fields 42"


def test_metric_components(spark):
    df = graphite.metric_components(graphite.decode_graphite(
        _lines(spark, ["a.b.c 1 2"])))
    assert df.collect()[0].components == ["a", "b", "c"]


def test_encode_format_and_filters(spark):
    src = spark.createDataFrame(
        [(1.0, 2.5, None, 1700000000)],
        "cpu double, mem double, disk double, ts bigint")
    out = graphite.encode_graphite(
        src, ["cpu", "mem", "disk", "net"][:3],
        metrics_format="host42.*.value",
        include="cpu|mem|disk", exclude="mem")
    lines = sorted(r.line for r in out.collect())
    # mem excluded (exclude wins), disk NULL skipped
    assert lines == ["host42.cpu.value 1.0 1700000000"]


def test_encode_no_matching_fields_is_empty(spark):
    src = spark.createDataFrame([(1.0, 1)], "cpu double, ts bigint")
    out = graphite.encode_graphite(src, ["cpu"], include="nomatch")
    assert out.count() == 0


def test_roundtrip(spark):
    src = spark.createDataFrame(
        [(float(i), float(i * 2), 1700000000 + i) for i in range(20)],
        "reqs double, errs double, ts bigint")
    enc = graphite.encode_graphite(src, ["reqs", "errs"],
                                   metrics_format="svc.*")
    dec = graphite.decode_graphite(enc)
    assert dec.where(F.col("error").isNotNull()).count() == 0
    back = {(r.metric, r.ts): r.value for r in dec.collect()}
    assert len(back) == 40
    for i in range(20):
        assert back[("svc.reqs", 1700000000 + i)] == float(i)
        assert back[("svc.errs", 1700000000 + i)] == float(i * 2)
