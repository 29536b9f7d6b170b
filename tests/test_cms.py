"""Count-Min sketch: guarantees, mergeability, broadcast query plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cefspark import sketches

DEPTH, WIDTH = 4, 256


def _stream(spark, n=20000, skew=50):
    # Zipf-ish: key k appears ~skew/k times; deterministic.
    return spark.range(n).select(
        (F.col("id") % (F.col("id") % skew + 1)).cast("string").alias("k"))


def test_estimates_never_undercount_and_bound_holds(spark):
    df = _stream(spark)
    n_total = df.count()
    exact = {r.k: r.cnt for r in
             df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    sk = sketches.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    keys = df.select("k").distinct()
    est = {r.k: r.est for r in
           sketches.cms_query(sk, keys, "k", depth=DEPTH, width=WIDTH)
           .collect()}
    assert set(est) == set(exact)
    import math
    bound = math.e / WIDTH * n_total
    for k, e in est.items():
        assert e >= exact[k], (k, e, exact[k])
        assert e <= exact[k] + bound, (k, e, exact[k], bound)


def test_sketch_size_is_bounded(spark):
    sk = sketches.cms_build(_stream(spark), "k", depth=DEPTH, width=WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    # total weight conserved per hash row
    per_row = {r.d: r.s for r in
               sk.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_row) == set(range(DEPTH))
    assert len(set(per_row.values())) == 1


def test_merge_equals_build_over_union(spark):
    a, b = _stream(spark, 6000), _stream(spark, 9000, skew=20)
    merged = sketches.cms_merge(
        sketches.cms_build(a, "k", depth=DEPTH, width=WIDTH),
        sketches.cms_build(b, "k", depth=DEPTH, width=WIDTH))
    direct = sketches.cms_build(a.unionAll(b), "k", depth=DEPTH, width=WIDTH)
    m = {(r.d, r.w): r.cnt for r in merged.collect()}
    d = {(r.d, r.w): r.cnt for r in direct.collect()}
    assert m == d


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 3), ("b", 7)],
                               "k string, w int")
    sk = sketches.cms_build(df, "k", depth=DEPTH, width=WIDTH,
                            weight_col="w")
    est = {r.k: r.est for r in sketches.cms_query(
        sk, df.select("k").distinct(), "k", depth=DEPTH, width=WIDTH)
        .collect()}
    assert est["a"] >= 8 and est["b"] >= 7


def test_query_plan_broadcasts_sketch(spark):
    df = _stream(spark, 2000)
    sk = sketches.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    q = sketches.cms_query(sk, df.select("k").distinct(), "k",
                           depth=DEPTH, width=WIDTH)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_invalid_params_raise(spark):
    df = _stream(spark, 10)
    with pytest.raises(ValueError):
        sketches.cms_build(df, "k", depth=0)
    with pytest.raises(ValueError):
        sketches.cms_merge()


def test_bloom_no_false_negatives_and_fp_rate(spark):
    present = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    absent = spark.range(3000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k"))
    bloom = sketches.bloom_build(present, "k", n_bits=32768, k=5)
    res = {r.k: r.might for r in sketches.bloom_might_contain(
        bloom, present.unionAll(absent), "k", n_bits=32768, k=5).collect()}
    assert all(res[f"key-{i}"] for i in range(2000))  # never a false negative
    fps = sum(1 for i in range(3000) if res[f"other-{i}"])
    import math
    expected = (1 - math.exp(-5 * 2000 / 32768)) ** 5
    assert fps / 3000 <= max(4 * expected, 0.02)


def test_bloom_size_bounded_and_broadcast_probe(spark):
    present = spark.range(500).select(F.col("id").cast("string").alias("k"))
    bloom = sketches.bloom_build(present, "k", n_bits=1024, k=3)
    assert bloom.count() <= 1024
    q = sketches.bloom_might_contain(bloom, present, "k", n_bits=1024, k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
