"""Sequence-packing invariants + engine-exact differential vs a pure-Python
reference implementation of the same greedy rule."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cefspark import packing
from cefspark.sampling import split_bucket

CAP = 50


def _py_greedy(ns):
    """Reference greedy: new pack iff acc + n > CAP; acc restarts at n."""
    out = []
    acc, pid, pos = 0, -1, 0
    for n in ns:
        if pid < 0 or acc + n > CAP:
            pid, pos, acc = pid + 1, 0, n
        else:
            pos, acc = pos + 1, acc + n
        out.append((pid, pos))
    return out


def _py_bucket(key, salt=0):
    half, m1, fold, m2, mod = 1 << 31, 2654435761, 40503, 69069, 1 << 32
    h1 = ((key % half) * m1 + (key >> 31) * fold + fold + salt) % mod
    return ((h1 * m2) % mod >> 16) % 1000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 97) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_greedy_matches_python_reference(spark, docs):
    got = {r["doc_id"]: (r["shard"], r["pack_id"], r["pack_pos"])
           for r in packing.pack_greedy(docs, CAP, shards=8).collect()}
    assert len(got) == 400
    by_shard = {}
    for i in range(400):
        by_shard.setdefault(_py_bucket(i) % 8, []).append(i)
    for shard, ids in by_shard.items():
        want = _py_greedy([(i * 37) % 97 for i in sorted(ids)])
        for doc_id, (pid, pos) in zip(sorted(ids), want):
            assert got[doc_id] == (shard, pid, pos), doc_id


def test_greedy_invariants(spark, docs):
    pdf = packing.pack_greedy(docs, CAP, shards=8).toPandas()
    # every doc exactly once
    assert sorted(pdf["doc_id"]) == list(range(400))
    for (_, pid), grp in pdf.groupby(["shard", "pack_id"]):
        total = grp["n_tokens"].sum()
        # pack fits, unless it is a solo oversize pack
        assert total <= CAP or len(grp) == 1
        # positions dense from 0 in doc order
        assert sorted(grp["pack_pos"]) == list(range(len(grp)))
        assert (grp.sort_values("doc_id")["pack_pos"].to_numpy()
                == sorted(grp["pack_pos"])).all()
    for _, grp in pdf.groupby("shard"):
        pids = sorted(grp["pack_id"].unique())
        assert pids == list(range(len(pids)))  # dense pack ids


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=120), min_size=1,
                max_size=60))
def test_greedy_rule_properties(ns):
    """Pure-rule properties over arbitrary token sequences (no Spark):
    oversize docs are always solo; non-oversize packs fit; order kept."""
    packs = {}
    for n, (pid, pos) in zip(ns, _py_greedy(ns)):
        packs.setdefault(pid, []).append(n)
    for members in packs.values():
        if any(n > CAP for n in members):
            assert len(members) == 1
        else:
            assert sum(members) <= CAP


def test_chunk_offsets_are_exclusive_prefix_sums(spark, docs):
    pdf = packing.pack_chunk(docs, CAP, shards=8).toPandas()
    assert len(pdf) == 400
    for _, grp in pdf.groupby("shard"):
        grp = grp.sort_values("doc_id")
        cum = 0
        for _, r in grp.iterrows():
            assert r["seq_off"] == cum
            assert r["pack_first"] == cum // CAP
            assert r["pack_last"] == (cum + max(int(r["n_tokens"]), 1) - 1) // CAP
            assert r["pack_off"] == cum % CAP
            cum += int(r["n_tokens"])


def test_chunk_stays_jvm_side(spark, docs):
    plan = packing.pack_chunk(docs, CAP, shards=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the chunk path


def test_greedy_single_shuffle(spark, docs):
    plan = packing.pack_greedy(docs, CAP, shards=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1  # groupBy(shard) only


def test_capacity_validation(spark, docs):
    with pytest.raises(ValueError):
        packing.pack_chunk(docs, 0)
    with pytest.raises(ValueError):
        packing.pack_greedy(docs, -1)
    with pytest.raises(ValueError):
        packing.with_shard(docs, 0)


def test_shard_sql_parity(spark, docs):
    """shard_sql (DuckDB form) == with_shard (Spark form) on the same keys."""
    import duckdb
    want = duckdb.sql(
        f"SELECT i AS doc_id, {packing.shard_sql('i', 8)} AS shard "
        "FROM generate_series(0, 399) t(i)").df()
    got = packing.with_shard(docs, 8).select("doc_id", "shard").toPandas()
    merged = want.merge(got, on="doc_id", suffixes=("_d", "_s"))
    assert (merged["shard_d"].astype(int) == merged["shard_s"].astype(int)).all()
