"""asof_join: semantics vs pandas merge_asof, edge rows, and the one-shuffle
plan contract."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cefspark.asof import asof_join, interval_join


def _fixture_frames(spark, n_events=400, n_states=60, n_keys=7):
    """Deterministic interleaved event/state timelines with exact-tie and
    no-prior-state cases baked in."""
    ev = [(i, i % n_keys, 1_700_000_000_000 + (i * 9973) % 86_400_000)
          for i in range(n_events)]
    st = [(j, j % n_keys, 1_700_000_000_000 + (j * 60_331) % 86_400_000,
           f"cfg{j}")
          for j in range(n_states)]
    # exact tie: state 9000 and event 9001 share key 0 and a timestamp
    ev.append((9001, 0, 1_700_000_050_000))
    st.append((9000, 0, 1_700_000_050_000, "tie"))
    # key 6 has events but every state for it removed -> no match at all
    st = [s for s in st if s[1] != 6]
    events = spark.createDataFrame(
        ev, "event_id long, k long, ts_ms long").select(
        "event_id", "k", F.timestamp_millis("ts_ms").alias("ts"))
    states = spark.createDataFrame(
        st, "state_id long, k long, ts_ms long, cfg string").select(
        "state_id", "k", F.timestamp_millis("ts_ms").alias("valid_from"), "cfg")
    return events, states


def test_asof_matches_pandas_merge_asof(spark):
    events, states = _fixture_frames(spark)
    out = asof_join(events, states, key="k", left_ts="ts",
                    right_ts="valid_from", value_cols=["state_id", "cfg"],
                    keep_state_ts="state_ts").toPandas()

    pev = events.toPandas().sort_values("ts").reset_index(drop=True)
    pst = states.toPandas().sort_values("valid_from").reset_index(drop=True)
    expect = pd.merge_asof(pev, pst, left_on="ts", right_on="valid_from",
                           by="k", direction="backward")
    got = out.sort_values("event_id").reset_index(drop=True)
    want = expect.sort_values("event_id").reset_index(drop=True)
    assert (got["state_id"].fillna(-1) == want["state_id"].fillna(-1)).all()
    assert (got["cfg"].fillna("∅") == want["cfg"].fillna("∅")).all()
    # the matched timestamp column is the matched row's, not the event's
    m = got["state_ts"].notna()
    assert (got.loc[m, "state_ts"] == want.loc[m, "valid_from"]).all()
    # fixture really exercises all three shapes
    assert got.loc[got["event_id"] == 9001, "cfg"].iloc[0] == "tie"  # inclusive
    assert got.loc[got["k"] == 6, "state_id"].isna().all()           # no state
    assert got["state_id"].notna().any()


def test_asof_value_columns_come_from_one_row(spark):
    """A state row with a null in one value column must not donate its other
    column while an older row fills the null — values travel as one struct."""
    events = spark.createDataFrame([(1, 0, 100)],
                                   "event_id long, k long, t long")
    states = spark.createDataFrame(
        [(0, 10, "old_a", "old_b"), (0, 50, None, "new_b")],
        "k long, t long, a string, b string")
    row = asof_join(events, states, key="k", left_ts="t", right_ts="t",
                    value_cols=["a", "b"]).collect()[0]
    assert row["a"] is None and row["b"] == "new_b"


def test_asof_null_and_tolerance_semantics(spark):
    events = spark.createDataFrame(
        [(1, 0, 1000), (2, 0, None), (3, 0, 5000)],
        "event_id long, k long, t long")
    states = spark.createDataFrame(
        [(0, 900, "s1"), (0, None, "ghost")], "k long, t long, v string")
    out = {r["event_id"]: r["v"]
           for r in asof_join(events, states, key="k", left_ts="t",
                              right_ts="t", value_cols=["v"]).collect()}
    assert out == {1: "s1", 2: None, 3: "s1"}  # null ts never matches either way

    # tolerance (timestamp columns required): event 3 is 4100 s after s1 ->
    # voided under a 200 s bound; event 1 at 100 s staleness survives.
    events_ts = events.where("t is not null").select(
        "event_id", "k", F.timestamp_seconds("t").alias("ts"))
    states_ts = states.where("t is not null").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    out2 = {r["event_id"]: r["v"]
            for r in asof_join(events_ts, states_ts, key="k", left_ts="ts",
                               right_ts="ts", value_cols=["v"],
                               tolerance_ms=200_000).collect()}
    assert out2 == {1: "s1", 3: None}


def test_asof_rejects_colliding_value_columns(spark):
    events = spark.createDataFrame([(1, 0, 1)], "event_id long, k long, t long")
    states = spark.createDataFrame([(0, 1, 2)], "k long, t long, event_id long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(events, states, key="k", left_ts="t", right_ts="t",
                  value_cols=["event_id"])
    with pytest.raises(ValueError, match="at least one"):
        asof_join(events, states, key="k", left_ts="t", right_ts="t",
                  value_cols=[])
    # keep_state_ts colliding with an output column: eager error, not a
    # silent duplicate-name DataFrame
    states2 = spark.createDataFrame([(0, 1, "x")], "k long, t long, v string")
    with pytest.raises(ValueError, match="keep_state_ts"):
        asof_join(events, states2, key="k", left_ts="t", right_ts="t",
                  value_cols=["v"], keep_state_ts="event_id")


def test_asof_value_column_named_ts(spark):
    """A right payload column literally named 'ts' (the most common
    timestamp name) must not collide with the internal state-struct field."""
    events = spark.createDataFrame([(1, 0, 100)], "event_id long, k long, t long")
    states = spark.createDataFrame([(0, 50, 777)], "k long, f long, ts long")
    row = asof_join(events, states, key="k", left_ts="t", right_ts="f",
                    value_cols=["ts"], keep_state_ts="matched_at").collect()[0]
    assert row["ts"] == 777 and row["matched_at"] == 50


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: a null-key event must NOT pick up a null-key
    state (unlike a naive partitionBy, which groups nulls together)."""
    events = spark.createDataFrame([(1, None, 100), (2, 0, 100)],
                                   "event_id long, k long, t long")
    states = spark.createDataFrame([(None, 50, "null_state"), (0, 50, "ok")],
                                   "k long, t long, v string")
    out = {r["event_id"]: r["v"]
           for r in asof_join(events, states, key="k", left_ts="t",
                              right_ts="t", value_cols=["v"]).collect()}
    assert out == {1: None, 2: "ok"}


def test_asof_tolerance_rejects_numeric_ts(spark):
    """tolerance_ms on a numeric epoch column would silently reinterpret
    millis as seconds through the cast — must be an eager error."""
    events = spark.createDataFrame([(1, 0, 1000)], "event_id long, k long, t long")
    states = spark.createDataFrame([(0, 900, "s")], "k long, t long, v string")
    with pytest.raises(ValueError, match="timestamp"):
        asof_join(events, states, key="k", left_ts="t", right_ts="t",
                  value_cols=["v"], tolerance_ms=500)


def test_interval_join_expiry_gap_and_open_end(spark):
    """SCD-2 point-in-interval: in-window match, gap -> null, NULL valid_to
    is open-ended, and half-open bounds ([from, to))."""
    events = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 199), (3, 0, 200), (4, 0, 250), (5, 0, 400),
         (6, 1, 50)],
        "event_id long, k long, t long")
    states = spark.createDataFrame(
        [(0, 100, 200, "v1"),     # [100, 200)
         (0, 300, None, "v2"),    # [300, open)
         (1, 60, 70, "w1")],      # starts after event 6
        "k long, f long, to long, v string")
    out = {r["event_id"]: r["v"]
           for r in interval_join(events, states, key="k", left_ts="t",
                                  valid_from="f", valid_to="to",
                                  value_cols=["v"]).collect()}
    assert out == {1: "v1",     # inclusive lower bound
                   2: "v1",     # last tick inside
                   3: None,     # exclusive upper bound
                   4: None,     # gap between intervals
                   5: "v2",     # open-ended interval
                   6: None}     # before any state


def test_interval_join_rejects_ambiguous_valid_to(spark):
    df = spark.createDataFrame([(0, 1, 2)], "k long, f long, v long")
    with pytest.raises(ValueError, match="distinct"):
        interval_join(df, df, key="k", left_ts="f", valid_from="f",
                      valid_to="f", value_cols=["v"])


def test_asof_plan_is_one_shuffle_no_python(spark):
    events, states = _fixture_frames(spark)
    out = asof_join(events.repartition(4), states.repartition(4), key="k",
                    left_ts="ts", right_ts="valid_from",
                    value_cols=["state_id", "cfg"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "EvalPython" not in plan
    assert "Join" not in plan  # the whole point: no join node, no explosion


def _chunk_parity(spark, events, states, chunk_ms, **kw):
    base = asof_join(events, states, key="k", left_ts="ts",
                     right_ts="valid_from", value_cols=["state_id", "cfg"],
                     keep_state_ts="state_ts", **kw)
    chunked = asof_join(events, states, key="k", left_ts="ts",
                        right_ts="valid_from", value_cols=["state_id", "cfg"],
                        keep_state_ts="state_ts", chunk_ms=chunk_ms, **kw)
    a = base.toPandas().sort_values("event_id").reset_index(drop=True)
    b = chunked.toPandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_asof_chunked_bit_identical(spark):
    """VERDICT r4 #6 / r5 #2: the opt-in hot-key time-chunking must be
    bit-identical to the unchunked path across chunk widths that produce
    many chunks, a few chunks, state-free chunks (boundary carry across
    gaps), and one chunk (degenerate — pure overhead, same answer)."""
    events, states = _fixture_frames(spark)
    for chunk_ms in (60_000,          # ~1440 chunks over the day span
                     3_600_000,       # 24 chunks
                     7 * 86_400_000): # everything in one chunk
        _chunk_parity(spark, events, states, chunk_ms)
    # with tolerance: the carried struct must keep the ORIGINAL state ts
    _chunk_parity(spark, events, states, 3_600_000, tolerance_ms=7_200_000)


def test_asof_chunked_property_random_timelines(spark):
    """Seeded randomized parity: sparse states, dense bursts, exact ties,
    null event timestamps, keys with no states at all."""
    import random

    rng = random.Random(20260817)
    base = 1_700_000_000_000
    ev, st = [], []
    for i in range(600):
        k = rng.randrange(5)
        ts = None if rng.random() < 0.05 else base + rng.randrange(0, 10**7)
        ev.append((i, k, ts))
    for j in range(80):
        k = rng.randrange(4)  # key 4 never gets a state
        ts = base + rng.randrange(0, 10**7)
        st.append((j, k, ts, f"s{j}"))
    st.append((900, 0, ev[0][2] or base, "tie0"))  # exact tie with event 0
    events = spark.createDataFrame(
        ev, "event_id long, k long, ts_ms long").select(
        "event_id", "k", F.timestamp_millis("ts_ms").alias("ts"))
    states = spark.createDataFrame(
        st, "state_id long, k long, ts_ms long, cfg string").select(
        "state_id", "k", F.timestamp_millis("ts_ms").alias("valid_from"),
        "cfg")
    for chunk_ms in (97_000, 1_000_003):  # odd widths: ties straddle edges
        _chunk_parity(spark, events, states, chunk_ms)


def test_asof_chunked_rejections(spark):
    events = spark.createDataFrame([(1, 0, 1000)],
                                   "event_id long, k long, t long")
    states = spark.createDataFrame([(0, 900, "s")], "k long, t long, v string")
    with pytest.raises(ValueError, match="TIMESTAMP"):
        asof_join(events, states, key="k", left_ts="t", right_ts="t",
                  value_cols=["v"], chunk_ms=1000)
    ev_ts = events.select("event_id", "k", F.timestamp_seconds("t").alias("ts"))
    st_ts = states.select("k", F.timestamp_seconds("t").alias("ts"), "v")
    with pytest.raises(ValueError, match="positive"):
        asof_join(ev_ts, st_ts, key="k", left_ts="ts", right_ts="ts",
                  value_cols=["v"], chunk_ms=0)


def test_asof_chunked_window_partitions_on_chunk(spark):
    """The scale contract itself: the chunked plan's window partitions on
    (key, chunk) — the hot key's sort really is split — and stays
    join-free/Python-free."""
    events, states = _fixture_frames(spark)
    out = asof_join(events, states, key="k", left_ts="ts",
                    right_ts="valid_from", value_cols=["cfg"],
                    chunk_ms=3_600_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__asof_chunk" in plan
    assert re.search(r"windowspecdefinition\(k.*__asof_chunk", plan)
    assert "EvalPython" not in plan
    # the spine->per_chunk boundary join is allowed (it runs over the tiny
    # per-(key,chunk) relation, not event volume); what must NOT appear is
    # any pair-exploding join shape
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_chunked_parity(spark):
    events = spark.createDataFrame(
        [(i, i % 3, 1_700_000_000_000 + i * 37_000) for i in range(200)],
        "event_id long, k long, ts_ms long").select(
        "event_id", "k", F.timestamp_millis("ts_ms").alias("ts"))
    states = spark.createDataFrame(
        [(j, j % 3, 1_700_000_000_000 + j * 500_000,
          None if j % 4 == 0 else 1_700_000_000_000 + j * 500_000 + 400_000,
          f"v{j}") for j in range(12)],
        "state_id long, k long, f_ms long, to_ms long, v string").select(
        "state_id", "k", F.timestamp_millis("f_ms").alias("f"),
        F.timestamp_millis("to_ms").alias("to"), "v")
    base = interval_join(events, states, key="k", left_ts="ts",
                         valid_from="f", valid_to="to", value_cols=["v"])
    chunked = interval_join(events, states, key="k", left_ts="ts",
                            valid_from="f", valid_to="to", value_cols=["v"],
                            chunk_ms=250_000)
    a = base.toPandas().sort_values("event_id").reset_index(drop=True)
    b = chunked.toPandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
