"""Property-based differential for the temporal-join family: asof_join and
interval_join vs transparent pure-Python reference implementations over
randomized keys/timestamps/nulls (incl. exact ties, duplicate event times,
keyless states, and null timestamps)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cefspark.asof import asof_join, interval_join

_key = st.one_of(st.none(), st.integers(0, 3))
_ts = st.one_of(st.none(), st.integers(0, 60))

_events = st.lists(
    st.tuples(_key, _ts), min_size=1, max_size=12).map(
    lambda rows: [(i, k, t) for i, (k, t) in enumerate(rows)])

_states = st.lists(
    st.tuples(_key, _ts, st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=10).map(
    # honor the documented uniqueness precondition: one state per (key, ts)
    lambda rows: [(k, t, v) for (k, t), v in
                  {(k, t): v for k, t, v in rows}.items()])


def _ref_asof(events, states):
    out = {}
    for eid, k, t in events:
        best = None
        if t is not None and k is not None:
            for sk, stt, v in states:
                if sk == k and stt is not None and stt <= t:
                    if best is None or stt > best[0]:
                        best = (stt, v)
        out[eid] = best[1] if best else None
    return out


def _ref_interval(events, intervals):
    out = {}
    for eid, k, t in events:
        out[eid] = None
        if t is None or k is None:
            continue
        for sk, f, to, v in intervals:
            if sk == k and f is not None and f <= t and (to is None or t < to):
                out[eid] = v
                break
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_events, states=_states)
def test_asof_join_matches_reference(spark, events, states):
    ev = spark.createDataFrame(events, "event_id long, k long, t long")
    stf = spark.createDataFrame(states, "k long, t long, v string") \
        if states else spark.createDataFrame([], "k long, t long, v string")
    got = {r["event_id"]: r["v"]
           for r in asof_join(ev, stf, key="k", left_ts="t", right_ts="t",
                              value_cols=["v"]).collect()}
    assert got == _ref_asof(events, states)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_events, states=_states)
def test_interval_join_matches_reference(spark, events, states):
    # derive non-overlapping intervals: each state is valid until the next
    # state ts for the same key (open-ended for the last one)
    per_key = {}
    for k, t, v in states:
        if k is not None and t is not None:
            per_key.setdefault(k, []).append((t, v))
    intervals = []
    for k, tv in per_key.items():
        tv.sort()
        for i, (t, v) in enumerate(tv):
            to = tv[i + 1][0] if i + 1 < len(tv) else None
            intervals.append((k, t, to, v))
    ev = spark.createDataFrame(events, "event_id long, k long, t long")
    ivf = spark.createDataFrame(intervals, "k long, f long, to long, v string") \
        if intervals else spark.createDataFrame([], "k long, f long, to long, v string")
    got = {r["event_id"]: r["v"]
           for r in interval_join(ev, ivf, key="k", left_ts="t",
                                  valid_from="f", valid_to="to",
                                  value_cols=["v"]).collect()}
    assert got == _ref_interval(events, intervals)
