"""As-of (temporal) join: attach to each left row the most recent right row
at or before its timestamp, per key.

This is the canonical log-pipeline enrichment ("state at event time": config
snapshots, session attributes, device inventory versions) that plain
equi-joins cannot express and naive range joins explode on. The scalable
formulation used here is union-then-window-fill:

    tag left rows (event=1) and right rows (state=0)
  → union on (key, ts)
  → ONE window ``last(state_struct, ignoreNulls)`` ordered by
    (ts, tag) per key
  → keep the event rows.

Cost at scale: a single hash shuffle + sort on the key over events+states —
linear in input, no pair explosion, no per-row probe. The per-key sort is
exactly the shuffle any sessionizer already pays, so an as-of enrich can
share its exchange with downstream windowing on the same key. All state
columns travel in ONE struct so every value is taken from the SAME state row
(per-column fills could mix rows when a state column is null).

Semantics (matching DuckDB's ``ASOF LEFT JOIN .. ON l.k = r.k AND
l.ts >= r.ts`` and pandas ``merge_asof(direction="backward")``):

- backward + inclusive: a state row with the event's exact timestamp
  matches (the state tag sorts before the event tag at equal ts);
- left rows with no prior state keep nulls in the state columns;
- left rows with a NULL timestamp never match (NULL orders first, before
  every state row);
- right rows with a NULL timestamp are dropped — they cannot be positioned
  on the timeline;
- ``tolerance_ms`` optionally voids matches staler than the given bound
  (``event_ts - state_ts > tolerance_ms`` → nulls), pandas-style.

The right side MUST be unique per (key, ts): among duplicates the window
fill would pick an arbitrary one. Aggregate first (as `q_event_sessions`
does with a groupBy-max) — this function asserts nothing at runtime because
the check would cost a full shuffle of its own.

Hot-key scale: a single key whose combined event+state row count exceeds
one task's sort budget (billions of rows under ONE key) would serialize in
that task. The opt-in ``chunk_ms`` parameter applies the standard
mitigation — time-chunk the partition key and carry each chunk's last state
forward as a boundary row — so the hot key's sort splits across
``span/chunk_ms`` tasks while staying bit-identical to the unchunked path
(property-tested). Leave it off for workloads keyed by user/device/tenant,
whose per-key volumes sit far below a task's budget: chunking costs one
extra small aggregation + a tiny per-key carry window.

No counterpart exists in the reference codec (logstash-codec-cef operates
per line); this module belongs to the training-data-pipeline extensions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "__asof_is_left"
_TS = "__asof_ts"
_STATE = "__asof_state"
_STATE_TS = "__asof_state_ts"
_CHUNK = "__asof_chunk"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_ms: Optional[int] = None,
    keep_state_ts: Optional[str] = None,
    chunk_ms: Optional[int] = None,
) -> DataFrame:
    """Backward-inclusive as-of join; returns all of ``left``'s columns plus
    ``value_cols`` from the latest ``right`` row with
    ``right_ts <= left_ts`` per ``key`` (nulls when none, or when the match
    is older than ``tolerance_ms``). ``keep_state_ts`` optionally names an
    output column carrying the matched state row's timestamp.

    NULL keys never match (SQL equality semantics, like the oracle's ASOF
    JOIN): null-key state rows are dropped and null-key left rows keep null
    state columns. ``tolerance_ms`` requires both timestamp columns to be
    TimestampType — on a numeric epoch column the implied cast would
    silently reinterpret millis as seconds, so that is rejected instead.

    ``chunk_ms`` opts into hot-key time-chunking: the window partitions on
    ``(key, floor(ts/chunk_ms))`` instead of ``key`` alone, and each chunk
    is seeded with a boundary row carrying the latest state from all
    earlier chunks, so a single key spanning billions of rows sorts in
    ``span/chunk_ms`` parallel tasks instead of one. Results are
    bit-identical to the unchunked path. Requires TIMESTAMP (not _NTZ)
    columns for the same cast-safety reason as ``tolerance_ms``.
    """
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one right column")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    reserved = {_TAG, _TS, _STATE, _STATE_TS, _CHUNK, _CARRY}
    bad = (reserved & set(value_cols)) | (reserved & set(left.columns))
    if bad:
        raise ValueError(f"reserved internal column names in input: {sorted(bad)}")
    if keep_state_ts and (keep_state_ts in left.columns
                          or keep_state_ts in value_cols):
        raise ValueError(
            f"keep_state_ts {keep_state_ts!r} collides with an output column")
    if tolerance_ms is not None:
        for df_, c in ((left, left_ts), (right, right_ts)):
            t = dict(df_.dtypes).get(c, "")
            if not t.startswith("timestamp"):
                raise ValueError(
                    f"tolerance_ms requires timestamp columns; {c!r} is "
                    f"{t!r} (a numeric epoch column would be reinterpreted "
                    f"as seconds by a cast)")
    if chunk_ms is not None:
        if chunk_ms <= 0:
            raise ValueError("chunk_ms must be positive")
        for df_, c in ((left, left_ts), (right, right_ts)):
            t = dict(df_.dtypes).get(c, "")
            if t != "timestamp":
                raise ValueError(
                    f"chunk_ms requires TIMESTAMP columns; {c!r} is {t!r} "
                    "(numeric epochs would be reinterpreted by a cast, and "
                    "TIMESTAMP_NTZ has no epoch to chunk on)")

    ev = (left
          .withColumn(_TS, F.col(left_ts))
          .withColumn(_TAG, F.lit(1)))
    st = (right
          .where(F.col(right_ts).isNotNull() & F.col(key).isNotNull())
          .select(F.col(key),
                  F.col(right_ts).alias(_TS),
                  *[F.col(c) for c in value_cols])
          .withColumn(_TAG, F.lit(0)))

    struct_of_row = F.struct(F.col(_TS).alias(_STATE_TS),
                             *[F.col(c) for c in value_cols])
    if chunk_ms is None:
        u = ev.unionByName(st, allowMissingColumns=True)
        part = [F.col(key)]
        state_struct = F.when(F.col(_TAG) == 0, struct_of_row)
    else:
        chunk_of = F.floor(F.unix_millis(F.col(_TS)) / F.lit(int(chunk_ms)))
        ev = ev.withColumn(_CHUNK, chunk_of)
        st = st.withColumn(_CHUNK, chunk_of)
        # latest state per (key, chunk): small relation, one row per chunk
        per_chunk = (st.groupBy(key, _CHUNK)
                     .agg(F.max_by(struct_of_row, F.col(_TS)).alias(_STATE)))
        # chunk spine = every (key, chunk) holding events OR states, so a
        # state-free event chunk still receives its boundary row
        spine = (ev.where(F.col(_CHUNK).isNotNull())
                 .select(key, _CHUNK).distinct()
                 .unionByName(per_chunk.select(key, _CHUNK)).distinct())
        carry_w = (Window.partitionBy(key).orderBy(_CHUNK)
                   .rowsBetween(Window.unboundedPreceding, -1))
        carried = (spine
                   .join(per_chunk, [key, _CHUNK], "left")
                   .withColumn(_CARRY,
                               F.last(F.col(_STATE), ignorenulls=True)
                               .over(carry_w))
                   .where(F.col(_CARRY).isNotNull())
                   # _TS NULL sorts first within the chunk (asc_nulls_first):
                   # the boundary state precedes every real row, and real
                   # null-ts events live in the NULL chunk, never here
                   .select(F.col(key), F.col(_CHUNK),
                           F.lit(None).cast(dict(ev.dtypes)[_TS]).alias(_TS),
                           F.lit(-1).alias(_TAG), F.col(_CARRY)))
        u = (ev.unionByName(st, allowMissingColumns=True)
             .withColumn(_CARRY, F.lit(None).cast(
                 dict(carried.dtypes)[_CARRY]))
             .unionByName(carried, allowMissingColumns=True))
        part = [F.col(key), F.col(_CHUNK)]
        state_struct = F.coalesce(F.when(F.col(_TAG) == 0, struct_of_row),
                                  F.col(_CARRY))

    w = (Window.partitionBy(*part)
         .orderBy(F.col(_TS).asc_nulls_first(), F.col(_TAG))
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = (u
              .withColumn(_STATE, F.last(state_struct, ignorenulls=True).over(w))
              .where(F.col(_TAG) == 1))

    state: Column = F.col(_STATE)
    if tolerance_ms is not None:
        # timestamp_diff handles TIMESTAMP and TIMESTAMP_NTZ alike
        # (unix_millis rejects NTZ, and a cast would shift wall times
        # through the session zone)
        fresh = (F.timestamp_diff("MILLISECOND", state[_STATE_TS],
                                  F.col(_TS)) <= F.lit(int(tolerance_ms)))
        state = F.when(fresh, state)

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [state[c].alias(c) for c in value_cols]
    if keep_state_ts:
        out_cols.append(state[_STATE_TS].alias(keep_state_ts))
    return filled.select(*out_cols)


_TO = "__interval_valid_to"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    valid_from: str,
    valid_to: str,
    value_cols: Sequence[str],
    keep_state_ts: Optional[str] = None,
    chunk_ms: Optional[int] = None,
) -> DataFrame:
    """Point-in-interval lookup for per-key NON-OVERLAPPING validity
    intervals (the SCD-2 / slowly-changing-dimension shape: config versions,
    price lists, device firmware windows): each left row picks up the right
    row whose ``[valid_from, valid_to)`` half-open interval contains its
    timestamp; nulls when the timestamp falls in a gap or past an expiry.
    A NULL ``valid_to`` means open-ended validity.

    Because intervals don't overlap, the containing interval is exactly the
    as-of match whose ``valid_to`` hasn't passed — so this runs as
    :func:`asof_join` plus a row-local expiry check: the same ONE shuffle,
    no inequality-join pair explosion (a naive ``l.ts >= r.from AND
    l.ts < r.to`` join is quadratic per key for Spark's planner unless the
    key alone is selective). For genuinely overlapping intervals (multiple
    matches per row) use an equi-join on the key plus an interval filter —
    different semantics, different output cardinality.
    """
    value_cols = list(value_cols)
    if valid_to in (valid_from, key) or valid_to in value_cols:
        raise ValueError("valid_to must be a distinct right-side column")
    r = right.withColumnRenamed(valid_to, _TO)
    enriched = asof_join(left, r, key, left_ts, valid_from,
                         value_cols + [_TO],
                         keep_state_ts=keep_state_ts or _TS,
                         chunk_ms=chunk_ms)
    alive = F.col(_TO).isNull() | (F.col(left_ts) < F.col(_TO))
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.when(alive, F.col(c)).alias(c) for c in value_cols]
    if keep_state_ts:
        out_cols.append(F.when(alive, F.col(keep_state_ts)).alias(keep_state_ts))
    return enriched.select(*out_cols)
