"""Conversation-native training-data operators over multi-turn transcript
tables ``(conv_id, turn_idx, role, text, ...)`` — the input shape this
engine's north rule names.

Two product stages a transcript→SFT-corpus pipeline needs after the
cleaning ops (redact/dedup/decontaminate operate per-turn or per-doc):

- :func:`render_conversations` — collapse a conversation's turns into one
  training document ("role: text" lines in turn order), the standard
  pre-tokenization formatting step.
- :func:`sft_pairs` — explode each assistant turn into a (context,
  response) supervised pair, the context being every prior turn rendered.

Both cost ONE hash shuffle on the conversation key — the same exchange any
per-conversation sessionizer already pays, so composing them with
conversation stats reuses the partitioning. Turn order comes from
``array_sort`` over ``struct(turn_idx, line)`` (turn_idx is unique per
conversation by the transcript contract), never from implicit row order,
so results are deterministic under any input partitioning. Everything is
built-in array/window expressions — no UDF, no driver collect.

No counterpart exists in the reference codec (logstash-codec-cef is
per-line); this module belongs to the training-data-pipeline extensions
(SURVEY.md §2.4 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def render_conversations(df: DataFrame, conv_col: str = "conv_id",
                         turn_col: str = "turn_idx", role_col: str = "role",
                         text_col: str = "text",
                         sep: str = "\n") -> DataFrame:
    """One row per conversation: ``dialog`` = the turns rendered as
    ``role: text`` joined by ``sep`` in ``turn_col`` order, plus
    ``n_turns``. A NULL text renders as an empty line body (concat of the
    role prefix with NULL would drop the turn silently — coalesced
    instead, so turn counts and rendering stay consistent)."""
    line = F.concat(F.col(role_col), F.lit(": "),
                    F.coalesce(F.col(text_col), F.lit("")))
    return (df.groupBy(F.col(conv_col))
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col(turn_col), line.alias("l")))),
                         lambda s: s["l"]), sep).alias("dialog"),
                 F.count(F.lit(1)).alias("n_turns")))


def sft_pairs(df: DataFrame, assistant_role: str = "assistant",
              conv_col: str = "conv_id", turn_col: str = "turn_idx",
              role_col: str = "role", text_col: str = "text",
              sep: str = "\n",
              extra_cols: tuple = ()) -> DataFrame:
    """One row per ``assistant_role`` turn: ``(conv_col, turn_col,
    context, response)`` where ``context`` is every EARLIER turn rendered
    ``role: text`` in order (empty string when the assistant somehow
    speaks first) and ``response`` is the turn's own text. ``extra_cols``
    names further input columns to carry through (e.g. an event id) —
    cheaper than re-joining the source afterwards, which would cost a
    second shuffle.

    The context accumulates via a window ``collect_list`` over
    ``rowsBetween(unboundedPreceding, -1)`` on the conversation key —
    same single shuffle as any sessionizer; the per-row array is then
    array_sort-ed on turn_idx so the rendering is order-deterministic
    even though window frames already deliver orderBy order (belt and
    suspenders against partial re-sorts under AQE retries)."""
    line = F.concat(F.col(role_col), F.lit(": "),
                    F.coalesce(F.col(text_col), F.lit("")))
    w = (Window.partitionBy(conv_col).orderBy(turn_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    ctx_arr = F.collect_list(
        F.struct(F.col(turn_col), line.alias("l"))).over(w)
    context = F.array_join(
        F.transform(F.array_sort(ctx_arr), lambda s: s["l"]), sep)
    return (df.withColumn("context", context)
            .where(F.col(role_col) == assistant_role)
            .select(F.col(conv_col), F.col(turn_col), "context",
                    F.col(text_col).alias("response"),
                    *[F.col(c) for c in extra_cols]))


def truncate_context(df: DataFrame, budget: int, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx",
                     tokens_col: str | None = None,
                     text_col: str = "text") -> DataFrame:
    """Context-window truncation: keep each conversation's TRAILING turns
    whose cumulative token count fits ``budget`` — the standard
    "most recent context wins" crop before packing/tokenization. The
    FINAL turn always survives even when alone over budget (dropping it
    would delete the training target itself).

    Token counts come from ``tokens_col`` when given (e.g. a precomputed
    BPE count), else a whitespace count of ``text_col``. Adds
    ``suffix_tokens`` (cumulative tokens from the conversation's end
    through this turn, inclusive).

    Cost: ONE hash shuffle on the conversation key — the same exchange
    render/sft/sessionize already pay, so Catalyst/AQE reuse it when
    composed. The reverse cumsum is a window over that exchange; no
    second pass, no driver state."""
    ntok = (F.col(tokens_col) if tokens_col is not None
            else F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
                  .otherwise(F.size(F.split(F.trim(F.col(text_col)),
                                            r"\s+"))))
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).desc())
    sfx = F.sum(ntok).over(w.rowsBetween(Window.unboundedPreceding, 0))
    pos = F.row_number().over(w)
    return (df.withColumn("suffix_tokens", sfx)
            .withColumn("_pos", pos)
            .where((F.col("suffix_tokens") <= budget) | (F.col("_pos") == 1))
            .drop("_pos"))


def cooccurrence_pmi(df: DataFrame, group_col: str = "conv_id",
                     item_col: str = "tool") -> DataFrame:
    """Pairwise PMI of items co-occurring within a group (which tools are
    used together in a conversation — the transcript-analytics view of
    document-level co-occurrence).

    Counting contract: presence-based (each group contributes 0/1 per item
    and per pair), ``N`` = number of groups containing at least one item,
    ``pmi = ln(n_joint * N / (n_a * n_b))``. Ordered pairs (item_a <
    item_b) so each pair appears once.

    Spark shape: ONE shuffle builds the per-group distinct item set
    (collect_set); ordered pairs are generated INSIDE each row with a
    nested ``transform``/``slice`` comprehension — no self-join, so the
    plan never pair-explodes across the cluster; pair/item marginal counts
    aggregate over tiny keyed streams (bounded by distinct items², not by
    input rows). The N scalar rides in via a broadcast cross join. The
    integer counts are exact (oracle-gated); the float ``pmi`` is a single
    ln per pair, pytest-pinned against a driver-side reference.
    """
    per = (df.where(F.col(item_col).isNotNull())
           .select(F.col(group_col).alias("_g"),
                   F.col(item_col).cast("string").alias("_i"))
           .distinct())
    sets = per.groupBy("_g").agg(
        F.array_sort(F.collect_set("_i")).alias("_items"))
    pairs = sets.select(F.explode(F.expr(
        "flatten(transform(_items, (x, i) -> "
        "transform(slice(_items, i + 2, size(_items)), "
        "y -> struct(x AS a, y AS b))))")).alias("_p"))
    joint = pairs.groupBy(F.col("_p.a").alias("item_a"),
                          F.col("_p.b").alias("item_b")).agg(
        F.count(F.lit(1)).alias("n_joint"))
    marg = per.groupBy(F.col("_i")).agg(F.count(F.lit(1)).alias("n"))
    n_groups = sets.agg(F.count(F.lit(1)).alias("n_groups"))
    out = (joint
           .join(F.broadcast(marg.select(F.col("_i").alias("item_a"),
                                         F.col("n").alias("n_a"))), "item_a")
           .join(F.broadcast(marg.select(F.col("_i").alias("item_b"),
                                         F.col("n").alias("n_b"))), "item_b")
           .crossJoin(F.broadcast(n_groups)))
    return out.select(
        "item_a", "item_b", "n_joint", "n_a", "n_b", "n_groups",
        F.log(F.col("n_joint").cast("double") * F.col("n_groups")
              / (F.col("n_a").cast("double") * F.col("n_b"))).alias("pmi"))
