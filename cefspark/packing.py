"""Sequence packing for LLM training-data pipelines.

Pre-training ingestion ends by packing variable-length documents into
fixed-capacity context windows. Two standard disciplines, both provided:

- **chunk** (``pack_chunk``): GPT-style concat-and-cut — documents are laid
  end-to-end into a token stream and the stream is cut every ``capacity``
  tokens; a document may span packs (the trainer masks attention across the
  cut). Pure integer window arithmetic, whole-stage codegen, no Python.
- **greedy** (``pack_greedy``): boundary-respecting first-fit-in-order —
  walk documents in key order, accumulate token counts, start a new pack
  when the next document would overflow ``capacity``. A document larger
  than ``capacity`` becomes a solo (oversize) pack and the document after
  it always opens a fresh pack. Inherently a sequential scan, so it runs
  per shard via ``applyInPandas``.

Both are **sharded by contract**: global packing of a 100 TB corpus would
serialize the whole stream through one task, so the corpus is split into
``shards`` deterministic hash shards (the engine-exact ``split_bucket``
mix — reproducible across runs, engines, and cluster sizes) and each shard
packs independently in ascending key order. Pack ids are therefore
per-shard; ``(shard, pack_id)`` is the global pack key. This is the
standard production shape: shard count scales with the cluster, each
shard's pack stream is written by one task, and determinism is preserved
because shard assignment and intra-shard order are pure functions of the
document key — never of partitioning or arrival order.

Scale notes:
- ``pack_chunk`` is one shuffle (the per-shard window sort) and stays
  entirely JVM-side; the cumulative sum is integer-exact.
- ``pack_greedy`` is one shuffle (groupBy shard) plus an O(rows)
  single-pass Python loop per shard — the irreducible sequential scan of
  greedy packing, Arrow-batched in and out. Choose ``shards`` so a shard's
  (key, n_tokens) pairs fit executor memory: two longs per document, so
  even a billion-document shard is ~16 GB; at 100 TB use a few thousand
  shards and every shard is tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import split_bucket


def with_shard(df: DataFrame, shards: int, id_col: str = "doc_id",
               salt: int = 0) -> DataFrame:
    """Deterministic shard in [0, shards) from the NON-NEGATIVE integer key
    (engine-exact: the same `split_bucket % shards` integer expression runs
    in Spark, Python, and ANSI SQL)."""
    if not 1 <= shards <= 1000:
        raise ValueError(f"shards must be in [1, 1000] (got {shards}); "
                         "split_bucket has 1000 buckets")
    return df.withColumn(
        "shard", (split_bucket(F.col(id_col), salt) % F.lit(shards)).cast("int"))


def shard_sql(id_expr: str, shards: int, salt: int = 0) -> str:
    """The identical shard expression in ANSI SQL (DuckDB-ready)."""
    from .sampling import split_bucket_sql
    return f"({split_bucket_sql(id_expr, salt)}) % {shards}"


def pack_chunk(df: DataFrame, capacity: int, shards: int = 16,
               id_col: str = "doc_id", tokens_col: str = "n_tokens",
               salt: int = 0) -> DataFrame:
    """Concat-and-cut packing: adds

    - ``shard``       — hash shard of the key,
    - ``seq_off``     — the document's start offset in its shard's
                        concatenated token stream (exclusive prefix sum),
    - ``pack_first``  — pack index containing the first token,
    - ``pack_last``   — pack index containing the last token (== first for
                        empty documents, which sit at a point in the
                        stream), and
    - ``pack_off``    — offset within ``pack_first`` where the document
                        starts.

    All integer arithmetic (DIV / %), so results are bit-identical across
    engines. One shuffle (the per-shard window); no UDF.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive (got {capacity})")
    # a caller-provided `shard` column (from with_shard) is reused verbatim,
    # so parallel consumers (chunk + greedy over the same corpus) share ONE
    # exchange via AQE stage reuse instead of re-hashing per consumer
    d = df if "shard" in df.columns else with_shard(df, shards, id_col, salt)
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    d = d.withColumn(
        "seq_off", F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long"))
    return (
        d.withColumn("pack_first", F.expr(f"seq_off DIV {capacity}"))
        .withColumn(
            "pack_last",
            F.expr(f"(seq_off + greatest({tokens_col}, 1) - 1) DIV {capacity}"))
        .withColumn("pack_off", (F.col("seq_off") % capacity).cast("long")))


def pack_greedy(df: DataFrame, capacity: int, shards: int = 16,
                id_col: str = "doc_id", tokens_col: str = "n_tokens",
                salt: int = 0) -> DataFrame:
    """Boundary-respecting greedy packing: returns
    ``(shard, id_col, tokens_col, pack_id, pack_pos)`` where ``pack_id``
    is the per-shard pack index (dense from 0, in key order) and
    ``pack_pos`` the document's position inside its pack.

    Rule (single branch, handles oversize uniformly): walking the shard in
    ascending key order with running pack total ``acc``, a document opens a
    new pack iff ``acc + n > capacity``; ``acc`` then restarts at ``n``.
    An oversize document (``n > capacity``) therefore always opens its own
    pack AND leaves ``acc > capacity`` so the next document opens a fresh
    one — oversize packs are always solo.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive (got {capacity})")
    if "shard" in df.columns:  # same reuse contract as pack_chunk
        d = df.select("shard", id_col, tokens_col)
    else:
        d = with_shard(df.select(id_col, tokens_col), shards, id_col, salt)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ns = pdf[tokens_col].to_numpy(dtype=np.int64)
        pack_id = np.zeros(len(ns), dtype=np.int64)
        pack_pos = np.zeros(len(ns), dtype=np.int64)
        acc = 0
        pid = -1
        pos = 0
        for i, n in enumerate(ns):
            if pid < 0 or acc + n > capacity:
                pid += 1
                pos = 0
                acc = int(n)
            else:
                pos += 1
                acc += int(n)
            pack_id[i] = pid
            pack_pos[i] = pos
        pdf = pdf.assign(pack_id=pack_id, pack_pos=pack_pos)
        return pdf[["shard", id_col, tokens_col, "pack_id", "pack_pos"]]

    schema = (f"shard int, {id_col} long, {tokens_col} long, "
              "pack_id long, pack_pos long")
    return d.groupBy("shard").applyInPandas(pack, schema)
