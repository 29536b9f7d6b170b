"""Elasticsearch bulk-format codec (logstash-codec-es_bulk parity).

The bulk wire format is NDJSON with POSITIONAL semantics: an action
metadata line (single-key object — ``index``/``create``/``update``/
``delete`` carrying ``_index``/``_id``), followed by a source document
line for every verb except ``delete``. Whether a line is an action or a
source is decided by the running walk, not by its content (a source doc
may legitimately contain an ``index`` key), so decoding is inherently
sequential PER STREAM — the same bound as the multiline codec: the walk
runs inside ``applyInPandas`` grouped by the stream/shard key, parallel
across shards, sequential within (that is the semantic lower bound, not
an implementation shortcut).

Error-as-data: a malformed action line or a dangling action at
end-of-stream emits an op row with ``error`` set; the walk RESYNCS at
the offending line (treats the next line as an action candidate), so one
corrupt pair can't poison the rest of the shard.
"""

from __future__ import annotations

import json
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

__all__ = ["OPS_SCHEMA", "decode_es_bulk", "encode_es_bulk"]

_VERBS = ("index", "create", "update", "delete")

OPS_SCHEMA = StructType([
    StructField("shard", StringType()),
    StructField("op_idx", LongType()),
    StructField("verb", StringType()),
    StructField("target_index", StringType()),
    StructField("doc_id", StringType()),
    StructField("doc_json", StringType()),
    StructField("error", StringType()),
])


def _parse_action(line: str) -> Optional[tuple[str, Optional[str],
                                               Optional[str]]]:
    try:
        obj = json.loads(line)
    except Exception:
        return None
    if not isinstance(obj, dict) or len(obj) != 1:
        return None
    verb, meta = next(iter(obj.items()))
    if verb not in _VERBS or not isinstance(meta, (dict, type(None))):
        return None
    meta = meta or {}
    idx, did = meta.get("_index"), meta.get("_id")
    return verb, (str(idx) if idx is not None else None), \
        (str(did) if did is not None else None)


def decode_es_bulk(df: DataFrame, line_col: str = "line",
                   shard_col: str = "shard",
                   order_col: str = "line_no") -> DataFrame:
    """Walk bulk NDJSON into one row per operation.

    ``df`` carries (shard, line_no, line); ordering within a shard is by
    ``order_col``. Output: (shard, op_idx, verb, target_index, doc_id,
    doc_json, error) — ``doc_json`` is the raw source line (NULL for
    delete), canonical key order NOT imposed (the payload is opaque).
    """
    src = df.select(F.col(shard_col).alias("shard"),
                    F.col(order_col).alias("_ord"),
                    F.col(line_col).alias("_line"))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord")
        shard = pdf["shard"].iloc[0]
        rows = []
        pending = None  # (verb, index, id) awaiting its source line
        for raw in pdf["_line"]:
            line = "" if raw is None else str(raw)
            if not line.strip():
                continue  # bulk allows blank trailing lines
            if pending is not None:
                verb, idx, did = pending
                rows.append((shard, len(rows), verb, idx, did, line, None))
                pending = None
                continue
            act = _parse_action(line)
            if act is None:
                rows.append((shard, len(rows), None, None, None, line,
                             "expected action line"))
                continue
            verb, idx, did = act
            if verb == "delete":
                rows.append((shard, len(rows), verb, idx, did, None, None))
            else:
                pending = act
        if pending is not None:
            verb, idx, did = pending
            rows.append((shard, len(rows), verb, idx, did, None,
                         "dangling action at end of stream"))
        return pd.DataFrame(rows, columns=[f.name for f in OPS_SCHEMA.fields])

    return src.groupBy("shard").applyInPandas(walk, schema=OPS_SCHEMA)


def encode_es_bulk(df: DataFrame, verb_col: str = "verb",
                   index_col: str = "target_index",
                   id_col: str = "doc_id", doc_col: str = "doc_json",
                   out_col: str = "line") -> DataFrame:
    """Render op rows back to bulk lines: one output row per LINE (the
    action line, then the source line for non-delete verbs), ordered by
    (row position, line rank). Pure Catalyst — to_json for the action
    metadata, explode for the 1-or-2 line fan-out."""
    # real JSON generation (quotes/backslashes in ids escape correctly);
    # ignoreNullFields (default true) drops absent _index/_id
    meta = F.to_json(F.create_map(
        F.col(verb_col),
        F.struct(F.col(index_col).alias("_index"),
                 F.col(id_col).alias("_id"))))
    lines = F.when(F.col(verb_col) == "delete", F.array(meta)).otherwise(
        F.array(meta, F.col(doc_col)))
    return df.select(F.explode(lines).alias(out_col))
