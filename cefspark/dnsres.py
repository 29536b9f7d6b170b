"""DNS enrichment filter (logstash-filter-dns parity), Spark-first.

The logstash plugin resolves hostnames (A) / reverse-resolves IPs (PTR)
per event with an in-process cache. Per-event network I/O is exactly what
a 100-TB Spark job must NOT do, so the scale-correct primary path here is
a **broadcast lookup join** against a resolution dim table (pre-resolved
zone export, enrichment snapshot, or the output of a bounded resolver
run) — one map-side join, no per-row RPC, no shuffle on the big side.

For genuinely dynamic resolution a ``resolver`` callable can be supplied
and runs inside an Arrow-batched pandas UDF with a per-executor
memoization cache (each distinct name resolved once per executor — the
plugin's cache semantics, minus the TTL which a batch job doesn't need).
This container has no network, so tests exercise the plumbing with a
deterministic fake; a real deployment passes ``socket.gethostbyname`` or
a dnspython call as ``resolver``.

``failed_tag`` mirrors the plugin's ``tag_on_timeout``/failure tagging:
unresolvable names keep the row, tag it, and leave the target NULL
(error-as-data, same contract as the CEF decode path).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dns_lookup", "dns_resolve_udf", "fake_resolver"]


def _tag_and_route(df, field, target, failed_tag, tags_col):
    """Shared post-resolution step: tag misses, route the hit value
    in-place (target=None) or into ``target``, drop the scratch column."""
    hit = F.col("_dns_addr").isNotNull()
    base_tags = (F.col(tags_col) if tags_col in df.columns
                 else F.lit(None).cast("array<string>"))
    result = df.withColumn(
        tags_col,
        F.when(~hit, F.array_union(F.coalesce(base_tags, F.array()),
                                   F.array(F.lit(failed_tag))))
        .otherwise(base_tags))
    if target is None:
        result = result.withColumn(
            field, F.when(hit, F.col("_dns_addr")).otherwise(F.col(field)))
    else:
        result = result.withColumn(target, F.col("_dns_addr"))
    return result.drop("_dns_addr")


def dns_lookup(df: DataFrame, field: str, lookup: DataFrame,
               name_col: str = "name", addr_col: str = "addr",
               target: Optional[str] = None,
               failed_tag: str = "_dnsfailure",
               tags_col: str = "tags") -> DataFrame:
    """Resolve ``field`` via a broadcast join against a ``lookup`` dim table.

    ``action => "replace"`` when ``target`` is None (the plugin's default
    replaces in place); otherwise the result lands in ``target`` and the
    source field is kept. Misses tag the row with ``failed_tag``.
    """
    if field not in df.columns:
        raise ValueError(f"dns_lookup: unknown field {field!r}")
    # one address per name (min-addr wins, deterministically): a zone
    # export with round-robin A records must never MULTIPLY event rows —
    # the logstash filter resolves to a single value per event
    dim = (lookup.select(F.col(name_col).alias("_dns_name"),
                         F.col(addr_col).alias("_dns_addr"))
           .groupBy("_dns_name")
           .agg(F.min("_dns_addr").alias("_dns_addr")))
    joined = df.join(F.broadcast(dim),
                     F.col(field) == F.col("_dns_name"), "left")
    return _tag_and_route(joined, field, target, failed_tag,
                          tags_col).drop("_dns_name")


def fake_resolver(name: str) -> Optional[str]:
    """Deterministic stand-in resolver for tests / no-network containers:
    maps a name to a stable 10.x.y.z address derived from its md5 (clearly
    fake — use a real resolver callable in deployments). Names ending in
    ``.invalid`` fail (return None), exercising the failure-tag path."""
    import hashlib

    if name is None or name.endswith(".invalid"):
        return None
    d = hashlib.md5(name.encode("utf-8")).digest()
    return f"10.{d[0]}.{d[1]}.{d[2]}"


def dns_resolve_udf(df: DataFrame, field: str,
                    resolver: Callable[[str], Optional[str]],
                    target: Optional[str] = None,
                    failed_tag: str = "_dnsfailure",
                    tags_col: str = "tags") -> DataFrame:
    """Resolve ``field`` with ``resolver`` inside an Arrow-batched pandas
    UDF, memoized per executor (each distinct name resolved once — the
    plugin's cache, sized by the executor's working set)."""
    if field not in df.columns:
        raise ValueError(f"dns_resolve_udf: unknown field {field!r}")

    @F.pandas_udf("string")
    def resolve(names: pd.Series) -> pd.Series:
        cache: dict = _resolver_cache(resolver)
        out = []
        for n in names:
            if n not in cache:
                try:
                    cache[n] = resolver(n) if n is not None else None
                except Exception:
                    cache[n] = None
            out.append(cache[n])
        return pd.Series(out, dtype=object)

    resolved = df.withColumn("_dns_addr", resolve(F.col(field)))
    return _tag_and_route(resolved, field, target, failed_tag, tags_col)


_CACHES: dict = {}


def _resolver_cache(resolver) -> dict:
    """One memo dict per resolver per executor process."""
    key = id(resolver)
    if key not in _CACHES:
        _CACHES[key] = {}
    return _CACHES[key]
