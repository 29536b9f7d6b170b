"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., "turns_per_sec": ...}

Each query is forced with a noop write (full materialization — count() alone
would let Catalyst prune the decode UDF). The flagship pipeline number also
reports decode+route throughput in turns/sec, the BASELINE.md metric.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "cef_window_counts",     # flagship: decode -> enrich -> route -> windowed counts
    "cef_decode_extensions", # decode-heavy projection
    "cef_roundtrip",         # encode + decode
    "cef_ts_epoch",          # ECS timestamp normalization path
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality",
    "text_fingerprint",
    "ann_cosine_topk",
    "turn_ordering",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from cefspark.queries import REGISTRY, _events
    from cefspark.session import get_spark

    spark = get_spark(app_name="cefspark-bench", cores=cpus, shuffle_partitions=cpus)
    n_turns = _events(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        df.count()  # warm: plan + scan caches, exclude first-call JVM effects? no — keep one warm pass small
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    flagship = timings["cef_window_counts"] or 1e-9
    print(json.dumps({
        "metric": "cefspark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns_per_sec": round(n_turns / flagship, 1),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
