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
    "cef_encode_sanitize",   # encode sanitizer chains
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",         # multi-index block join
    "dedup_clusters",        # iterative connected-components label propagation
    "emb_neardup_cosine",    # bucketed near-dup path
    "multimodal_codec_meta", # real WAV + BMP codecs through mapInPandas
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

    # Warm the Python worker fleet through the decode UDF (count() alone
    # prunes the UDF away): real long-running jobs run warm, and the first
    # headline query shouldn't absorb 32 worker cold-starts.
    from pyspark.sql import functions as F

    from cefspark.udfs import decode_dataframe
    warm = (spark.range(cpus * 200)
            .withColumn("text", F.lit("CEF:0|a|b|c|d|e|f|k=v"))
            .repartition(cpus))
    decode_dataframe(warm).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        fn(spark, sf_dir).count()  # warm scan/plan caches
        best = float("inf")
        # min-of-N damps shared-host CPU-steal bursts (this box's documented
        # noise source); the flagship gets extra repeats since its number is
        # the headline turns_per_sec
        reps = 5 if name == "cef_window_counts" else 3
        for _ in range(reps):
            t0 = time.time()
            force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    flagship = timings["cef_window_counts"] or 1e-9

    # Steady-state throughput: the sf0.1 flagship time is dominated by fixed
    # per-query overhead (~100k rows finish in ~0.2s of actual decode), so
    # also measure the same decode->enrich->route->counts job on a 2M-row
    # pre-written transcript table (the scaling study's input) where compute
    # dominates. This is the number comparable to BENCH/BASELINE.md.
    steady, steady_rows = None, None
    try:
        steady_dir = "/tmp/cefspark_scaling/transcripts_2000000"
        if not os.path.isdir(steady_dir):
            from cefspark import fixtures
            fixtures.transcripts_df(spark, 2_000_000, partitions=128).write.mode(
                "overwrite").parquet(steady_dir)
        from cefspark import pipeline as _pipe
        tdf = spark.read.parquet(steady_dir)
        # count the table actually on disk (a stale/partial dir must not
        # inflate the metric) and divide by that, not the nominal 2M
        steady_rows = tdf.count()

        def steady_job():
            return _pipe.sink_counts(_pipe.route(_pipe.enrich(
                decode_dataframe(tdf), spark))).collect()

        steady_job()  # warm
        best = float("inf")
        for _ in range(5):  # min-of-5: the steady number is the BASELINE.md claim
            t0 = time.time()
            steady_job()
            best = min(best, time.time() - t0)
        steady = round(steady_rows / best, 1)
    except Exception:
        # never lose the headline results to a failed steady-state add-on
        steady, steady_rows = None, None

    print(json.dumps({
        "metric": "cefspark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns_per_sec": round(n_turns / flagship, 1),
        "steady_turns_per_sec": steady,
        "steady_rows": steady_rows,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
