"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "queries_median": {...}, "sf": ..., "turns_per_sec": ...,
 "steady_turns_per_sec": ..., "steady_turns_per_sec_local8": ...,
 "steady_scaling_efficiency": ...}

Each query is forced with a noop write (full materialization — count() alone
would let Catalyst prune the decode UDF). The flagship pipeline number also
reports decode+route throughput in turns/sec, the BASELINE.md metric.

Per-query statistics: "queries" carries the MIN over reps (damps this box's
documented shared-host CPU-steal bursts) and "queries_median" the MEDIAN —
round-over-round deltas should cite medians so code speedups separate from
the steal lottery (VERDICT r3 #4).

The steady-state 2M-row pipeline is measured at THREE parallelism levels:
local[$CPUS] in-process (the headline throughput), then local[2] and
local[8] in fresh follow-on JVMs after the wide session stops (levels never
compete for cores). The scaling-efficiency pair is 2 vs 8 — INSIDE the
physical-core envelope, matching the BASELINE.md gate; 8 vs 32 crosses the
SMT boundary where the hardware itself scales at ~0.66 (see the pure-Python
envelope table in BENCH/BASELINE.md). Each steady measurement records its
busy-core-scaled /proc/stat steal so a contaminated window is visible in
the artifact. BENCH_rN.json alone then evidences the north rule's
two-cluster-size criterion (steady_scaling_efficiency = (thr8/8)/(thr2/2));
the steal-instrumented interleaved-pairs study in bench/scaling.py remains
the rigorous methodology.

Round 6 self-sufficiency (VERDICT r5 #1/#5): fd 1 is pointed at stderr for
the JVM's lifetime so stack fragments can never pollute the artifact (only
the final JSON line reaches the real stdout); contaminated scaling legs are
retried up to 3× so `steady_scaling_efficiency` is never null (residual
contamination stays visible in the per-level flags + attempt counts);
`skew_salted_speedup` times the production `write_sinks` fan-out salted vs
unsalted on the skewed steady table; and `variants` attributes per-variant
wall time inside merged gates via constant-folded union-branch pruning.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
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
    "text_lang_id",          # round 4: trigram classifier, broadcast-join scoring
    "sample_split",          # round 4: deterministic split + stratified sampleBy
    "text_token_count",      # round 6: + sequence packing (chunk window / greedy applyInPandas)
    "event_sessions",        # round 4: sessionizer + as-of + interval joins
    "ann_cosine_topk",
    "turn_ordering",
]

STEADY_DIR = os.environ.get("SPARK_GRAFT_STEADY_DIR",
                            "/tmp/cefspark_scaling/transcripts_2000000")


def shield_stdout() -> int:
    """Point fd 1 at stderr for the rest of the process (the JVM inherits
    it at launch, so Spark/py4j stack fragments can never land in the
    artifact's stdout — VERDICT r5 'what's wrong' #1) and return a dup of
    the REAL stdout reserved for the single JSON metrics line."""
    real = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")  # Python prints follow fd 1
    return real


def emit(real_fd: int, obj) -> None:
    os.write(real_fd, (json.dumps(obj) + "\n").encode())


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _cpu_ticks():
    f = open("/proc/stat").readline().split()
    return int(f[8]), sum(int(x) for x in f[1:9])  # steal, total


def measure_steady(spark, cores: int, reps: int = 5):
    """(min_sec, median_sec, rows, max_steal) for the 2M-row decode->enrich->
    route->counts pipeline on the pre-written transcript table. Steal is
    scaled to busy-core terms (whole-machine steal dilutes a narrow run's
    steal by ncpu/cores) and the MAX over timed runs is reported — nonzero
    values mean the window was contended and the numbers undercount."""
    from cefspark import pipeline as _pipe
    from cefspark.udfs import decode_dataframe

    tdf = spark.read.parquet(STEADY_DIR)
    # count the table actually on disk (a stale/partial dir must not
    # inflate the metric) and divide by that, not the nominal 2M
    rows = tdf.count()

    def job():
        return _pipe.sink_counts(_pipe.route(_pipe.enrich(
            decode_dataframe(tdf), spark))).collect()

    job()  # warmup 1: python workers, broadcast, code paths
    job()  # warmup 2: JIT steady state
    times, steals = [], []
    for _ in range(reps):
        s0, tot0 = _cpu_ticks()
        t0 = time.time()
        job()
        times.append(time.time() - t0)
        s1, tot1 = _cpu_ticks()
        steals.append((s1 - s0) / max(tot1 - tot0, 1)
                      * (os.cpu_count() / cores))
    return min(times), statistics.median(times), rows, round(max(steals), 4)


def measure_streaming(spark, reps: int = 3):
    """(min_sec, median_sec, rows, n_microbatches, med_batch_ms) for the
    Structured Streaming pipeline shape (VERDICT r4 'what's missing' #4):
    readStream over the 2M-row transcript table, decode -> enrich -> route ->
    watermarked windowed counts, availableNow drain through a fresh
    checkpoint each rep (so every rep re-processes all files). Wall time
    covers the full drain incl. micro-batch scheduling overhead — the number
    a capacity plan for the streaming mode actually needs."""
    import shutil
    import tempfile

    from cefspark import streaming as _streaming

    rows = spark.read.parquet(STEADY_DIR).count()

    def drain(tag):
        ckpt = tempfile.mkdtemp(prefix=f"cefspark_stream_ckpt_{tag}_")
        shutil.rmtree(ckpt, ignore_errors=True)
        # the 2M-row steady table is 32 files -> 8 micro-batches of ~250k
        # rows: enough batches that scheduling overhead is measured, big
        # enough that compute still dominates each batch
        stream = _streaming.read_transcript_stream(spark, STEADY_DIR,
                                                   max_files_per_trigger=4)
        counts = _streaming.windowed_sink_counts(
            _streaming.routed_stream(stream, spark))
        q = (counts.writeStream.format("noop")
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        prog = q.recentProgress
        shutil.rmtree(ckpt, ignore_errors=True)
        batches = [p for p in prog if p["numInputRows"] > 0]
        durs = [p["batchDuration"] for p in batches]
        return len(batches), (statistics.median(durs) if durs else None)

    drain("warm")  # python workers + state-store code paths
    times, nb, med_ms = [], None, None
    for r in range(reps):
        t0 = time.time()
        nb, med_ms = drain(f"r{r}")
        times.append(time.time() - t0)
    return (min(times), statistics.median(times), rows, nb, med_ms)


def measure_skew(spark, cpus: int):
    """Skew-defense evidence for the production fan-out write
    (``write_sinks``: repartition on (sink_id, _salt) then
    partitionBy(sink_id) parquet) on the 2M-row steady table, where the
    hottest sink carries ~21% of all rows (VERDICT r4 #7 / r5 #1b).

    Two numbers, both vs salt_buckets=1 at 4 waves/core:

    - straggler ROWS ratio (the `tests/test_skew.py` scenario, measured
      deterministic): max rows any task receives, unsalted / salted. This
      is the quantity that decides survival at 100 TB — unsalted, one task
      writes the whole hot sink no matter the cluster size; salted, the
      bound is ~hot_share/salt_buckets + collision slack.
    - WALL ratio at this fixture scale (interleaved min-of-3 per leg):
      honest but modest here, because a 415k-row straggler parquet write
      costs seconds while at production scale it costs hours; commit/file
      overhead partially offsets the win at 2M rows.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cefspark import pipeline as _pipe
    from cefspark.udfs import decode_dataframe

    num_partitions = cpus * 4  # 4 waves/core: keys >> partitions, AQE-friendly
    tdf = spark.read.parquet(STEADY_DIR)
    routed = _pipe.route(_pipe.enrich(decode_dataframe(tdf), spark))
    routed = routed.persist()
    routed.count()  # materialize: decode paid here, not in the timed legs

    def max_task_rows(salt_buckets: int) -> int:
        sized = _pipe.salted_repartition(routed, salt_buckets=salt_buckets,
                                         num_partitions=num_partitions)
        return max(r["count"] for r in
                   sized.withColumn("pid", F.spark_partition_id())
                   .groupBy("pid").count().collect())

    out = tempfile.mkdtemp(prefix="cefspark_skew_")
    try:
        rows_unsalted = max_task_rows(1)
        rows_salted = max_task_rows(8)

        walls = {1: [], 8: []}
        for r in range(3):
            for sb in (8, 1):  # interleaved; warm order favors unsalted
                d = os.path.join(out, f"s{sb}_{r}")
                t0 = time.time()
                _pipe.write_sinks(routed, d, salt_buckets=sb,
                                  num_partitions=num_partitions)
                walls[sb].append(time.time() - t0)
                shutil.rmtree(d, ignore_errors=True)
        return {
            "skew_unsalted_max_task_rows": rows_unsalted,
            "skew_salted_max_task_rows": rows_salted,
            "skew_straggler_rows_ratio": round(rows_unsalted / rows_salted, 3),
            "skew_unsalted_write_sec": round(min(walls[1]), 3),
            "skew_salted_write_sec": round(min(walls[8]), 3),
            "skew_salted_speedup": round(min(walls[1]) / min(walls[8]), 3),
        }
    finally:
        routed.unpersist()
        shutil.rmtree(out, ignore_errors=True)


def measure_variants(spark, sf_dir: str, name: str, fn, reps: int = 2):
    """Per-variant wall time inside a merged gate (VERDICT r5 #5): filter
    the gate's union on its ``variant`` literal — Catalyst constant-folds
    the non-matching branches away, so each timing runs ONLY that
    variant's subtree, with zero registry restructuring. Round-over-round
    deltas can then cite `variants[gate][v]` instead of confounding gate
    growth with regressions."""
    from pyspark.sql import functions as F

    df = fn(spark, sf_dir)
    disc = next((c for c in ("variant", "codec") if c in df.columns), None)
    if disc is None:
        return None
    names = sorted(r[disc] for r in df.select(disc).distinct().collect())
    if len(names) < 2:
        return None
    out = {}
    for v in names:
        times = []
        for _ in range(reps):
            t0 = time.time()
            force(fn(spark, sf_dir).where(F.col(disc) == v))
            times.append(time.time() - t0)
        out[v] = round(min(times), 3)
    return out


def steady_only(cores: int) -> None:
    """Subprocess mode: fresh JVM at local[cores], steady measurement only."""
    from cefspark.session import get_spark

    real = shield_stdout()
    spark = get_spark(app_name=f"cefspark-bench-steady{cores}", cores=cores,
                      shuffle_partitions=cores)
    mn, med, rows, steal = measure_steady(spark, cores, reps=3)
    # min/median spread far beyond run-to-run jitter means the window was
    # disturbed in a way /proc/stat steal cannot see (IO, thermal, another
    # guest without steal accounting) — flag it so efficiency consumers
    # know to discard
    emit(real, {"min_sec": mn, "median_sec": med, "rows": rows,
                "steal": steal,
                "contaminated": bool(med > mn * 1.25 or steal > 0.05)})
    spark.stop()


def run_level(cores: int, max_attempts: int = 3) -> tuple[dict, int]:
    """One scaling leg in a fresh JVM, retried while the measurement window
    is contaminated (steal burst / disturbed spread). Returns the first
    clean attempt, else the least-stolen one, plus the attempt count — so
    `steady_scaling_efficiency` is NEVER null (VERDICT r5 #1a); residual
    contamination stays visible through the per-level flags instead."""
    attempts = []
    for _ in range(max_attempts):
        env = dict(os.environ, SPARK_GRAFT_STEADY_ONLY=str(cores))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        attempts.append(json.loads(line))
        if not attempts[-1]["contaminated"]:
            break
    best = min(attempts, key=lambda a: (a["contaminated"], a["steal"]))
    return best, len(attempts)


def main() -> None:
    if os.environ.get("SPARK_GRAFT_STEADY_ONLY"):
        steady_only(int(os.environ["SPARK_GRAFT_STEADY_ONLY"]))
        return

    real_stdout = shield_stdout()
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
    timings_median: dict[str, float] = {}
    variants: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        fn(spark, sf_dir).count()  # warm scan/plan caches
        reps = 5 if name == "cef_window_counts" else 3
        times = []
        for _ in range(reps):
            t0 = time.time()
            force(fn(spark, sf_dir))
            times.append(time.time() - t0)
        timings[name] = round(min(times), 3)
        timings_median[name] = round(statistics.median(times), 3)
        try:
            v = measure_variants(spark, sf_dir, name, fn)
            if v:
                variants[name] = v
        except Exception:
            pass  # attribution is advisory; never lose the gate timing

    total = round(sum(timings.values()), 3)
    flagship = timings["cef_window_counts"] or 1e-9

    # Steady-state throughput at the wide level: the sf0.1 flagship time is
    # dominated by fixed per-query overhead (~100k rows finish in ~0.2s of
    # actual decode), so also measure the same pipeline on a 2M-row
    # pre-written transcript table where compute dominates.
    steady = steady_median = steady_rows = steady_steal = None
    steady_attempts = 0
    try:
        if not os.path.isdir(STEADY_DIR):
            from cefspark import fixtures
            fixtures.transcripts_df(spark, 2_000_000, partitions=128).write.mode(
                "overwrite").parquet(STEADY_DIR)
        # the wide leg gets the same contamination-retry treatment as the
        # subprocess scaling legs: a stolen window undercounts the headline
        # throughput, so retry into a quieter one (bounded)
        best = None
        for steady_attempts in range(1, 4):
            cur = measure_steady(spark, cpus, reps=5)
            if best is None or cur[3] < best[3]:
                best = cur
            if cur[3] <= 0.05 and cur[1] <= cur[0] * 1.25:
                break
        mn, med, steady_rows, steady_steal = best
        steady = round(steady_rows / mn, 1)
        steady_median = round(steady_rows / med, 1)
    except Exception:
        # never lose the headline results to a failed steady-state add-on
        steady = steady_median = steady_rows = steady_steal = None

    stream_thr = stream_thr_med = stream_nb = stream_batch_ms = None
    try:
        if steady_rows:
            smn, smed, srows, stream_nb, stream_batch_ms = \
                measure_streaming(spark, reps=3)
            stream_thr = round(srows / smn, 1)
            stream_thr_med = round(srows / smed, 1)
    except Exception:
        stream_thr = stream_thr_med = stream_nb = stream_batch_ms = None

    skew: dict = {}
    try:
        if steady_rows:
            skew = measure_skew(spark, cpus)
    except Exception:
        skew = {}

    spark.stop()

    # Scaling-evidence pair local[2] vs local[8] in FRESH follow-on JVMs
    # (the wide session is stopped, so levels never compete for cores).
    # TWO interleaved (hi, lo) pairs, each leg retried while its own
    # window is flagged contaminated (run_level), then the pair with the
    # lower residual steal is cited: a steadily-noisy host window can
    # depress one level without tripping any per-leg flag (observed:
    # 0.671 from legs at 1.9%/1.2% steal in a window whose quiet reading
    # was 0.881), and pairing bounds that failure mode the same way the
    # bench/scaling.py study does. Efficiency is never null; both pair
    # readings stay in the artifact.
    levels: dict[int, dict] = {}
    level_attempts: dict[int, int] = {}
    eff = None
    eff_adj = None
    pair_readings: list = []
    pair_readings_adj: list = []
    try:
        if steady is not None:
            pairs = []
            for _ in range(2):
                pl, pa = {}, {}
                for cores in (8, 2):
                    pl[cores], pa[cores] = run_level(cores, max_attempts=2)
                thr8 = pl[8]["rows"] / pl[8]["min_sec"]
                thr2 = pl[2]["rows"] / pl[2]["min_sec"]
                # busy-time normalization: a leg that lost `steal` of its
                # CPU windows to the hypervisor would have finished in
                # ~min_sec*(1-steal) on a quiet host — the adjusted ratio
                # estimates the quiet-machine efficiency when BOTH raw
                # pairs are steal-contaminated (raw stays the headline)
                a8 = pl[8]["rows"] / (pl[8]["min_sec"] * (1 - pl[8]["steal"]))
                a2 = pl[2]["rows"] / (pl[2]["min_sec"] * (1 - pl[2]["steal"]))
                pairs.append({
                    "eff": round((thr8 / 8) / (thr2 / 2), 3),
                    "eff_adj": round((a8 / 8) / (a2 / 2), 3),
                    "steal": max(pl[8]["steal"], pl[2]["steal"]),
                    "contaminated": bool(pl[8]["contaminated"]
                                         or pl[2]["contaminated"]),
                    "levels": pl, "attempts": pa,
                })
            pair_readings = [p["eff"] for p in pairs]
            pair_readings_adj = [p["eff_adj"] for p in pairs]
            best = min(pairs, key=lambda p: (p["contaminated"], p["steal"]))
            levels, level_attempts = best["levels"], best["attempts"]
            # two CLEAN pairs are independent measurements of the same
            # quantity: cite their mean (unbiased, halves the variance)
            # rather than discarding one; under contamination fall back to
            # the least-stolen pair (selection by noise, not by outcome)
            clean = [p for p in pairs if not p["contaminated"]]
            if len(clean) >= 2:
                eff = round(sum(p["eff"] for p in clean) / len(clean), 3)
                eff_adj = round(
                    sum(p["eff_adj"] for p in clean) / len(clean), 3)
            else:
                eff = best["eff"]
                eff_adj = best["eff_adj"]
    except Exception:
        levels, eff, pair_readings = {}, None, []
        eff_adj, pair_readings_adj = None, []

    def thr(cores, stat):
        d = levels.get(cores)
        return round(d["rows"] / d[stat], 1) if d else None

    emit(real_stdout, {
        "metric": "cefspark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": timings_median,
        "variants": variants,
        "sf": sf,
        "turns_per_sec": round(n_turns / flagship, 1),
        "steady_turns_per_sec": steady,
        "steady_turns_per_sec_median": steady_median,
        "steady_steal": steady_steal,
        "steady_attempts": steady_attempts,
        "steady_turns_per_sec_local8": thr(8, "min_sec"),
        "steady_turns_per_sec_local8_median": thr(8, "median_sec"),
        "steady_local8_steal": levels.get(8, {}).get("steal"),
        "steady_local8_contaminated": levels.get(8, {}).get("contaminated"),
        "steady_turns_per_sec_local2": thr(2, "min_sec"),
        "steady_turns_per_sec_local2_median": thr(2, "median_sec"),
        "steady_local2_steal": levels.get(2, {}).get("steal"),
        "steady_local2_contaminated": levels.get(2, {}).get("contaminated"),
        "steady_scaling_efficiency": eff,
        "steady_scaling_efficiency_steal_adjusted": eff_adj,
        "steady_scaling_pair": "local[2] vs local[8] (physical-core envelope)",
        "steady_scaling_pair_readings": pair_readings,
        "steady_scaling_pair_readings_steal_adjusted": pair_readings_adj,
        "steady_scaling_attempts": {str(k): v for k, v in level_attempts.items()},
        "steady_rows": steady_rows,
        "streaming_turns_per_sec": stream_thr,
        "streaming_turns_per_sec_median": stream_thr_med,
        "streaming_n_microbatches": stream_nb,
        "streaming_batch_ms_median": stream_batch_ms,
        **skew,
        "cpus": cpus,
    })


if __name__ == "__main__":
    main()
