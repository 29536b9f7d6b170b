"""Two-parallelism scaling study (the sandbox substitute for the north rule's
N vs 4N executor criterion): run the identical pipeline job on the identical
pre-written input at local[N] and local[4N], report steady-state throughput at
both and scaling efficiency = (thr_4N / thr_N) / 4. Results are appended to
BENCH/BASELINE.md.

Methodology notes (measured on this 32-vcpu box):
* 32 vcpus = 16 physical cores + SMT. Raw single-process decode scales at
  ~0.93 efficiency through 8 processes but only ~0.66 from 8 -> 32 (SMT
  saturation — a *hardware* property, shown by the pure-multiprocessing curve
  in BENCH/BASELINE.md, independent of Spark). The gate is therefore
  measured within the physical-core envelope: N=2 vs 4N=8 by default
  (SCALING_LO overrides).
* Python worker startup (~2-10 s across the fleet) is a fixed cost amortized
  over hours on a real job; each level runs one warmup pass of the identical
  pipeline before any timed run.
* This host has BURSTY CPU steal. Sampling the two levels back-to-back in
  separate consecutive blocks lets a burst hit one level and not the other,
  distorting "efficiency" in either direction. The sampler therefore
  INTERLEAVES the levels — rounds of (hi, lo) pairs, fresh JVM per timed
  run — and reports the MEDIAN of the per-pair efficiencies: a burst
  spanning a whole pair inflates both walls roughly proportionally and
  cancels in the ratio; a burst hitting half a pair is voted out by the
  median across pairs. Per-pair spread > 10% still flags the run
  `contaminated` (discard and re-measure).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, time, sys
sys.path.insert(0, {root!r})
from cefspark.session import get_spark
from cefspark import pipeline
from cefspark.udfs import decode_dataframe

spark = get_spark(app_name="scaling", cores={cores}, shuffle_partitions={cores})
df = spark.read.parquet({inp!r})
n = df.count()

def job():
    # full-event decode: the north-star job writes per-sink tables, which
    # needs every decoded field (the slim counts-only projection is an
    # optimization for aggregate-only runs and is more bandwidth-bound)
    routed = pipeline.route(pipeline.enrich(decode_dataframe(df), spark))
    return pipeline.sink_counts(routed).collect()

def cpu_ticks():
    f = open("/proc/stat").readline().split()
    return int(f[8]), sum(int(x) for x in f[1:9])  # steal, total

job()  # warmup 1: python workers, broadcast, code paths
job()  # warmup 2: JIT steady state (first timed runs were ~10-25% slower)
s0, tot0 = cpu_ticks()
t0 = time.time(); counts = job(); wall = time.time() - t0
s1, tot1 = cpu_ticks()
import os as _os
# whole-machine steal understates what the RUN suffered by ncpu/cores: steal
# accrues on runnable vcpus (ours), while the denominator counts all vcpus —
# a local[2] run on 32 vcpus dilutes its steal 16x. Scale to busy-core terms
# so the flag threshold means "fraction of OUR cpu time stolen" at any level.
steal = (s1 - s0) / max(tot1 - tot0, 1) * (_os.cpu_count() / {cores})
print("RESULT " + json.dumps({{"cores": {cores}, "n": n, "wall": wall,
                               "thr": n / wall, "steal": steal,
                               "sinks": len(counts)}}))
spark.stop()
"""


def run_level(cores: int, inp: str) -> dict:
    code = RUN_TEMPLATE.format(root=ROOT, cores=cores, inp=inp)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=2400)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_turns = int(os.environ.get("SCALING_TURNS", "2000000"))
    lo = int(os.environ.get("SCALING_LO", "2"))
    hi = lo * 4
    rounds = int(os.environ.get("SCALING_ROUNDS", "3"))
    work = os.environ.get("SCALING_WORKDIR", "/tmp/cefspark_scaling")
    inp = os.path.join(work, f"transcripts_{n_turns}")

    if not os.path.exists(inp):
        sys.path.insert(0, ROOT)
        from cefspark import fixtures
        from cefspark.session import get_spark
        spark = get_spark(app_name="scaling-gen", cores=32)
        fixtures.transcripts_df(spark, n_turns, partitions=128).write.mode(
            "overwrite").parquet(inp)
        spark.stop()

    pairs = []
    for i in range(rounds):
        r_hi = run_level(hi, inp)
        r_lo = run_level(lo, inp)
        eff = r_lo["wall"] / (4 * r_hi["wall"])
        pairs.append({"hi_wall": r_hi["wall"], "lo_wall": r_lo["wall"], "eff": eff,
                      "steal": max(r_hi["steal"], r_lo["steal"])})
        print(f"pair {i + 1}/{rounds}: local[{hi}] {r_hi['wall']:.1f}s "
              f"(steal {r_hi['steal']:.1%}), local[{lo}] {r_lo['wall']:.1f}s "
              f"(steal {r_lo['steal']:.1%}) -> efficiency {eff:.3f}")

    effs = sorted(p["eff"] for p in pairs)
    eff = statistics.median(effs)
    # throughput from each level's best (least-stolen) wall
    thr_hi = n_turns / min(p["hi_wall"] for p in pairs)
    thr_lo = n_turns / min(p["lo_wall"] for p in pairs)
    spread = (effs[-1] - effs[0]) / effs[0]
    summary = {
        "n_turns": n_turns,
        "lo_cores": lo, "hi_cores": hi,
        "thr_lo": round(thr_lo, 1), "thr_hi": round(thr_hi, 1),
        "pair_efficiencies": [round(e, 3) for e in effs],
        "scaling_efficiency": round(eff, 3),
        "gate": "PASS" if eff >= 0.8 else "FAIL",
        "max_steal": round(max(p["steal"] for p in pairs), 4),
        # contamination rule (BENCH/BASELINE.md): per-pair efficiencies
        # spreading >10% mean steal bursts hit inside pairs; busy-core-scaled
        # in-run steal >5% means ≥5% of the cpu time OUR run needed was
        # stolen — inflating the narrow level's wall (false-PASS direction)
        # or the wide level's (false-FAIL) alike. Either way: discard the
        # affected pair and re-measure.
        "contaminated": bool(spread > 0.10
                             or max(p["steal"] for p in pairs) > 0.05),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"| n_turns | local[{lo}] turns/s | local[{hi}] turns/s | efficiency | gate |\n"
            f"|---|---|---|---|---|\n"
            f"| {n_turns} | {thr_lo:,.0f} | {thr_hi:,.0f} | {eff:.3f} | "
            f"{summary['gate']} (target >= 0.8)"
            f"{' — CONTAMINATED, discard' if summary['contaminated'] else ''} |\n\n"
            f"Job: decode -> broadcast enrich -> route -> windowed per-sink counts; "
            f"identical pre-written parquet input; INTERLEAVED (hi, lo) pairs, fresh "
            f"JVM + warmup per timed run; efficiency = median of per-pair ratios "
            f"{summary['pair_efficiencies']}.\n")


if __name__ == "__main__":
    main()
