"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink timing with the SAME methodology as the frozen bench.py (warm
count, min/median over reps), plus .explain("formatted") capture.

Usage:
  python bench_extra.py [query ...]          # default: all HEADLINE
  PLANS_DIR=plans/r07 PLAN_SUFFIX=_before python bench_extra.py ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's r6
measurement SF), SPARK_GRAFT_CPUS (default 32), BENCH_REPS (default 3).
Prints one JSON line per query to stderr-shielded stdout, then a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, force, shield_stdout  # frozen harness pieces


def main() -> None:
    real = shield_stdout()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    plans_dir = os.environ.get("PLANS_DIR")
    plan_suffix = os.environ.get("PLAN_SUFFIX", "")
    names = sys.argv[1:] or HEADLINE

    from pyspark.sql import functions as F

    from cefspark.queries import REGISTRY
    from cefspark.session import get_spark
    from cefspark.udfs import decode_dataframe

    spark = get_spark(app_name="cefspark-bench-extra", cores=cpus,
                      shuffle_partitions=cpus)
    warm = (spark.range(cpus * 200)
            .withColumn("text", F.lit("CEF:0|a|b|c|d|e|f|k=v"))
            .repartition(cpus))
    decode_dataframe(warm).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = fn(spark, sf_dir)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{plan_suffix}.txt"),
                      "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        df.count()  # warm scan/plan caches, same as bench.py
        times = []
        for _ in range(reps):
            t0 = time.time()
            force(fn(spark, sf_dir))
            times.append(time.time() - t0)
        out[name] = {"min": round(min(times), 3),
                     "median": round(statistics.median(times), 3)}
        os.write(real, (json.dumps({name: out[name]}) + "\n").encode())
    total = round(sum(v["min"] for v in out.values()), 3)
    os.write(real, (json.dumps(
        {"sf_dir": sf_dir, "total_min": total, "queries": out}) + "\n"
    ).encode())
    spark.stop()


if __name__ == "__main__":
    main()
