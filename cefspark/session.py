"""SparkSession factory with the engine's standard configuration.

Tuned for the pipeline's shape: Arrow-batched pandas UDFs on the hot path,
AQE for runtime shuffle re-planning and skew handling, and bounded Arrow
batches so the decode UDF's pandas working set stays predictable regardless
of input partition size (the 100 TB design constraint: memory per task is a
function of maxRecordsPerBatch, not file size).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH = 10_000


def get_spark(app_name: str = "cefspark", cores: Optional[int] = None,
              shuffle_partitions: Optional[int] = None,
              arrow_batch: int = DEFAULT_ARROW_BATCH,
              extra_conf: Optional[dict] = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or (os.cpu_count() or 8)
    # Local-mode shuffle blocks never cross a network — map output is read
    # back from the same host's page cache — so shuffle compression is pure
    # CPU overhead there (measured −12% on the shuffle-heavy union gates;
    # guide §2.3: "for [local transport] compression can be pure overhead —
    # measure"). Any non-local master keeps Spark's codec defaults: at
    # cluster scale the bytes DO cross NICs and compression pays for
    # itself. Override either way with CEFSPARK_SHUFFLE_COMPRESS=true|false.
    shuffle_compress = os.environ.get(
        "CEFSPARK_SHUFFLE_COMPRESS",
        "false" if master.startswith("local") else "true")
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.shuffle.compress", shuffle_compress)
        .config("spark.shuffle.spill.compress", shuffle_compress)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CEFSPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
