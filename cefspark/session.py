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
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
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
