"""Salted-repartition skew handling: with a hot vendor at ~60% of rows, the
write-side partition sizes must be bounded by ~hot_share/salt_buckets, not by
the whole hot sink landing on one task."""

from pyspark.sql import functions as F

from cefspark import fixtures, pipeline
from cefspark.udfs import decode_dataframe


def test_salted_repartition_bounds_hot_sink(spark):
    df = spark.createDataFrame(fixtures.transcripts_pdf(8000))
    routed = pipeline.route(pipeline.enrich(decode_dataframe(df), spark))

    salt_buckets = 8
    salted = pipeline.salted_repartition(routed, salt_buckets=salt_buckets,
                                         num_partitions=32)
    sizes = (salted.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    per_part = {r["pid"]: r["count"] for r in sizes}

    hot = routed.where(F.col("deviceVendor") == "security").count()
    assert hot > 8000 * 0.4  # fixture really is skewed
    biggest_sink = max(r["count"] for r in
                       routed.groupBy("sink_id").count().collect())
    # unsalted, the hottest sink (~1700 rows here) lands on ONE task; salting
    # must split it. Different (sink, salt) buckets can still hash-collide
    # into one partition, so the bound is vs the unsalted straggler, with
    # collision slack — measured ratio is ~0.5, assert < 0.75.
    unsalted = pipeline.salted_repartition(routed, salt_buckets=1, num_partitions=32)
    unsalted_max = max(r["count"] for r in unsalted.withColumn(
        "pid", F.spark_partition_id()).groupBy("pid").count().collect())
    assert unsalted_max >= biggest_sink  # the straggler really exists
    assert max(per_part.values()) <= unsalted_max * 0.75


def test_aqe_skew_join_splits_hot_partition(spark):
    """Scale evidence for the AQE skew-join path the session enables: a
    sort-merge join whose left side is 90% one key must come out of
    adaptive execution with the hot partition SPLIT (skew=true on the
    join node) instead of one straggler task. This is the runtime
    complement to salted_repartition — salting fixes skew we know about,
    AQE fixes the skew we meet at runtime."""
    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "512KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "false")
        # payload must be column-derived (a literal would be projected
        # AFTER the join and never ship through the shuffle) and
        # incompressible (partition skew is measured on compressed map
        # output), so: sha2 of the row id
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
            .alias("key"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"))
        right = spark.range(0, 20_000).select(
            F.col("id").alias("key"), F.lit("dim").alias("attr"))
        joined = left.join(right, "key")
        # collect() executes THIS DataFrame's own query execution (count()
        # would plan a separate pruned query and leave this one unfinalized)
        n = len(joined.collect())
        # hot key 0 matches once (270k rows); cold keys are ids ≡ 9 (mod
        # 10), of which those < 20000 hit the right side: 2000 rows
        assert n == 272_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
