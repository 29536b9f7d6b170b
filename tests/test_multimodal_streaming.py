"""Multimodal plumbing (real schema/batching, stubbed codec) and the
Structured Streaming pipeline mode."""

import pytest
from pyspark.sql import functions as F

from cefspark import fixtures, multimodal, pipeline, streaming


def test_multimodal_feature_extraction_deterministic(spark):
    assets = multimodal.synthesize_assets(spark, 30)
    feats = multimodal.extract_features(assets).collect()
    assert len(feats) == 30
    by_id = {r["asset_id"]: r for r in feats}
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic across runs
    feats2 = {r["asset_id"]: r["features"] for r in
              multimodal.extract_features(assets).collect()}
    assert feats2["asset-000007"] == by_id["asset-000007"]["features"]
    assert by_id["asset-000000"]["n_bytes"] == len(
        assets.where(F.col("asset_id") == "asset-000000").first()["payload"])


def test_multimodal_real_decode_is_explicit_stub(spark):
    assets = multimodal.synthesize_assets(spark, 3)
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(assets, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_only_videos(spark):
    assets = multimodal.synthesize_assets(spark, 30)
    frames = multimodal.sample_frames(assets, every_n=1, max_frames=3).collect()
    vids = {r["asset_id"] for r in assets.where(F.col("kind") == "video").collect()}
    assert {r["asset_id"] for r in frames} == vids
    assert all(0 <= r["frame_idx"] < 3 for r in frames)
    assert all(len(r["frame_payload"]) <= 32 for r in frames)


def test_resize_stub_tags_meta(spark):
    assets = multimodal.synthesize_assets(spark, 3)
    out = multimodal.resize_stub(assets, 224, 224).first()
    assert out["meta"]["resize"] == "224x224"


def test_streaming_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    pdf = fixtures.transcripts_pdf(2000)
    sdf = spark.createDataFrame(pdf)
    sdf.repartition(4).write.parquet(src)

    q = streaming.run_to_memory(spark, src, "scounts")
    q.awaitTermination(120)
    got = {(r["sink_id"], r["window_start"]): r["n_events"]
           for r in spark.sql("select * from scounts").collect()}

    batch = pipeline.sink_counts(
        pipeline.route(pipeline.enrich(pipeline.decode(sdf), spark))).collect()
    exp = {(r["sink_id"], r["window_start"]): r["n_events"] for r in batch}
    assert got == exp and sum(got.values()) == 2000


def test_streaming_parquet_sink_with_checkpoint(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame(fixtures.transcripts_pdf(500)).write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = streaming.run_to_parquet(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 500
    # re-run with same checkpoint: file source is exactly-once -> no dup rows
    q2 = streaming.run_to_parquet(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 500


def test_stateful_conversation_stats(spark, tmp_path):
    src = str(tmp_path / "conv_in")
    pdf = fixtures.transcripts_pdf(1600)
    sdf = spark.createDataFrame(pdf)
    # files land at the top level (FileStreamSource does not recurse);
    # maxFilesPerTrigger=2 forces several micro-batches so state must carry
    sdf.where(F.col("turn_idx") < 4).coalesce(2).write.parquet(src)
    sdf.where(F.col("turn_idx") >= 4).coalesce(2).write.mode("append").parquet(src)

    q = streaming.run_conversation_stats(spark, src, "convstats",
                                         max_files_per_trigger=2)
    q.awaitTermination(120)
    got = spark.sql(
        "select conv_id, max(n_turns) n_turns, max(n_failed) n_failed,"
        " max(last_turn_idx) last_turn_idx from convstats group by conv_id").collect()
    got_m = {r["conv_id"]: (r["n_turns"], r["n_failed"], r["last_turn_idx"]) for r in got}

    batch = pipeline.decode(sdf)
    exp = {r["conv_id"]: (r["n"], r["f"], r["l"]) for r in
           batch.groupBy("conv_id").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("f"),
               F.max("turn_idx").alias("l")).collect()}
    assert got_m == exp
    assert all(v[0] == 8 for v in got_m.values())  # 8 turns per conversation
