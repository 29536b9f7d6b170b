"""Raw-stream framing (D1), binary/UTF-8 ingest (D4), decode metrics
accumulators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cefspark import fixtures, sources
from cefspark.udfs import DecodeMetrics, decode_dataframe

CANON = ("CEF:0|security|threatmanager|1.0|100|"
         "trojan successfully stopped|10|src=10.0.0.192 spt=1232")


def test_read_raw_lines_custom_delimiter(spark, tmp_path):
    # the reference's delimiter buffering (cef.rb:211-222) as scan framing
    raw = (tmp_path / "events.log")
    raw.write_bytes((CANON + "\r\n" + CANON + "\r\n" + "garbage" + "\r\n").encode())
    df = sources.read_raw_lines(spark, str(raw), delimiter="\\r\\n")
    assert df.count() == 3  # trailing delimiter -> no empty frame
    dec = decode_dataframe(df)
    assert dec.where(F.col("error").isNull()).count() == 2
    assert dec.where(F.col("error").isNotNull()).count() == 1


def test_read_raw_lines_default_newline(spark, tmp_path):
    raw = (tmp_path / "plain.log")
    raw.write_text(CANON + "\n" + CANON + "\n")
    assert sources.read_raw_lines(spark, str(raw)).count() == 2


def test_binary_ingest_valid_and_invalid_utf8(spark):
    # cef_spec.rb:973-1009: UTF-8 higher-plane survives; non-UTF-8 fails early
    utf8_payload = ("CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|"
                    "target=aaaaaああああaaaa").encode("utf-8")
    sjis_payload = ("CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|"
                    "msg=こんにちは").encode("shift_jis")
    df = spark.createDataFrame([(1, utf8_payload), (2, sjis_payload), (3, None)],
                               "id int, payload binary")
    out = {r["id"]: r for r in sources.decode_binary_dataframe(df).collect()}
    assert out[1]["error"] is None
    assert out[1]["extensions"]["target"] == "aaaaaああああaaaa"
    assert out[2]["tags"] == ["_cefparsefailure"]
    assert out[2]["error"] == "invalid byte sequence in UTF-8"
    assert out[2]["message"] is not None  # replacement-char rendering kept
    assert out[3]["error"] == "null payload"


def test_decode_metrics_accumulators(spark):
    pdf = fixtures.transcripts_pdf(600)
    df = spark.createDataFrame(pdf)
    metrics = DecodeMetrics(spark)
    dec = decode_dataframe(df, metrics=metrics)
    n_failed_truth = dec.where(F.col("error").isNotNull()).count()
    got = metrics.as_dict()
    assert got["failed"] == n_failed_truth > 0
    assert got["parsed"] == 600 - n_failed_truth


def test_read_raw_lines_over_multi_file_directory(spark, tmp_path):
    # distributed framing: each part file is an independent byte stream;
    # frames never span files, and the union covers every frame exactly once
    d = tmp_path / "rawdir"
    d.mkdir()
    (d / "part-0.log").write_text("a1\r\nb1\r\n")
    (d / "part-1.log").write_text("c2\r\nd2")
    df = sources.read_raw_lines(spark, str(d), delimiter="\\r\\n")
    assert sorted(r["text"] for r in df.collect()) == ["a1", "b1", "c2", "d2"]


def test_jsonl_and_csv_transcript_sources_roundtrip(spark, tmp_path):
    """JSONL and CSV ingestion produce the SAME decoded pipeline results as
    the parquet path on identical transcripts; malformed records land in
    _corrupt_record instead of failing the batch."""
    import json as _json

    from pyspark.sql import functions as F

    from cefspark import fixtures, sources
    from cefspark.udfs import decode_dataframe

    pdf = fixtures.transcripts_pdf(200)
    ref = decode_dataframe(spark.createDataFrame(pdf))
    ref_counts = {r["deviceVendor"]: r["n"] for r in
                  ref.groupBy("deviceVendor").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}

    jl = tmp_path / "t.jsonl"
    with open(jl, "w") as f:
        for _, r in pdf.iterrows():
            f.write(_json.dumps({
                "conv_id": r["conv_id"], "turn_idx": int(r["turn_idx"]),
                "role": r["role"], "text": r["text"], "tool": r["tool"],
                "ts": r["ts"].strftime("%Y-%m-%dT%H:%M:%S")}) + "\n")
        f.write("{ not valid json\n")
    # Spark disallows queries touching ONLY the corrupt-record column on a
    # raw json scan; cache first (the documented pattern)
    jdf = sources.read_transcripts_jsonl(spark, str(jl)).cache()
    bad = jdf.where(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    good = jdf.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    got = {r["deviceVendor"]: r["n"] for r in
           decode_dataframe(good).groupBy("deviceVendor")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == ref_counts
    assert dict(good.dtypes)["ts"] == "timestamp"

    cv = tmp_path / "t.csv"
    with open(cv, "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n")
        for _, r in pdf.iterrows():
            text = '"' + str(r["text"]).replace('"', '""') + '"'
            f.write(f'{r["conv_id"]},{int(r["turn_idx"])},{r["role"]},{text},'
                    f'{r["tool"] or ""},{r["ts"].strftime("%Y-%m-%d %H:%M:%S")}\n')
    cdf = sources.read_transcripts_csv(spark, str(cv))
    goodc = cdf.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    gotc = {r["deviceVendor"]: r["n"] for r in
            decode_dataframe(goodc).groupBy("deviceVendor")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert gotc == ref_counts  # CSV quoting survives commas/quotes in payloads
    jdf.unpersist()
