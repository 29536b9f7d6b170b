"""Operator queries + matching DuckDB oracle SQL (the correctness gate).

Each entry pairs a Spark query (spark, sf_dir) -> DataFrame with an ANSI-SQL
oracle DuckDB runs over the same parquet tables. CEF payloads are *built
deterministically from the events table with identical expressions on both
sides*, then the Spark side actually parses them with the engine while the
oracle states the expected output directly from the source columns — so a
match proves the decode semantics, not just that two parsers agree.

Column names are aligned 1:1 between query and oracle (the driver hashes
values after sorting columns by name). Timestamps are rendered as strings on
both sides to avoid tz-representation drift.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, pipeline, similarity, textops
from .encoder import EncoderConfig
from .parser import DecodeConfig
from .udfs import decode_dataframe, encode_dataframe, ext

NOW = "2026-08-16T00:00:00Z"  # injected clock for ECS yearless inference


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Fan a low-parallelism scan out to the executor pool.

    The sf* testdata ships one unsplittable row group per table, which would
    pin the downstream UDF stages to 1-2 cores. At production scale a table
    has thousands of splits and this branch never fires; here a round-robin
    repartition of a few MB buys full parallelism for CPU-bound stages.
    """
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(f"{sf_dir}/events.parquet"))


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# --- shared payload builders (Spark side; SQL mirrors live in the oracle) -----

def _vendor_col():
    m = F.col("event_id") % 10
    return (F.when(m <= 5, "security").when(m == 6, "FooBar")
            .when(m == 7, "Vendor").when(m == 8, "fun").otherwise("acme"))


_VENDOR_SQL = ("CASE WHEN event_id % 10 <= 5 THEN 'security' "
               "WHEN event_id % 10 = 6 THEN 'FooBar' "
               "WHEN event_id % 10 = 7 THEN 'Vendor' "
               "WHEN event_id % 10 = 8 THEN 'fun' ELSE 'acme' END")

_SEV_SQL = "CAST(event_id % 11 AS VARCHAR)"


def _sev_col():
    return (F.col("event_id") % 11).cast("string")


def _canonical_payload():
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        F.lit("CEF:0|"), _vendor_col(), F.lit("|threatmanager|1.0|"),
        s(F.col("event_id") % 1000), F.lit("|event "), F.col("event_type"),
        F.lit("|"), _sev_col(),
        F.lit("|src=10.0.0."), s(F.col("event_id") % 256),
        F.lit(" spt="), s(F.col("event_id") % 65536),
        F.lit(" suser=user"), s(F.col("user_id")),
        F.lit(" msg=turn "), s(F.col("event_id")), F.lit(" of note outcome=Success"),
    )


_CANONICAL_PAYLOAD_SQL = (
    "'CEF:0|' || {v} || '|threatmanager|1.0|' || CAST(event_id % 1000 AS VARCHAR)"
    " || '|event ' || event_type || '|' || {s}"
    " || '|src=10.0.0.' || CAST(event_id % 256 AS VARCHAR)"
    " || ' spt=' || CAST(event_id % 65536 AS VARCHAR)"
    " || ' suser=user' || CAST(user_id AS VARCHAR)"
    " || ' msg=turn ' || CAST(event_id AS VARCHAR) || ' of note outcome=Success'"
).format(v=_VENDOR_SQL, s=_SEV_SQL)


def _with_payload(df: DataFrame, mixed_failures: bool = False) -> DataFrame:
    text = _canonical_payload()
    if mixed_failures:
        text = F.when(F.col("event_id") % 13 == 0,
                      F.concat(F.lit("not cef "), F.col("event_id").cast("string"))
                      ).otherwise(text)
    return df.withColumn("text", text)


_MIXED_TEXT_SQL = (
    "CASE WHEN event_id % 13 = 0 THEN 'not cef ' || CAST(event_id AS VARCHAR) "
    f"ELSE {_CANONICAL_PAYLOAD_SQL} END"
)

_BAND_SQL = ("CASE WHEN event_id % 11 <= 3 THEN 'low' "
             "WHEN event_id % 11 <= 6 THEN 'med' ELSE 'high' END")


# ==============================================================================
# CEF decode operators
# ==============================================================================

def q_cef_decode_headers(spark, sf_dir):
    """D7/D8/D10: 7-header split on engine-parsed payloads."""
    df = decode_dataframe(_with_payload(_events(spark, sf_dir)))
    return df.select(
        "event_id", "cefVersion", "deviceVendor", "deviceProduct", "deviceVersion",
        "deviceEventClassId", F.col("name").alias("event_name"), "severity")


O_CEF_DECODE_HEADERS = f"""
SELECT event_id, '0' AS cefVersion, {_VENDOR_SQL} AS deviceVendor,
       'threatmanager' AS deviceProduct, '1.0' AS deviceVersion,
       CAST(event_id % 1000 AS VARCHAR) AS deviceEventClassId,
       'event ' || event_type AS event_name, {_SEV_SQL} AS severity
FROM events
"""


def q_cef_decode_extensions(spark, sf_dir):
    """D11/D12: extension tokenizer + abbreviated-key expansion."""
    df = decode_dataframe(_with_payload(_events(spark, sf_dir)))
    return df.select(
        "event_id",
        ext("sourceAddress").alias("src_ip"),
        ext("sourcePort").alias("src_port"),
        ext("sourceUserName").alias("src_user"),
        ext("message").alias("msg"),
        ext("eventOutcome").alias("outcome"))


O_CEF_DECODE_EXTENSIONS = """
SELECT event_id,
       '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS src_ip,
       CAST(event_id % 65536 AS VARCHAR) AS src_port,
       'user' || CAST(user_id AS VARCHAR) AS src_user,
       'turn ' || CAST(event_id AS VARCHAR) || ' of note' AS msg,
       'Success' AS outcome
FROM events
"""


def q_cef_decode_missing_headers(spark, sf_dir):
    """Empty header positions decode to empty strings (cef_spec.rb:643-650)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|||1.0|100|ev|"), _sev_col(),
                         F.lit("|src=10.0.0."), (F.col("event_id") % 256).cast("string")))
    dec = decode_dataframe(df)
    return dec.select("event_id", "deviceVendor", "deviceProduct",
                      ext("sourceAddress").alias("src_ip"))


O_CEF_DECODE_MISSING_HEADERS = """
SELECT event_id, '' AS deviceVendor, '' AS deviceProduct,
       '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS src_ip
FROM events
"""


def q_cef_decode_escaped_headers(spark, sf_dir):
    """D8: headers with escaped pipes/backslashes round back to originals.
    Raw vendor contains | and \\; it is sanitized into the payload with the
    same replace chain on both sides, then engine-decoded back."""
    raw = F.concat(F.lit("v|e\\nd_"), F.col("event_type"))
    sanitized = F.regexp_replace(F.regexp_replace(raw, r"\\", r"\\\\"), r"\|", r"\\|")
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|"), sanitized, F.lit("|p|1.0|100|ev|"), _sev_col(), F.lit("|")))
    return decode_dataframe(df).select("event_id", "deviceVendor")


O_CEF_DECODE_ESCAPED_HEADERS = r"""
SELECT event_id, 'v|e\nd_' || event_type AS deviceVendor FROM events
"""


def q_cef_decode_escaped_values(spark, sf_dir):
    """D14: extension values with \\= and \\\\ desanitize back to originals."""
    raw = F.concat(F.lit("k=v& x\\y eq="), F.col("event_type"))
    sanitized = F.regexp_replace(F.regexp_replace(raw, r"\\", r"\\\\"), "=", r"\\=")
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|"), _sev_col(),
                         F.lit("|query="), sanitized, F.lit(" final=done")))
    dec = decode_dataframe(df)
    return dec.select("event_id", ext("query").alias("query_val"),
                      ext("final").alias("final_val"))


O_CEF_DECODE_ESCAPED_VALUES = r"""
SELECT event_id, 'k=v& x\y eq=' || event_type AS query_val, 'done' AS final_val
FROM events
"""


def q_cef_decode_pipe_in_value(spark, sf_dir):
    """Unescaped pipes in the extension block are plain data (cef_spec.rb:666-671)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|"), _sev_col(),
                         F.lit("|moo=this|has "), F.col("event_type"), F.lit(" pipe")))
    return decode_dataframe(df).select("event_id", ext("moo").alias("moo"))


O_CEF_DECODE_PIPE_IN_VALUE = """
SELECT event_id, 'this|has ' || event_type || ' pipe' AS moo FROM events
"""


def q_cef_decode_syslog_prelude(spark, sf_dir):
    """D9: syslog prelude split off the version header (cef_spec.rb:942-948)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("Jan 18 11:07:53 host"), (F.col("event_id") % 100).cast("string"),
                         F.lit(" "), _canonical_payload()))
    dec = decode_dataframe(df)
    return dec.select("event_id", F.col("syslog").alias("syslog_header"), "cefVersion")


O_CEF_DECODE_SYSLOG_PRELUDE = """
SELECT event_id, 'Jan 18 11:07:53 host' || CAST(event_id % 100 AS VARCHAR) AS syslog_header,
       '0' AS cefVersion
FROM events
"""


def q_cef_decode_failures(spark, sf_dir):
    """D17 error-as-data: malformed rows carry tag + original payload."""
    dec = decode_dataframe(_with_payload(_events(spark, sf_dir), mixed_failures=True))
    return dec.select(
        "event_id",
        F.coalesce(F.col("tags").getItem(0), F.lit("ok")).alias("tag"),
        F.coalesce(F.col("message"), F.lit("")).alias("failure_payload"))


O_CEF_DECODE_FAILURES = """
SELECT event_id,
       CASE WHEN event_id % 13 = 0 THEN '_cefparsefailure' ELSE 'ok' END AS tag,
       CASE WHEN event_id % 13 = 0 THEN 'not cef ' || CAST(event_id AS VARCHAR) ELSE '' END AS failure_payload
FROM events
"""


def q_cef_decode_quote_strip(spark, sf_dir):
    """D5: flex-connector quote wrapping is stripped (cef.rb:243-245)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit('"'), _canonical_payload(), F.lit('"')))
    return decode_dataframe(df).select("event_id", "deviceVendor",
                                       ext("eventOutcome").alias("outcome"))


O_CEF_DECODE_QUOTE_STRIP = f"""
SELECT event_id, {_VENDOR_SQL} AS deviceVendor, 'Success' AS outcome FROM events
"""


def q_cef_decode_dotted_keys(spark, sf_dir):
    """Dotted / comma / bracket-indexed keys survive verbatim; array-like keys
    are rewritten to strict field references (cef_spec.rb:852-899)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|ad.nn=T"), (F.col("event_id") % 9).cast("string"),
                         F.lit(" ad.Error_,Code=3221225578 ad.field[0]=f0")))
    dec = decode_dataframe(df)
    return dec.select("event_id",
                      ext("ad.nn").alias("ad_nn"),
                      ext("ad.Error_,Code").alias("ad_err"),
                      ext("[ad.field][0]").alias("ad_f0"))


O_CEF_DECODE_DOTTED_KEYS = """
SELECT event_id, 'T' || CAST(event_id % 9 AS VARCHAR) AS ad_nn,
       '3221225578' AS ad_err, 'f0' AS ad_f0
FROM events
"""


def q_cef_decode_custom_numbered(spark, sf_dir):
    """The 15x8 numbered custom fields expand like named fields (cef_spec.rb:958-971)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|cfp15=1."), (F.col("event_id") % 7).cast("string"),
                         F.lit(" cfp15Label=FloatLabel c6a12=::1 cn7="), (F.col("event_id") % 100).cast("string"),
                         F.lit(" cs4Label=StringLabel")))
    dec = decode_dataframe(df)
    return dec.select(
        "event_id",
        ext("deviceCustomFloatingPoint15").alias("cfp15_val"),
        ext("deviceCustomFloatingPoint15Label").alias("cfp15_label"),
        ext("deviceCustomIPv6Address12").alias("c6a12_val"),
        ext("deviceCustomNumber7").alias("cn7_val"),
        ext("deviceCustomString4Label").alias("cs4_label"))


O_CEF_DECODE_CUSTOM_NUMBERED = """
SELECT event_id, '1.' || CAST(event_id % 7 AS VARCHAR) AS cfp15_val,
       'FloatLabel' AS cfp15_label, '::1' AS c6a12_val,
       CAST(event_id % 100 AS VARCHAR) AS cn7_val, 'StringLabel' AS cs4_label
FROM events
"""


def q_cef_decode_legacy_aliases(spark, sf_dir):
    """Legacy geo aliases pass through as-provided in disabled mode
    (cef_spec.rb:1022-1034, cef.rb:566)."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|destinationLongitude=-73.6148"),
                         (F.col("event_id") % 10).cast("string"),
                         F.lit(" sourceLatitude=9.1076927")))
    dec = decode_dataframe(df)
    return dec.select("event_id",
                      ext("destinationLongitude").alias("dlong_legacy"),
                      ext("sourceLatitude").alias("slat_legacy"))


O_CEF_DECODE_LEGACY_ALIASES = """
SELECT event_id, '-73.6148' || CAST(event_id % 10 AS VARCHAR) AS dlong_legacy,
       '9.1076927' AS slat_legacy
FROM events
"""


def q_cef_ts_dtz_side_channel(spark, sf_dir):
    """T3: zoneless rt + dtz=Europe/Moscow side channel (cef_spec.rb:698-722);
    Moscow is UTC+3 year-round (no DST since 2014), so expected = ts - 3h."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|rt="),
                         F.date_format(F.col("ts"), "MMM dd yyyy HH:mm:ss"),
                         F.lit(" dtz=Europe/Moscow")))
    dec = decode_dataframe(df, config=DecodeConfig(ecs_mode=True, now=NOW))
    iso = ext("@timestamp")
    return dec.select(
        "event_id",
        F.concat(F.substring(iso, 1, 10), F.lit(" "), F.substring(iso, 12, 8)).alias("ts_utc"))


O_CEF_TS_DTZ_SIDE_CHANNEL = """
SELECT event_id,
       strftime(date_trunc('second', ts) - INTERVAL 3 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_utc
FROM events
"""


def q_top_vendors(spark, sf_dir):
    """Sort/limit/top-k over the routed output."""
    return (_routed(spark, sf_dir)
            .groupBy("deviceVendor").agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy(F.desc("n_events"), F.asc_nulls_first("deviceVendor"))
            .limit(3))


O_TOP_VENDORS = f"""
WITH v AS (SELECT CASE WHEN event_id % 13 = 0 THEN NULL ELSE {_VENDOR_SQL} END AS deviceVendor
           FROM events)
SELECT deviceVendor, COUNT(*) AS n_events FROM v GROUP BY 1
ORDER BY n_events DESC, deviceVendor ASC NULLS FIRST LIMIT 3
"""


def q_set_ops(spark, sf_dir):
    """Set operations: high-severity events EXCEPT error-typed events.

    The decoded frame feeds both legs of the exceptAll, so it is persisted —
    without it the two subtrees would each re-run the Arrow decode over the
    full input (2x decode cost at scale). Columns are also slimmed to the two
    fields the predicates read, skipping the extensions-map transfer."""
    ev = decode_dataframe(
        _with_payload(_events(spark, sf_dir)),
        columns=["severity", "deviceEventClassId"]).persist()
    high = ev.where(F.col("severity").cast("int") >= 7).select("event_id")
    errors = ev.where(F.col("deviceEventClassId").cast("int") % 2 == 0).select("event_id")
    return high.exceptAll(errors)


O_SET_OPS = """
SELECT event_id FROM events WHERE event_id % 11 >= 7
EXCEPT ALL
SELECT event_id FROM events WHERE (event_id % 1000) % 2 = 0
"""


# ==============================================================================
# CEF encode + round-trip
# ==============================================================================

def q_cef_encode(spark, sf_dir):
    """E1-E11: engine-encoded line vs string-built oracle (sanitize-neutral values)."""
    df = _events(spark, sf_dir).select(
        "event_id",
        F.concat(F.lit("10.0.0."), (F.col("event_id") % 256).cast("string")).alias("sourceAddress"),
        F.concat(F.lit("turn "), F.col("event_id").cast("string")).alias("message"))
    enc = encode_dataframe(df, ["sourceAddress", "message"],
                           EncoderConfig(vendor="acme", product="prod", version="2.0",
                                         signature="sig", name="n", severity="5"))
    return enc.select("event_id", F.col("cef_line").alias("cef_line"))


O_CEF_ENCODE = """
SELECT event_id,
       'CEF:0|acme|prod|2.0|sig|n|5|sourceAddress=10.0.0.' || CAST(event_id % 256 AS VARCHAR)
       || ' message=turn ' || CAST(event_id AS VARCHAR) AS cef_line
FROM events
"""


def q_cef_encode_severity(spark, sf_dir):
    """E4: severity validation matrix — invalid -> 6, '1.0' -> '1'."""
    m = F.col("event_id") % 5
    sev_in = (F.when(m == 0, "3").when(m == 1, "11").when(m == 2, "-1")
              .when(m == 3, "1.0").otherwise("junk"))
    df = _events(spark, sf_dir).select("event_id", sev_in.alias("sev"))
    enc = encode_dataframe(df, ["sev"], EncoderConfig(severity="%{sev}"), encode_fields=[])
    return enc.select("event_id", F.split(F.col("cef_line"), r"\|").getItem(6).alias("severity_out"))


O_CEF_ENCODE_SEVERITY = """
SELECT event_id,
       CASE WHEN event_id % 5 = 0 THEN '3' WHEN event_id % 5 = 3 THEN '1' ELSE '6' END AS severity_out
FROM events
"""


def q_cef_roundtrip(spark, sf_dir):
    """encode∘decode identity on header + mapped extension (cef_spec.rb:1038-1089)."""
    df = _events(spark, sf_dir).select(
        "event_id", "event_type",
        F.concat(F.lit("10.0.0."), (F.col("event_id") % 256).cast("string")).alias("sourceAddress"))
    enc = encode_dataframe(df, ["sourceAddress", "event_type"],
                           EncoderConfig(vendor="%{event_type}", severity="7"),
                           encode_fields=["sourceAddress"])
    dec = decode_dataframe(enc, text_col="cef_line")
    return dec.select("event_id", F.col("deviceVendor").alias("vendor_rt"),
                      ext("sourceAddress").alias("src_rt"), "severity")


O_CEF_ROUNDTRIP = """
SELECT event_id, event_type AS vendor_rt,
       '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS src_rt, '7' AS severity
FROM events
"""


# ==============================================================================
# ECS timestamp normalization (T1-T3 through the full decode path)
# ==============================================================================

def q_cef_ts_epoch(spark, sf_dir):
    """T1: rt=epoch-millis normalized to @timestamp in ECS mode."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|rt="),
                         F.unix_millis(F.col("ts").cast("timestamp")).cast("string"),
                         F.lit(" src=10.0.0.1")))
    dec = decode_dataframe(df, config=DecodeConfig(ecs_mode=True, now=NOW))
    iso = ext("@timestamp")  # '%Y-%m-%dT%H:%M:%S.%f(9)Z'
    return dec.select(
        "event_id",
        F.concat(F.substring(iso, 1, 10), F.lit(" "), F.substring(iso, 12, 12)).alias("ts_ms"))


O_CEF_TS_EPOCH = """
SELECT event_id, strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%d %H:%M:%S.%g') AS ts_ms
FROM events
"""


def q_cef_ts_format(spark, sf_dir):
    """T2: CEF 'MMM dd yyyy HH:mm:ss' format normalized in ECS mode."""
    df = _events(spark, sf_dir).withColumn(
        "text", F.concat(F.lit("CEF:0|v|p|1.0|100|ev|5|rt="),
                         F.date_format(F.col("ts"), "MMM dd yyyy HH:mm:ss"),
                         F.lit(" src=10.0.0.1")))
    dec = decode_dataframe(df, config=DecodeConfig(ecs_mode=True, now=NOW))
    iso = ext("@timestamp")
    return dec.select(
        "event_id",
        F.concat(F.substring(iso, 1, 10), F.lit(" "), F.substring(iso, 12, 8)).alias("ts_sec"))


O_CEF_TS_FORMAT = """
SELECT event_id, strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_sec
FROM events
"""


# ==============================================================================
# Pipeline: enrich -> route -> aggregate
# ==============================================================================

def _routed(spark, sf_dir):
    df = _with_payload(_events(spark, sf_dir), mixed_failures=True)
    # routing consumes 3 decoded fields — skip the extensions-map transfer
    dec = decode_dataframe(df, columns=pipeline.ROUTING_COLUMNS)
    return pipeline.route(pipeline.enrich(dec, spark))


def q_cef_route_counts(spark, sf_dir):
    """Routing fan-out: per-sink event counts incl. the failure sink."""
    return (_routed(spark, sf_dir).groupBy("sink_id")
            .agg(F.count(F.lit(1)).alias("n_events")))


O_CEF_ROUTE_COUNTS = f"""
SELECT CASE WHEN event_id % 13 = 0 THEN '_cefparsefailure'
            ELSE {_VENDOR_SQL} || '/' || {_BAND_SQL} END AS sink_id,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_cef_window_counts(spark, sf_dir):
    """Per-sink counts windowed by ts (1 hour) — the north-rule aggregate."""
    routed = _routed(spark, sf_dir)
    return (pipeline.sink_counts(routed, ts_col="ts", window="1 hour")
            .select("sink_id",
                    F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start_s"),
                    "n_events"))


O_CEF_WINDOW_COUNTS = f"""
SELECT CASE WHEN event_id % 13 = 0 THEN '_cefparsefailure'
            ELSE {_VENDOR_SQL} || '/' || {_BAND_SQL} END AS sink_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start_s,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_cef_enrich_tiers(spark, sf_dir):
    """Broadcast-join enrichment: vendor tier + severity band per event."""
    return _routed(spark, sf_dir).select("event_id", "vendor_tier", "severity_band")


O_CEF_ENRICH_TIERS = f"""
SELECT event_id,
       CASE WHEN event_id % 13 = 0 THEN 'unknown'
            WHEN event_id % 10 <= 5 THEN 'tier1'
            WHEN event_id % 10 IN (6, 7) THEN 'tier2'
            ELSE 'tier3' END AS vendor_tier,
       CASE WHEN event_id % 13 = 0 THEN 'unknown' ELSE {_BAND_SQL} END AS severity_band
FROM events
"""


def q_user_sessions(spark, sf_dir):
    """Grouped-map pandas UDF (applyInPandas): per-user session stats computed
    with arbitrary pandas logic per group — the template for custom grouped
    aggregations the built-in functions can't express. Shuffles once on the
    group key; each group is processed in one Arrow batch."""
    import math

    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values()
        # avg in integer 1e-4 units (half-up floor): float means are summation-
        # order-dependent at the ~1e-12 level, so a raw double would hash-
        # mismatch a DuckDB oracle even when both render identically at 4dp.
        mean = float(pdf["value"].mean())
        return pd.DataFrame({
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "span_seconds": [int((ts.iloc[-1] - ts.iloc[0]).total_seconds())],
            "avg_value_e4": [int(math.floor(mean * 10000 + 0.5))],
        })

    return (_events(spark, sf_dir).groupBy("user_id")
            .applyInPandas(stats, "user_id long, n_events long, span_seconds long, avg_value_e4 long"))


O_USER_SESSIONS = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(FLOOR(date_part('epoch', MAX(ts) - MIN(ts))) AS BIGINT) AS span_seconds,
       CAST(FLOOR(AVG(value) * 10000 + 0.5) AS BIGINT) AS avg_value_e4
FROM events GROUP BY user_id
"""


def q_turn_ordering(spark, sf_dir):
    """Window function: stable per-conversation ordering (row_number)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (_events(spark, sf_dir)
            .select("event_id", F.row_number().over(w).cast("long").alias("turn_rank")))


O_TURN_ORDERING = """
SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_rank
FROM events
"""


# ==============================================================================
# Training-data ops: documents
# ==============================================================================

def _docs_with_dups(spark, sf_dir):
    d = _documents(spark, sf_dir)
    dups = (d.where(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return d.select("doc_id", "text").unionByName(dups)


_DOCS_DUPS_SQL = """(SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)"""


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: min-id representative per identical text."""
    return dedup.exact_dedup(_docs_with_dups(spark, sf_dir), ["text"])


O_DEDUP_EXACT = f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM {_DOCS_DUPS_SQL} t GROUP BY text
"""


def _docs_near_dups(spark, sf_dir, limit: int = 80):
    d = _documents(spark, sf_dir).where(F.col("doc_id") < limit)
    near = (d.where(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zz qq extra trailing tokens")).alias("text")))
    return d.select("doc_id", "text").unionByName(near)


_DOCS_NEAR_SQL = """(SELECT doc_id, text FROM documents WHERE doc_id < 80
  UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' zz qq extra trailing tokens' AS text
  FROM documents WHERE doc_id < 80 AND doc_id % 5 = 0)"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.4) on a dup-injected set."""
    return dedup.jaccard_pairs(_docs_near_dups(spark, sf_dir), threshold=0.4)


O_DEDUP_NGRAM_JACCARD = f"""
WITH docs AS (SELECT * FROM {_DOCS_NEAR_SQL} t),
toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM docs),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
       FROM toks),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT a, b, ROUND(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.4
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs. The xxhash64 permutations aren't DuckDB-
    expressible, but the *output* is exact-Jaccard-verified candidate pairs —
    and on this fixture (16 bands x 4 rows at t=0.4) LSH recall is 1, so the
    result must equal the exact all-pairs Jaccard oracle."""
    return dedup.minhash_dedup(_docs_near_dups(spark, sf_dir), threshold=0.4)


def _docs_simhash_fixture(spark, sf_dir):
    """Near-dup fixture tuned for SimHash: substantial docs (>= 25 tokens) so
    a 2-token append shifts few bit-majorities — keeping every injected pair
    within Hamming 6, the radius the scale-safe block scheme covers exactly."""
    d = _documents(spark, sf_dir)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    base = d.where((F.col("doc_id") < 200) & (toks >= 25))
    near = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq zz")).alias("text"))
    return base.select("doc_id", "text").unionByName(near)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup recall: every injected near-duplicate must be found
    within Hamming distance 6 through the real multi-index block join. The
    output is restricted to the injected pairs (base-to-base near-dups also
    exist in the corpus but their distances aren't SQL-computable); precision
    and pair-set equality vs brute force are pytest-asserted."""
    sim = dedup.simhash(_docs_simhash_fixture(spark, sf_dir))
    return (dedup.hamming_pairs(sim, max_dist=6)
            .where(F.col("b") == F.col("a") + 100000)
            .select("a", "b"))


O_DEDUP_SIMHASH = r"""
SELECT doc_id AS a, doc_id + 100000 AS b FROM documents
WHERE doc_id < 200 AND doc_id % 5 = 0
  AND len(regexp_split_to_array(trim(text), '\s+')) >= 25
"""


def q_text_token_count(spark, sf_dir):
    return _documents(spark, sf_dir).select(
        "doc_id", textops.token_count(F.col("text")))


O_TEXT_TOKEN_COUNT = """
SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def q_text_quality(spark, sf_dir):
    return textops.quality_metrics(_documents(spark, sf_dir))


O_TEXT_QUALITY = """
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
         len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|in|is|a|for|on|with)\\b')) AS n_stopwords
  FROM documents)
SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
       ROUND(least(1.0, n_stopwords / greatest(n_tokens, 1) * 4.0)
             * (1.0 - least(0.5, n_punct / greatest(n_chars, 1))), 6) AS quality_score
FROM m
"""


def q_text_lang_id(spark, sf_dir):
    return textops.lang_id(_documents(spark, sf_dir))


O_TEXT_LANG_ID = """
SELECT doc_id,
       CASE WHEN len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|in|is|a|for|on|with)\\b')) >= 2
            THEN 'en' ELSE 'unknown' END AS lang_pred
FROM documents
"""


def q_text_fingerprint(spark, sf_dir):
    return textops.fingerprint(_documents(spark, sf_dir))


O_TEXT_FINGERPRINT = """
SELECT doc_id, md5(text) AS fp_md5,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_norm_md5
FROM documents
"""


# ==============================================================================
# Similarity search: embeddings
# ==============================================================================

_DOT_SQL = """
SELECT e.vec_id,
       SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS dp,
       SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS na,
       SQRT(SUM(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS nq
FROM embeddings e, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
     generate_series(1, 64) g(i)
GROUP BY e.vec_id
"""


def _query_vec(spark, sf_dir):
    return _embeddings(spark, sf_dir).where(F.col("vec_id") == 0).first()["embedding"]


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 vs the vec_id=0 query vector."""
    q = _query_vec(spark, sf_dir)
    return similarity.brute_force_topk(_embeddings(spark, sf_dir), q, k=5)


O_ANN_COSINE_TOPK = f"""
WITH d AS ({_DOT_SQL})
SELECT vec_id, ROUND(dp / (na * nq), 6) AS cos
FROM d ORDER BY cos DESC, vec_id LIMIT 5
"""


def q_ann_lsh_topk(spark, sf_dir):
    """Multi-probe LSH ANN top-5. With 6 hyperplanes and probe radius 2 the
    scanned buckets cover the exact top-5 on this fixture (recall = 1), so the
    ANN result — exact cosines over the probed subset — must equal the
    brute-force oracle row-for-row. Sub-1 recall configs are pytest-covered."""
    q = _query_vec(spark, sf_dir)
    return similarity.lsh_bucketed_topk(_embeddings(spark, sf_dir), q, k=5,
                                        n_planes=6, multiprobe=2)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN top-5: deterministic k-means (lowest-id init + 1 Lloyd step),
    probe the 3 closest of 8 lists. Recall = 1 on this fixture, so the result
    must equal the brute-force oracle."""
    emb = _embeddings(spark, sf_dir)
    cents = similarity.ivf_build_centroids(emb, n_lists=8, iters=1)
    q = _query_vec(spark, sf_dir)
    return similarity.ivf_topk(emb, q, cents, k=5, n_probe=3)


def q_emb_neardup_cosine(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= 0.99) on a scaled-copy-injected set
    (cosine is scale-invariant, so each copy pairs with its source at 1.0).
    Runs the bucketed scale path (no crossJoin): a copy's hyperplane signs
    equal its source's, so LSH recall on the injected pairs is structurally 1;
    bucketed == exact is additionally pytest-asserted."""
    e = _embeddings(spark, sf_dir).where(F.col("vec_id") % 50 == 0)
    dups = e.select((F.col("vec_id") + 100000).alias("vec_id"),
                    F.transform(F.col("embedding"), lambda x: x * F.lit(1.5)).alias("embedding"))
    both = e.select("vec_id", "embedding").unionByName(dups)
    return similarity.cosine_neardup_pairs(both, threshold=0.99, exact=False)


O_EMB_NEARDUP_COSINE = """
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, list_transform(embedding, x -> x * 1.5) AS embedding
  FROM embeddings WHERE vec_id % 50 = 0),
d AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         SUM(CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)) AS dp,
         SQRT(SUM(CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))) AS na,
         SQRT(SUM(CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) AS nb
  FROM base x, base y, generate_series(1, 64) g(i)
  WHERE x.vec_id < y.vec_id
  GROUP BY 1, 2)
SELECT a, b, ROUND(dp / (na * nb), 6) AS cos FROM d WHERE ROUND(dp / (na * nb), 6) >= 0.99
"""


# ==============================================================================
# registry
# ==============================================================================

#: name -> (query fn, oracle sql or None)
REGISTRY: dict[str, tuple[Callable, Optional[str]]] = {
    "cef_decode_headers": (q_cef_decode_headers, O_CEF_DECODE_HEADERS),
    "cef_decode_extensions": (q_cef_decode_extensions, O_CEF_DECODE_EXTENSIONS),
    "cef_decode_missing_headers": (q_cef_decode_missing_headers, O_CEF_DECODE_MISSING_HEADERS),
    "cef_decode_escaped_headers": (q_cef_decode_escaped_headers, O_CEF_DECODE_ESCAPED_HEADERS),
    "cef_decode_escaped_values": (q_cef_decode_escaped_values, O_CEF_DECODE_ESCAPED_VALUES),
    "cef_decode_pipe_in_value": (q_cef_decode_pipe_in_value, O_CEF_DECODE_PIPE_IN_VALUE),
    "cef_decode_syslog_prelude": (q_cef_decode_syslog_prelude, O_CEF_DECODE_SYSLOG_PRELUDE),
    "cef_decode_quote_strip": (q_cef_decode_quote_strip, O_CEF_DECODE_QUOTE_STRIP),
    "cef_decode_dotted_keys": (q_cef_decode_dotted_keys, O_CEF_DECODE_DOTTED_KEYS),
    "cef_decode_custom_numbered": (q_cef_decode_custom_numbered, O_CEF_DECODE_CUSTOM_NUMBERED),
    "cef_decode_legacy_aliases": (q_cef_decode_legacy_aliases, O_CEF_DECODE_LEGACY_ALIASES),
    "cef_ts_dtz_side_channel": (q_cef_ts_dtz_side_channel, O_CEF_TS_DTZ_SIDE_CHANNEL),
    "top_vendors": (q_top_vendors, O_TOP_VENDORS),
    "set_ops": (q_set_ops, O_SET_OPS),
    "cef_decode_failures": (q_cef_decode_failures, O_CEF_DECODE_FAILURES),
    "cef_encode": (q_cef_encode, O_CEF_ENCODE),
    "cef_encode_severity": (q_cef_encode_severity, O_CEF_ENCODE_SEVERITY),
    "cef_roundtrip": (q_cef_roundtrip, O_CEF_ROUNDTRIP),
    "cef_ts_epoch": (q_cef_ts_epoch, O_CEF_TS_EPOCH),
    "cef_ts_format": (q_cef_ts_format, O_CEF_TS_FORMAT),
    "cef_route_counts": (q_cef_route_counts, O_CEF_ROUTE_COUNTS),
    "cef_window_counts": (q_cef_window_counts, O_CEF_WINDOW_COUNTS),
    "cef_enrich_tiers": (q_cef_enrich_tiers, O_CEF_ENRICH_TIERS),
    "turn_ordering": (q_turn_ordering, O_TURN_ORDERING),
    "user_sessions": (q_user_sessions, O_USER_SESSIONS),
    "dedup_exact": (q_dedup_exact, O_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, O_DEDUP_NGRAM_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, O_DEDUP_NGRAM_JACCARD),
    "dedup_simhash": (q_dedup_simhash, O_DEDUP_SIMHASH),
    "text_token_count": (q_text_token_count, O_TEXT_TOKEN_COUNT),
    "text_quality": (q_text_quality, O_TEXT_QUALITY),
    "text_lang_id": (q_text_lang_id, O_TEXT_LANG_ID),
    "text_fingerprint": (q_text_fingerprint, O_TEXT_FINGERPRINT),
    "ann_cosine_topk": (q_ann_cosine_topk, O_ANN_COSINE_TOPK),
    "ann_lsh_topk": (q_ann_lsh_topk, O_ANN_COSINE_TOPK),
    "ann_ivf_topk": (q_ann_ivf_topk, O_ANN_COSINE_TOPK),
    "emb_neardup_cosine": (q_emb_neardup_cosine, O_EMB_NEARDUP_COSINE),
}
