"""Deterministic transcript-table synthesis (FIXTURES.md §1-3).

The pipeline's input is an Iceberg/parquet table of conversation transcripts
(conv_id, turn_idx, role, text, tool, ts) whose ``text`` carries CEF payloads.
No external data: payloads are drawn from the reference spec corpus (valid
canonical with randomized field values, weighted edge/malformed cases), with
a deliberately skewed deviceVendor distribution (hot vendor 'security' ~60%)
to exercise the salted route stage. Fixed seed => bit-identical tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TURNS_PER_CONV = 8
ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "search", "exec"]
BASE_TS = pd.Timestamp("2026-01-01T00:00:00Z")

# cold vendors get the remaining probability mass uniformly
VENDORS = ["security", "FooBar", "Vendor", "fun", "acme", "CyberArk"]
VENDOR_P = [0.60, 0.08, 0.08, 0.08, 0.08, 0.08]

# edge/valid payload templates from the spec corpus (cef_spec.rb cites in
# FIXTURES.md §3); {i}/{sev}/{vendor}/{oct} are filled per row.
EDGE_VALID = [
    'CEF:0|||1.0|100|trojan successfully stopped|{sev}|src=10.0.0.{oct} dst=12.121.122.82 spt=1232',
    'Syslogdate Sysloghost CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|src=10.0.0.{oct}',
    'CEF:0|secu\\|rity|threatmanager\\||1.\\|0|10\\|0|tro\\|jan successfully stopped|\\|{sev}|',
    'CEF:0|secu\\\\rity|threat\\\\manager|1.\\\\0|10\\\\0|tro\\\\jan successfully stopped|{sev}|',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|moo=this|has an pipe',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|moo=this\\|esc pipe kept',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|foo=bar msg=esc \\= eq \\n nl \\r cr \\\\ bs bar=baz',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|moo=this \\has \\ backslashs\\',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|src=10.0.0.{oct}  dst=12.121.122.82  spt=1232 dproc=InternetExplorer x.x.x.x',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|ad.nn=TEST ad.Error_,Code=3221225578 ad.field[0]=field0',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|cfp15=1.{i} cfp15Label=FloatLabel cn7={i} cs4=astring{i} cs4Label=StringLabel',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|rt=Jul 19 2017 10:50:21.127 dtz=Europe/Moscow start=1616623591694',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|target=aaaaaああああaaaa new_key_by_device=new_values here',
    'CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|destinationLongitude=-73.614830 destinationLatitude=45.505918',
    "CEF:0|FooBar|Web Gateway|1.2.3.45.67|200|Success|{sev}|rt=Sep 07 2018 14:50:39 requestClientApplication='Foo-Bar/2018.1.7; Guid:test=' cs1= cs1Label=Foo Bar",
]

MALFORMED = [
    "this is not cef {i}",
    "a|b|c with several \\| escaped\\| pipes|d|bananas{i}",
    "CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|keyless extension tail here",
]

CANONICAL = ("CEF:0|{vendor}|threatmanager|1.0|100|trojan successfully stopped|{sev}|"
             "src=10.0.0.{oct} dst=12.121.122.{oct} spt={spt} msg=turn {i} of note "
             "suser=user{u} outcome=Success")


def transcripts_pdf(n_turns: int, seed: int = 42, edge_fraction: float = 0.10,
                    malformed_share: float = 0.3) -> pd.DataFrame:
    """Build a deterministic transcript table as pandas (small scales)."""
    rng = np.random.RandomState(seed)
    i = np.arange(n_turns)
    vendors = rng.choice(VENDORS, size=n_turns, p=VENDOR_P)
    sevs = rng.randint(0, 11, size=n_turns)
    octs = rng.randint(0, 256, size=n_turns)
    spts = rng.randint(1, 65536, size=n_turns)
    users = rng.randint(0, 1000, size=n_turns)
    kind = rng.random_sample(n_turns)  # < edge_fraction => edge case
    edge_pick = rng.randint(0, len(EDGE_VALID), size=n_turns)
    bad_pick = rng.randint(0, len(MALFORMED), size=n_turns)

    texts = np.empty(n_turns, dtype=object)
    edge_cut = edge_fraction * (1.0 - malformed_share)
    bad_cut = edge_fraction
    for j in range(n_turns):
        fmt = dict(i=j, sev=int(sevs[j]), vendor=vendors[j], oct=int(octs[j]),
                   spt=int(spts[j]), u=int(users[j]))
        if kind[j] < edge_cut:
            texts[j] = EDGE_VALID[edge_pick[j]].format(**fmt)
        elif kind[j] < bad_cut:
            texts[j] = MALFORMED[bad_pick[j]].format(**fmt)
        else:
            texts[j] = CANONICAL.format(**fmt)

    return pd.DataFrame({
        "conv_id": [f"conv-{j // TURNS_PER_CONV:08d}" for j in i],
        "turn_idx": (i % TURNS_PER_CONV).astype("int32"),
        "role": [ROLES[j % 3] for j in i],
        "text": texts,
        "tool": [TOOLS[j % 3] for j in i],
        "ts": BASE_TS + pd.to_timedelta(i, unit="s"),
    })


def transcripts_df(spark, n_turns: int, seed: int = 42, partitions: int = 0):
    """Spark DataFrame of synthetic transcripts. For large n, generates
    distributed (per-partition pandas synthesis via mapInPandas) so the
    driver never materializes the table."""
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ])
    if n_turns <= 200_000:
        pdf = transcripts_pdf(n_turns, seed)
        return spark.createDataFrame(pdf, schema=schema)

    parts = partitions or max(32, n_turns // 250_000)
    per_part = n_turns // parts

    def gen(iterator):
        for pdf in iterator:
            for _, r in pdf.iterrows():
                p = int(r["id"])
                start = p * per_part
                count = per_part if p < parts - 1 else n_turns - start
                out = transcripts_pdf(count, seed=seed + p)
                out.index = np.arange(start, start + count)
                out["conv_id"] = [f"conv-{j // TURNS_PER_CONV:08d}" for j in out.index]
                out["turn_idx"] = (out.index % TURNS_PER_CONV).astype("int32")
                out["ts"] = BASE_TS + pd.to_timedelta(out.index, unit="s")
                yield out.reset_index(drop=True)

    return spark.range(parts).mapInPandas(gen, schema=schema)
