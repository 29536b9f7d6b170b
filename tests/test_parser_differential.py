"""Differential testing: the mega-regex fast path must agree with the
pandas/cursor reference implementation on every payload — corpus, fixtures,
and fuzzed inputs."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cefspark import fixtures
from cefspark.parser import DecodeConfig, _decode_batch_fast, _decode_batch_pandas


def assert_same(payloads, cfg=None):
    s = pd.Series(list(payloads))
    fast = _decode_batch_fast(s, cfg)
    slow = _decode_batch_pandas(s, cfg)
    for col in ["cefVersion", "deviceVendor", "deviceProduct", "deviceVersion",
                "deviceEventClassId", "name", "severity", "syslog",
                "extensions", "message", "tags"]:
        f, g = list(fast[col]), list(slow[col])
        assert f == g, (col, [(a, b, p) for a, b, p in zip(f, g, payloads) if a != b][:3])


def test_corpus_fixtures_agree():
    pdf = fixtures.transcripts_pdf(3000)
    assert_same(list(pdf["text"]))


def test_corpus_fixtures_agree_ecs():
    pdf = fixtures.transcripts_pdf(1500)
    assert_same(list(pdf["text"]), DecodeConfig(ecs_mode=True, now="2026-08-16T00:00:00Z"))


def test_edge_payloads_agree():
    assert_same([
        "", "|", "|||||||", "CEF:0|a|b|c|d|e|f|", '"quoted"', '"',
        "CEF:0|a|b|c|d|e|f|k=v ", "CEF:0|a|b|c|d|e|f| k=v",
        "CEF:0|a|b|c|d|e|f|k=v  j=w\t", "CEF:0|a|b|c|d|e|f|k=",
        "CEF:0|a|b|c|d|e|f|k==v", "CEF:0|a|b|c|d|e|f|=v",
        "CEF:0|a|b|c|d|e|f|k=a\\=b \\junk", "a\\|b|c|d|e|f|g|h|k=v",
        "CEF:0|a|b|c|d|e|f|tail no pairs", "CEF:0|a|b|c|d|e|f|k=v trailing junk=",
        "x" * 5000, "CEF:0|" + "\\\\" * 50 + "|b|c|d|e|f|k=v",
        None, "CEF:0|a|b|c|d|e|f|k=v\nmore",
    ])


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab |\\=\t.[]0:\"\n\u00a0\u00e9\u3000\x00\r")), max_size=120))
def test_fuzz_agree(payload):
    assert_same([payload])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["k", "key.sub", "k[0]", "a_b", "k2"]), min_size=0, max_size=6),
    st.sampled_from(["v", "v w", "a\\=b", "x\\\\", "", "a=b", "sp  aces"]))
def test_fuzz_kv_agree(keys, val):
    ext = " ".join(f"{k}={val}" for k in keys)
    assert_same([f"CEF:0|v|p|1|s|n|3|{ext}"])
