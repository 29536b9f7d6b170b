"""Round-6 session-5 operators: bigram-LM scoring (cefspark.lm), the
logstash fingerprint filter (redact.fingerprint_fields), the logstash
aggregate filter (pipeline.aggregate_tasks), and charset line framing
(sources.read_lines_charset)."""

import hashlib
import hmac

import pytest
from pyspark.sql import functions as F

from cefspark import lm, pipeline, redact, sources


# ---------------------------------------------------------------- lm

TRAIN = {
    0: "the cat sat on the mat",
    1: "the dog sat on the rug",
    2: "a cat and a dog",
}
HELD = {
    10: "the cat sat",          # all bigrams seen
    11: "the zebra sat on",     # 'the zebra' / 'zebra sat' OOV
    12: "one",                  # no bigram -> absent from output
}


def _docs(spark, d):
    return spark.createDataFrame(
        [(k, v) for k, v in d.items()], "doc_id long, text string")


def test_lm_score_docs_exact_integers(spark):
    pairs, ctx = lm.train_bigram_lm(_docs(spark, TRAIN))
    out = {r.doc_id: r for r in
           lm.score_docs(_docs(spark, HELD), pairs, ctx).collect()}
    assert set(out) == {10, 11}
    # doc 10: bigrams (the,cat)=1 (cat,sat)=1 (sat,on)... wait (cat sat)
    # train pairs: the-cat 1, cat-sat 1, sat-on 2, on-the 2, the-mat 1,
    # the-dog 1, dog-sat 1, the-rug 1, a-cat 1, cat-and 1, and-a 1, a-dog 1
    r10 = out[10]
    assert (r10.n_bigrams, r10.n_oov) == (2, 0)
    assert r10.sum_c2 == 1 + 1              # the-cat, cat-sat
    # ctx: c1('the') = the-cat + the-mat + the-dog + the-rug = 4
    #      c1('cat') = cat-sat + cat-and = 2
    assert r10.sum_c1 == 4 + 2
    r11 = out[11]
    assert (r11.n_bigrams, r11.n_oov) == (3, 2)
    assert r11.sum_c2 == 2                  # only sat-on
    assert r11.sum_c1 == 4 + 0 + 2          # the=4, zebra unseen, sat=2


def test_lm_perplexity_matches_reference(spark):
    pairs, ctx = lm.train_bigram_lm(_docs(spark, TRAIN))
    got = {r.doc_id: r for r in
           lm.with_perplexity(_docs(spark, HELD), pairs, ctx,
                              vocab_size=50, k=0.5).collect()}
    ref = lm.reference_perplexity(HELD, TRAIN, vocab_size=50, k=0.5)
    assert set(got) == set(ref)
    for did, exp in ref.items():
        assert got[did].n_bigrams == exp["n_bigrams"]
        assert got[did].avg_logprob == pytest.approx(exp["avg_logprob"],
                                                     rel=1e-12)
        assert got[did].perplexity == pytest.approx(exp["perplexity"],
                                                    rel=1e-12)


def test_lm_broadcast_plan(spark):
    pairs, ctx = lm.train_bigram_lm(_docs(spark, TRAIN))
    plan = lm.score_docs(_docs(spark, HELD), pairs, ctx,
                         broadcast_lm=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_vocab_size_validation(spark):
    pairs, ctx = lm.train_bigram_lm(_docs(spark, TRAIN))
    with pytest.raises(ValueError):
        lm.with_perplexity(_docs(spark, HELD), pairs, ctx, vocab_size=0)


# ---------------------------------------- fingerprint filter parity

def test_fingerprint_concatenate_sources_sha256(spark):
    df = spark.createDataFrame([(13, "error"), (None, "x")],
                               "user_id long, event_type string")
    out = redact.fingerprint_fields(df, ["user_id", "event_type"],
                                    method="SHA256")
    rows = {r.user_id: r.fingerprint for r in out.collect()}
    assert rows[13] == hashlib.sha256(
        b"|user_id|13|event_type|error|").hexdigest()
    # NULL renders as empty string (logstash to_string(nil))
    assert rows[None] == hashlib.sha256(
        b"|user_id||event_type|x|").hexdigest()


def test_fingerprint_methods_and_modes(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    md5 = redact.fingerprint_fields(df, ["x", "y"], method="MD5") \
        .first().fingerprint
    assert md5 == hashlib.md5(b"|x|a|y|b|").hexdigest()
    # non-concatenate mode hashes only the LAST source's bare value
    last = redact.fingerprint_fields(df, ["x", "y"], method="MD5",
                                     concatenate_sources=False) \
        .first().fingerprint
    assert last == hashlib.md5(b"b").hexdigest()
    # murmur3 = Spark's own hash — engine-specific, just shape-check
    mm = redact.fingerprint_fields(df, ["x"], method="MURMUR3") \
        .first().fingerprint
    assert mm.lstrip("-").isdigit()


def test_fingerprint_hmac(spark):
    df = spark.createDataFrame([("v1",), ("v2",)], "x string")
    out = redact.fingerprint_fields(df, ["x"], method="HMAC-SHA256",
                                    key="secret")
    for r in out.collect():
        exp = hmac.new(b"secret", f"|x|{r.x}|".encode(), "sha256").hexdigest()
        assert r.fingerprint == exp


def test_fingerprint_validation(spark):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError):
        redact.fingerprint_fields(df, [], method="MD5")
    with pytest.raises(ValueError):
        redact.fingerprint_fields(df, ["x"], method="SHA3")
    with pytest.raises(ValueError):
        redact.fingerprint_fields(df, ["x"], method="MD5", key="k")
    with pytest.raises(ValueError):
        redact.fingerprint_fields(df, ["x"], method="HMAC-SHA256")


# ---------------------------------------- aggregate filter parity

def _task_events(spark):
    # task 1: three events writing k in ts order v1 -> v2 (later wins),
    # second event also writes 'other'; ts deliberately out of row order
    rows = [
        (1, "2024-01-01 00:00:02", 3, {"k": "v2"}),
        (1, "2024-01-01 00:00:00", 1, {"k": "v1", "other": "o"}),
        (1, "2024-01-01 00:00:01", 2, {}),
        (2, "2024-01-01 00:00:00", 4, None),        # NULL map tolerated
        (2, "2024-01-01 00:00:05", 5, {"k": "z"}),
    ]
    return spark.createDataFrame(
        rows, "task_id long, ts string, seq long, m map<string,string>") \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_aggregate_tasks_later_wins(spark):
    out = {r.task_id: r for r in pipeline.aggregate_tasks(
        _task_events(spark), "task_id", "m",
        order_cols=["seq"]).collect()}
    assert out[1].task_map == {"k": "v2", "other": "o"}
    assert out[1].n_events == 3
    assert str(out[1].first_ts).startswith("2024-01-01 00:00:00")
    assert str(out[1].last_ts).startswith("2024-01-01 00:00:02")
    assert out[1].status == "open"
    assert out[2].task_map == {"k": "z"}
    assert out[2].n_events == 2


def test_aggregate_tasks_end_and_timeout(spark):
    df = _task_events(spark)
    out = {r.task_id: r.status for r in pipeline.aggregate_tasks(
        df, "task_id", "m", order_cols=["seq"],
        end_pred=F.col("seq") == 3, timeout_s=1.0,
        now_ts="2024-01-01 00:01:00").collect()}
    assert out[1] == "closed"       # seq=3 end event seen
    assert out[2] == "expired"      # no end, now - last_ts > 1 s


def test_aggregate_tasks_matches_sequential_simulator(spark):
    # property-style: replay the logstash map[...] = v loop in Python
    import random

    rng = random.Random(7)
    rows = []
    for i in range(400):
        task = rng.randrange(40)
        m = {f"k{rng.randrange(4)}": str(rng.randrange(100))
             for _ in range(rng.randrange(3))}
        rows.append((task, f"2024-01-01 00:{i//60:02d}:{i%60:02d}", i, m))
    df = spark.createDataFrame(
        rows, "task_id long, ts string, seq long, m map<string,string>") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.task_id: r for r in pipeline.aggregate_tasks(
        df, "task_id", "m", order_cols=["seq"]).collect()}
    sim = {}
    for task, _ts, _seq, m in rows:       # rows already in (ts, seq) order
        sim.setdefault(task, {}).update(m)
    for task, exp in sim.items():
        assert got[task].task_map == exp, task
        assert got[task].n_events == sum(1 for r in rows if r[0] == task)


def test_aggregate_tasks_single_shuffle_plan(spark):
    plan = pipeline.aggregate_tasks(
        _task_events(spark), "task_id", "m", order_cols=["seq"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1      # one hash agg keyed on task_id
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# ---------------------------------------- charset line framing

def _write(tmp_path, name, text, encoding, newline="\n"):
    p = tmp_path / name
    p.write_bytes(text.encode(encoding))
    return str(tmp_path)


def test_read_lines_charset_utf16(spark, tmp_path):
    lines = ["CEF:0|v|p|1|sig|name|5|", "héllo wörld", "第三行"]
    d = _write(tmp_path, "a.log", "\n".join(lines) + "\n", "utf-16-le")
    got = sorted(r.text for r in
                 sources.read_lines_charset(spark, d, "UTF-16LE").collect())
    assert got == sorted(lines)
    whole = sorted(r.text for r in sources.read_lines_charset(
        spark, d, "UTF-16LE", whole_file=True).collect())
    assert whole == got


def test_read_lines_charset_latin1_and_empty_frames(spark, tmp_path):
    d = _write(tmp_path, "b.log", "caf\xe9\n\nseñor\n", "latin-1")
    got = sorted(r.text for r in
                 sources.read_lines_charset(spark, d, "ISO-8859-1").collect())
    assert got == ["café", "señor"]     # empty frame dropped
