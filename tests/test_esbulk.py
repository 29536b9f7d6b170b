"""es_bulk codec: positional pairing, resync, round-trip."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cefspark import esbulk


def _df(spark, lines, shard="s0"):
    return spark.createDataFrame(
        [(shard, i, l) for i, l in enumerate(lines)],
        "shard string, line_no long, line string")


def test_basic_pairs_and_delete(spark):
    lines = [
        '{"index":{"_index":"logs","_id":"1"}}', '{"msg":"a"}',
        '{"delete":{"_index":"logs","_id":"2"}}',
        '{"create":{"_index":"other"}}', '{"msg":"b"}',
    ]
    ops = esbulk.decode_es_bulk(_df(spark, lines)).orderBy("op_idx").collect()
    assert [(o.verb, o.target_index, o.doc_id, o.doc_json, o.error)
            for o in ops] == [
        ("index", "logs", "1", '{"msg":"a"}', None),
        ("delete", "logs", "2", None, None),
        ("create", "other", None, '{"msg":"b"}', None),
    ]


def test_source_that_looks_like_action_is_positional(spark):
    # the SOURCE doc itself contains an "index" key — position decides
    lines = ['{"index":{"_id":"1"}}', '{"index":{"nested":"doc"}}',
             '{"index":{"_id":"2"}}', '{"x":1}']
    ops = esbulk.decode_es_bulk(_df(spark, lines)).orderBy("op_idx").collect()
    assert ops[0].doc_json == '{"index":{"nested":"doc"}}'
    assert ops[1].doc_id == "2" and ops[1].doc_json == '{"x":1}'


def test_resync_after_garbage_and_dangling(spark):
    lines = ["not json at all", '{"index":{"_id":"1"}}', '{"ok":1}',
             '{"update":{"_id":"9"}}']
    ops = esbulk.decode_es_bulk(_df(spark, lines)).orderBy("op_idx").collect()
    assert ops[0].error == "expected action line"
    assert ops[1].verb == "index" and ops[1].doc_json == '{"ok":1}'
    assert ops[2].error == "dangling action at end of stream"
    assert ops[2].verb == "update"


def test_blank_lines_skipped_and_shard_parallel(spark):
    lines_a = ['{"index":{"_id":"a"}}', '{"v":1}', ""]
    lines_b = ['{"delete":{"_id":"b"}}']
    df = _df(spark, lines_a, "sA").unionAll(_df(spark, lines_b, "sB"))
    ops = {(o.shard, o.op_idx): o for o in
           esbulk.decode_es_bulk(df).collect()}
    assert ops[("sA", 0)].doc_id == "a" and ops[("sB", 0)].verb == "delete"


def test_roundtrip(spark):
    src = spark.createDataFrame(
        [("index", "logs", "1", '{"m":"x"}'),
         ("delete", "logs", "2", None),
         ("create", None, "3", '{"m":"y"}')],
        "verb string, target_index string, doc_id string, doc_json string")
    lines = [r.line for r in esbulk.encode_es_bulk(src).collect()]
    assert lines == [
        '{"index":{"_index":"logs","_id":"1"}}', '{"m":"x"}',
        '{"delete":{"_index":"logs","_id":"2"}}',
        '{"create":{"_id":"3"}}', '{"m":"y"}',
    ]
    back = esbulk.decode_es_bulk(_df(spark, lines)).orderBy("op_idx").collect()
    assert [(o.verb, o.target_index, o.doc_id, o.doc_json) for o in back] == [
        ("index", "logs", "1", '{"m":"x"}'),
        ("delete", "logs", "2", None),
        ("create", None, "3", '{"m":"y"}'),
    ]
    for o in back:
        assert o.error is None
    # action metadata is real JSON
    assert json.loads(lines[0]) == {"index": {"_index": "logs", "_id": "1"}}


def test_encode_escapes_metadata(spark):
    src = spark.createDataFrame(
        [("index", 'lo"gs', 'a"b\\c', '{"m":1}')],
        "verb string, target_index string, doc_id string, doc_json string")
    lines = [r.line for r in esbulk.encode_es_bulk(src).collect()]
    assert json.loads(lines[0]) == {
        "index": {"_index": 'lo"gs', "_id": 'a"b\\c'}}
    back = esbulk.decode_es_bulk(_df(spark, lines)).collect()
    assert back[0].error is None and back[0].doc_id == 'a"b\\c'
