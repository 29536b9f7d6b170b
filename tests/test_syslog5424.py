"""RFC 5424 parser: spec examples, structured-data escapes, nil fields."""

from __future__ import annotations

from pyspark.sql import functions as F

from cefspark.syslog_pri import parse_syslog5424

RFC_EXAMPLE = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
               'evntslog 1370 ID47 [exampleSDID@32473 iut="3" '
               'eventSource="Application" eventID="1011"] '
               'BOMAn application event log entry')


def _one(spark, line):
    df = spark.createDataFrame([(line,)], "message string")
    return parse_syslog5424(df).collect()[0]


def test_rfc_example_5(spark):
    r = _one(spark, RFC_EXAMPLE)
    assert (r.pri5424, r.facility5424, r.severity5424, r.version) == \
        (165, 20, 5, 1)
    assert r.hostname5424 == "mymachine.example.com"
    assert (r.appname, r.procid, r.msgid) == ("evntslog", "1370", "ID47")
    assert r.sd_params == {"exampleSDID@32473/iut": "3",
                           "exampleSDID@32473/eventSource": "Application",
                           "exampleSDID@32473/eventID": "1011"}
    assert r.msg5424 == "BOMAn application event log entry"
    assert r.ts5424 is not None


def test_multiple_sd_elements_and_escapes(spark):
    r = _one(spark, '<34>1 - h a p m [x@1 k="va\\"l\\]ue"][y@2 z="2"] body')
    assert r.sd_params == {"x@1/k": 'va"l]ue', "y@2/z": "2"}
    assert r.ts5424 is None  # nil timestamp
    assert r.msg5424 == "body"


def test_nil_fields_and_no_msg(spark):
    r = _one(spark, "<34>1 - - - - - -")
    assert r.facility5424 == 4 and r.severity5424 == 2
    for c in ("ts5424", "hostname5424", "appname", "procid", "msgid",
              "sd_params", "msg5424"):
        assert getattr(r, c) is None, c


def test_rejects_non5424_and_bad_pri(spark):
    for bad in ("not a line", "<999>1 - h a p m -", "<34>0 - h a p m -",
                "<34>1 - h a p m [unterminated", ""):
        r = _one(spark, bad)
        assert r.pri5424 is None and r.sd_params is None, bad


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(RFC_EXAMPLE,)], "message string")
    plan = (parse_syslog5424(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
