"""Decode corpus — pytest transliteration of the reference RSpec decode specs
(/root/reference/spec/codecs/cef_spec.rb:470-1036), run against the pure-pandas
batch parser. Each case cites the spec lines it reproduces."""

import pandas as pd
import pytest

from cefspark.parser import DecodeConfig, decode_batch, decode_one

CANON = ("CEF:0|security|threatmanager|1.0|100|"
         "trojan successfully stopped|10|src=10.0.0.192 dst=12.121.122.82 spt=1232")


def ok(row):
    assert row["tags"] is None, row.get("error")
    return row


def fail(row):
    assert row["tags"] == ["_cefparsefailure"]
    return row


def validate_canon(e):
    # cef_spec.rb:522-538
    assert e["cefVersion"] == "0"
    assert e["deviceVendor"] == "security"
    assert e["deviceProduct"] == "threatmanager"
    assert e["deviceVersion"] == "1.0"
    assert e["deviceEventClassId"] == "100"
    assert e["name"] == "trojan successfully stopped"
    assert e["severity"] == "10"  # strings, not ints (cef_spec.rb:390)
    assert e["sourceAddress"] == "10.0.0.192"
    assert e["destinationAddress"] == "12.121.122.82"
    assert e["sourcePort"] == "1232"


def test_canonical_message():
    validate_canon(ok(decode_one(CANON)))


def test_missing_headers_are_empty_strings():
    # cef_spec.rb:643-650
    e = ok(decode_one("CEF:0|||1.0|100|trojan successfully stopped|10|"
                      "src=10.0.0.192 dst=12.121.122.82 spt=1232"))
    assert e["deviceVendor"] == ""
    assert e["deviceProduct"] == ""


def test_leading_whitespace_stripped():
    # cef_spec.rb:652-657
    validate_canon(ok(decode_one(
        "CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|"
        " src=10.0.0.192 dst=12.121.122.82 spt=1232")))


def test_syslog_prelude():
    # cef_spec.rb:942-948
    e = ok(decode_one("Syslogdate Sysloghost " + CANON))
    assert e["syslog"] == "Syslogdate Sysloghost"
    assert e["cefVersion"] == "0"


def test_escaped_pipes_in_headers():
    # cef_spec.rb:814-825
    e = ok(decode_one(r"CEF:0|secu\|rity|threatmanager\||1.\|0|10\|0|"
                      r"tro\|jan successfully stopped|\|10|"))
    assert e["deviceVendor"] == "secu|rity"
    assert e["deviceProduct"] == "threatmanager|"
    assert e["deviceVersion"] == "1.|0"
    assert e["deviceEventClassId"] == "10|0"
    assert e["name"] == "tro|jan successfully stopped"
    assert e["severity"] == "|10"


def test_escaped_backslashes_in_headers():
    # cef_spec.rb:792-803
    e = ok(decode_one(r"CEF:0|secu\\rity|threat\\manager|1.\\0|10\\0|"
                      r"tro\\jan successfully stopped|\\10|"))
    assert e["deviceVendor"] == "secu\\rity"
    assert e["deviceProduct"] == "threat\\manager"
    assert e["deviceVersion"] == "1.\\0"
    assert e["deviceEventClassId"] == "10\\0"
    assert e["name"] == "tro\\jan successfully stopped"
    assert e["severity"] == "\\10"


def test_header_ending_with_escaped_backslashes_before_pipe():
    # cef_spec.rb:611-625: 'double backslash\\\\|10|...' — the escaped
    # backslashes end the header, the pipe terminates it
    msg = ("CEF:0|security|threatmanager|1.0|100|double backslash"
           "\\\\" "\\\\" "|10|src=10.0.0.192 dst=12.121.122.82 spt=1232")
    e = ok(decode_one(msg))
    assert e["name"] == "double backslash\\\\"
    assert e["severity"] == "10"


def test_unescaped_pipe_in_extension_value():
    # cef_spec.rb:666-671
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|moo=this|has an pipe"))
    assert e["moo"] == "this|has an pipe"


def test_escaped_pipe_in_extension_value_kept_verbatim():
    # cef_spec.rb:659-664 — \| in extension values is NOT unescaped
    e = ok(decode_one(r"CEF:0|security|threatmanager|1.0|100|"
                      r"trojan successfully stopped|10|moo=this\|has an escaped pipe"))
    assert e["moo"] == r"this\|has an escaped pipe"


def test_unescaped_equals_inside_value():
    # cef_spec.rb:673-679
    e = ok(decode_one(r"CEF:0|security|threatmanager|1.0|100|"
                      r"trojan successfully stopped|10|moo=this =has = equals\="))
    assert e["moo"] == "this =has = equals="


def test_escape_sequences_in_extension_value():
    # cef_spec.rb:681-696
    e = ok(decode_one(
        "CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|"
        "foo=bar msg=this message has escaped equals \\= and escaped newlines \\n "
        "escaped carriage returns \\r and escaped backslashes \\\\ in it bar=baz"))
    assert e["foo"] == "bar"
    assert e["message"] == ("this message has escaped equals = and escaped newlines \n "
                            "escaped carriage returns \r and escaped backslashes \\ in it")
    assert e["bar"] == "baz"


def test_lone_backslashes_preserved():
    # cef_spec.rb:827-832
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|moo=this \\has \\ backslashs\\"))
    assert e["moo"] == "this \\has \\ backslashs\\"


def test_multi_space_separation_and_spaces_in_values():
    # cef_spec.rb:842-871
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "src=10.0.0.192  dst=12.121.122.82  spt=1232 "
                      "dproc=InternetExplorer x.x.x.x"))
    assert e["sourceAddress"] == "10.0.0.192"
    assert e["destinationAddress"] == "12.121.122.82"
    assert e["destinationProcessName"] == "InternetExplorer x.x.x.x"


def test_dotted_comma_and_indexed_keys():
    # cef_spec.rb:852-899
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "ad.nn=TEST additional.dotfieldName=new_value "
                      "ad.Error_,Code=3221225578 ad.field[0]=field0 "
                      "ad.foo.name[1]=new_name"))
    assert e["ad.nn"] == "TEST"
    assert e["additional.dotfieldName"] == "new_value"
    assert e["ad.Error_,Code"] == "3221225578"
    # array-like keys are rewritten to strict field references (cef.rb:296)
    assert e["[ad.field][0]"] == "field0"
    assert e["[ad.foo.name][1]"] == "new_name"


def test_abbreviated_key_expansion():
    # cef_spec.rb:926-940
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "src=10.0.0.192 dst=12.121.122.82 proto=TCP shost=source.host.name "
                      "dhost=destination.host.name spt=1232 dpt=443 outcome=Success "
                      "amac=00:80:48:1c:24:91"))
    assert e["sourceAddress"] == "10.0.0.192"
    assert e["transportProtocol"] == "TCP"
    assert e["sourceHostName"] == "source.host.name"
    assert e["destinationHostName"] == "destination.host.name"
    assert e["destinationPort"] == "443"
    assert e["eventOutcome"] == "Success"
    assert e["agentMacAddress"] == "00:80:48:1c:24:91"


def test_custom_numbered_fields():
    # cef_spec.rb:958-971
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "cfp15=afloat cfp15Label=FloatLabel c6a12=::1 c6a12Label=v6Label "
                      "cn7=anumber cn7Label=NumberLabel cs4=astring cs4Label=StringLabel"))
    assert e["deviceCustomFloatingPoint15"] == "afloat"
    assert e["deviceCustomFloatingPoint15Label"] == "FloatLabel"
    assert e["deviceCustomIPv6Address12"] == "::1"
    assert e["deviceCustomNumber7"] == "anumber"
    assert e["deviceCustomString4"] == "astring"
    assert e["deviceCustomString4Label"] == "StringLabel"


def test_unknown_keys_pass_through():
    # cef_spec.rb:916-924
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|new_key_by_device=new_values here"))
    assert e["new_key_by_device"] == "new_values here"


def test_guid_unescaped_equals_and_empty_cs1():
    # cef_spec.rb:744-776
    e = ok(decode_one(
        "CEF:0|FooBar|Web Gateway|1.2.3.45.67|200|Success|2|"
        "rt=Sep 07 2018 14:50:39 cat=Access Log dst=1.1.1.1 dhost=foo.example.com "
        "suser=redacted src=2.2.2.2 requestMethod=POST "
        "request='https://foo.example.com/bar/bingo/1' "
        "requestClientApplication='Foo-Bar/2018.1.7; Email:user@example.com; Guid:test=' "
        "cs1= cs1Label=Foo Bar"))
    assert e["deviceVendor"] == "FooBar"
    assert e["deviceReceiptTime"] == "Sep 07 2018 14:50:39"  # verbatim in disabled mode
    assert e["deviceEventCategory"] == "Access Log"
    assert e["requestUrl"] == "'https://foo.example.com/bar/bingo/1'"
    assert e["requestClientApplication"] == "'Foo-Bar/2018.1.7; Email:user@example.com; Guid:test='"
    assert e["deviceCustomString1"] == ""
    assert e["deviceCustomString1Label"] == "Foo Bar"


def test_escaped_equals_with_unescaped_spaces():
    # cef_spec.rb:778-790
    qs = "key1=value1&key2=value3 aa.bc&key3=value4"
    escaped = qs.replace("=", "\\=")
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      f"trojan successfully stopped|10|go=start now query_string={escaped} final=done"))
    assert e["go"] == "start now"
    assert e["query_string"] == qs
    assert e["final"] == "done"


def test_quote_stripping():
    # cef.rb:243-245 — flex connectors wrap payloads in quotes
    validate_canon(ok(decode_one('"' + CANON + '"')))


def test_trailing_newline_chomped():
    validate_canon(ok(decode_one(CANON + "\n")))
    validate_canon(ok(decode_one(CANON + "\r\n")))


def test_utf8_higher_plane():
    # cef_spec.rb:973-994
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|target=aaaaaああああaaaa "
                      "src=10.0.0.192 dst=12.121.122.82 spt=1232"))
    assert e["target"] == "aaaaaああああaaaa"


def test_legacy_geo_aliases_pass_through_disabled():
    # cef_spec.rb:1022-1034
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "destinationLongitude=-73.614830 destinationLatitude=45.505918 "
                      "sourceLongitude=45.4628328 sourceLatitude=9.1076927"))
    assert e["destinationLongitude"] == "-73.614830"
    assert e["sourceLatitude"] == "9.1076927"


def test_legacy_geo_aliases_map_in_ecs():
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|destinationLongitude=-73.614830",
                      DecodeConfig(ecs_mode=True)))
    assert e["[destination][geo][location][lon]"] == "-73.614830"


# --- failure modes (cef_spec.rb:541-609) -------------------------------------

def test_non_cef_payload_fails():
    e = fail(decode_one("this is not cef"))
    assert e["message"] == "this is not cef"
    assert "found 0 of 7" in e["error"]


def test_four_header_sections_fail():
    msg = "a|b|c with several \\| escaped\\| pipes|d|bananas"
    e = fail(decode_one(msg))
    assert e["message"] == msg
    assert "found 4 of 7" in e["error"]


def test_keyless_extension_tail_fails():
    msg = ("CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|"
           "this is in the extensions space but it is not valid because it is "
           "not equals-separated key/value")
    e = fail(decode_one(msg))
    assert e["message"] == msg
    assert "keyless value present" in e["error"]


def test_embedded_newlines_fail():
    msg = CANON + "\n" + CANON + "\n"
    e = fail(decode_one(msg))
    assert e["message"] == msg
    assert "unescaped newline" in e["error"]


def test_headers_are_none_on_failure():
    df = decode_batch(pd.Series(["this is not cef"]))
    row = df.iloc[0]
    assert row["deviceVendor"] is None and row["extensions"] is None


# --- ECS mode ----------------------------------------------------------------

def test_ecs_mode_maps_extension_keys():
    e = ok(decode_one(CANON, DecodeConfig(ecs_mode=True)))
    assert e["[source][ip]"] == "10.0.0.192"
    assert e["[destination][ip]"] == "12.121.122.82"
    assert e["[source][port]"] == "1232"


def test_ecs_timestamp_with_dtz_side_channel():
    # cef_spec.rb:698-722: rt without zone + dtz=Europe/Moscow
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|"
                      "rt=Jul 19 2017 10:50:21.127 dtz=Europe/Moscow",
                      DecodeConfig(ecs_mode=True)))
    assert e["@timestamp"] == "2017-07-19T07:50:21.127000000Z"
    assert e["[event][timezone]"] == "Europe/Moscow"


def test_ecs_empty_timestamp_is_none():
    # cef_spec.rb:724-742
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|start= src=10.0.0.192",
                      DecodeConfig(ecs_mode=True)))
    assert e["[event][start]"] is None
    assert e["[source][ip]"] == "10.0.0.192"


def test_ecs_invalid_timestamp_fails_event():
    e = fail(decode_one("CEF:0|security|threatmanager|1.0|100|"
                        "trojan successfully stopped|10|rt=Last Thursday",
                        DecodeConfig(ecs_mode=True)))
    assert "timestamp" in e["error"].lower()


def test_disabled_mode_keeps_raw_timestamp_strings():
    # cef_spec.rb:706-712
    e = ok(decode_one("CEF:0|security|threatmanager|1.0|100|"
                      "trojan successfully stopped|10|rt=Jul 19 2017 10:50:21.127"))
    assert e["deviceReceiptTime"] == "Jul 19 2017 10:50:21.127"


def test_raw_data_field():
    # cef_spec.rb:1011-1020
    e = ok(decode_one(CANON, DecodeConfig(raw_data_field="_raw")))
    assert e["_raw"] == CANON


def test_batch_mixed_success_and_failure():
    df = decode_batch(pd.Series([CANON, "garbage", CANON + "\n", None]))
    assert list(df["tags"].map(lambda t: t is not None)) == [False, True, False, True]
    assert df.iloc[1]["message"] == "garbage"


def test_ascii_semantics_nbsp_is_value_data():
    # Ruby \s/\S are ASCII-only: NBSP is \S data, never a pair separator
    e = ok(decode_one("CEF:0|v|p|1.0|100|ev|5|msg=hello next=1"))
    assert e["message"] == "hello next=1"
    assert "next" not in e


def test_ascii_semantics_unicode_word_is_not_a_key():
    # Ruby \w is ASCII-only: 'café=' is not key-shaped, stays inside the value
    e = ok(decode_one("CEF:0|v|p|1.0|100|ev|5|foo=bar café=x"))
    assert e["foo"] == "bar café=x"
    assert "café" not in e


def test_ascii_semantics_trailing_unicode_space_preserved():
    # Ruby String#strip removes ASCII whitespace + NUL only
    e = ok(decode_one("CEF:0|v|p|1.0|100|ev|5|k=v "))
    assert e["k"] == "v "


def test_failure_message_is_quote_stripped():
    # the reference failure event carries the reassigned (quote-stripped)
    # data, not the original bytes (cef.rb:243-245, 326)
    e = fail(decode_one('"this is not cef"'))
    assert e["message"] == "this is not cef"


def test_leading_nul_in_extensions_stripped():
    # Ruby message.strip removes NUL too (cef.rb:285)
    e = ok(decode_one("CEF:0|v|p|1.0|100|ev|5|\x00k=v"))
    assert e["k"] == "v"


def test_nul_only_extension_block_is_ok():
    e = ok(decode_one("CEF:0|v|p|1.0|100|ev|5|\x00\x00"))
    assert e["tags"] is None
