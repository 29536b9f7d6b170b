"""compile_dissect conformance — pure Python (the compiled regex lives in
the java/RE2/`re` common subset, same argument as tests/test_grok_library.py;
Spark-side plumbing is pinned in test_spark_pipeline.py)."""

from __future__ import annotations

import re

import pytest

from cefspark.dissect import compile_dissect


def _match(pattern: str, line: str):
    regex, specs = compile_dissect(pattern)
    m = re.fullmatch(regex, line)
    if m is None:
        return None
    out: dict[str, str] = {}
    for gi, (name, _cast, appended, prev_lit) in enumerate(specs, start=1):
        if appended:
            out[name] = out[name] + prev_lit + m.group(gi)
        else:
            out[name] = m.group(gi)
    return out


def test_basic_split():
    got = _match("%{a} %{b} %{c}", "one two three four")
    assert got == {"a": "one", "b": "two", "c": "three four"}  # last greedy


def test_literal_delimiters_and_tail():
    got = _match("[%{level}] %{msg}!", "[WARN] disk low!")
    assert got == {"level": "WARN", "msg": "disk low"}
    assert _match("[%{level}] %{msg}!", "[WARN] no bang") is None


def test_skip_tokens():
    got = _match("%{} %{?junk} %{keep}", "a b c")
    assert got == {"keep": "c"}


def test_append_joins_with_delimiter():
    got = _match("%{ts} %{+ts} %{+ts} %{host}",
                 "Oct 11 22:14:15 web-1")
    assert got == {"ts": "Oct 11 22:14:15", "host": "web-1"}


def test_right_pad_swallows_repeats():
    got = _match("%{name->} %{id}", "alpha      42")
    assert got == {"name": "alpha", "id": "42"}
    # without -> the lazy captures land the padding inside `name`
    got2 = _match("%{name} %{id}", "alpha      42")
    assert got2["name"] == "alpha" and got2["id"] != "42"


def test_empty_field_between_delimiters():
    got = _match("%{a},%{b},%{c}", "x,,z")
    assert got == {"a": "x", "b": "", "c": "z"}


def test_rejections():
    with pytest.raises(ValueError, match="not separated"):
        compile_dissect("%{a}%{b}")
    with pytest.raises(ValueError, match="duplicate"):
        compile_dissect("%{a} %{a}")
    with pytest.raises(ValueError, match="appends to a field"):
        compile_dissect("%{+a} %{b}")
    with pytest.raises(ValueError, match="no %\\{"):
        compile_dissect("plain text")
    with pytest.raises(ValueError, match="unknown dissect type"):
        compile_dissect("%{a:decimal} %{b}")
    with pytest.raises(ValueError, match="bad dissect field name"):
        compile_dissect("%{a b} %{c}")


def test_typed_spec_casts():
    _regex, specs = compile_dissect("%{n:int} %{x:double} %{s}")
    assert [(n, c) for n, c, _a, _p in specs] == [
        ("n", "bigint"), ("x", "double"), ("s", None)]


def test_regex_special_delimiters_are_quoted():
    got = _match("%{a}|%{b}(%{c})", "x|y(z)")
    assert got == {"a": "x", "b": "y", "c": "z"}
