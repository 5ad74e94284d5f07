"""Grok compiler tests (pure-Python compile + both Spark engines)."""

from __future__ import annotations

import re

import pytest

from logzoom_spark.grok import GROK_PATTERNS, apply_grok, compile_grok

PATTERN = 'seq=%{INT:seq:int} level=%{LOGLEVEL:level} log_type=%{WORD:log_type} latency_ms=%{INT:latency_ms:int} msg="%{DATA:message}"'


def test_compile_grok_fields_and_regex():
    cg = compile_grok(PATTERN)
    assert cg.fields == ("seq", "level", "log_type", "latency_ms", "message")
    assert cg.types == {"seq": "bigint", "latency_ms": "bigint"}
    m = re.search(cg.regex, 'seq=4 level=ERROR log_type=t1 latency_ms=99 msg="hi"')
    assert m and m.groups() == ("4", "ERROR", "t1", "99", "hi")


def test_compile_grok_rejects_unknown():
    with pytest.raises(ValueError):
        compile_grok("%{NOPE:x}")
    with pytest.raises(ValueError):
        compile_grok("%{INT:x:decimal}")


def test_grok_literal_escaping():
    cg = compile_grok("a+b=%{INT:v:int}")
    assert re.search(cg.regex, "a+b=7").group(1) == "7"
    assert re.search(cg.regex, "axb=7") is None


@pytest.mark.parametrize("engine", ["builtin", "pandas"])
def test_apply_grok_engines_agree(spark, tiny_turns, engine):
    out = apply_grok(tiny_turns, PATTERN, engine=engine).select(
        "conv_id", "turn_idx", "seq", "level", "log_type", "latency_ms", "message"
    )
    rows = {(r.conv_id, r.turn_idx): r for r in out.collect()}
    r = rows[("c1", 0)]
    assert (r.seq, r.level, r.log_type, r.latency_ms, r.message) == (
        1, "INFO", "log_type1", 5, "a",
    )
    # garbled/json rows don't match the KV grok → nulls
    assert rows[("c2", 0)].seq is None
    assert rows[("c1", 2)].seq is None


def test_engines_identical_on_fixture(spark, tiny_turns):
    a = apply_grok(tiny_turns, PATTERN, engine="builtin")
    b = apply_grok(tiny_turns, PATTERN, engine="pandas")
    cols = ["conv_id", "turn_idx", "seq", "level", "log_type", "latency_ms", "message"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_ip_and_timestamp_patterns():
    cg = compile_grok("%{IP:ip} at %{TIMESTAMP_ISO8601:when}")
    m = re.search(cg.regex, "10.1.2.3 at 2024-01-02T03:04:05.123Z boom")
    assert m.group(1) == "10.1.2.3"
    assert m.group(2) == "2024-01-02T03:04:05.123Z"
    assert GROK_PATTERNS["LOGLEVEL"]