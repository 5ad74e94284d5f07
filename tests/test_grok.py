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


def test_literal_parens_align_named_groups():
    """Regression (ADVICE r1): escaped literal '(' in the pattern text must
    NOT shift named-group assignment in the pandas regex."""
    cg = compile_grok("pid(%{INT:pid:int}) level=%{WORD:level}")
    line = "pid(42) level=WARN"
    m_num = re.search(cg.regex, line)
    assert m_num and m_num.groups() == ("42", "WARN")
    m_named = re.search(cg.regex_named, line)
    assert m_named and m_named.group("pid") == "42" and m_named.group("level") == "WARN"


@pytest.mark.parametrize("engine", ["builtin", "pandas"])
def test_literal_parens_engines_agree(spark, engine):
    df = spark.createDataFrame([("pid(42) level=WARN",), ("nope",)], "text string")
    out = apply_grok(df, "pid(%{INT:pid:int}) level=%{WORD:level}", engine=engine)
    rows = sorted(out.collect(), key=lambda r: r.text)
    assert (rows[1].pid, rows[1].level) == (42, "WARN")
    assert rows[0].pid is None and rows[0].level is None


def test_recursive_library_expansion():
    # IPORHOST references IP and HOSTNAME; TIME references HOUR/MINUTE/SECOND
    cg = compile_grok("%{IPORHOST:host} %{TIME:t}")
    m = re.search(cg.regex, "web-01.example.com 12:34:56")
    assert m and m.group(1) == "web-01.example.com" and m.group(2) == "12:34:56"
    m2 = re.search(cg.regex, "10.1.2.3 23:59:01")
    assert m2 and m2.group(1) == "10.1.2.3"


def test_composite_commonapachelog_subfields():
    cg = compile_grok("%{COMMONAPACHELOG}")
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    m = re.search(cg.regex, line)
    assert m is not None
    by_field = dict(zip(cg.fields, m.groups()))
    assert by_field["clientip"] == "127.0.0.1"
    assert by_field["auth"] == "frank"
    assert by_field["timestamp"] == "10/Oct/2000:13:55:36 -0700"
    assert by_field["verb"] == "GET"
    assert by_field["request"] == "/apache_pb.gif"
    assert by_field["response"] == "200"
    assert by_field["bytes"] == "2326"
    # named regex agrees field-by-field
    mn = re.search(cg.regex_named, line)
    assert mn.group("clientip") == "127.0.0.1" and mn.group("bytes") == "2326"


def test_combined_and_syslog_composites():
    cg = compile_grok("%{COMBINEDAPACHELOG}")
    line = (
        '10.0.0.5 - - [16/Aug/2026:01:02:03 +0000] "POST /submit HTTP/1.1" 302 512 '
        '"http://ref.example/" "curl/8.0"'
    )
    m = re.search(cg.regex_named, line)
    assert m and m.group("referrer") == '"http://ref.example/"' and m.group("agent") == '"curl/8.0"'
    cg2 = compile_grok("%{SYSLOGBASE} %{GREEDYDATA:msg}")
    m2 = re.search(cg2.regex_named, "Aug  6 09:01:02 host-1 sshd[1234]: accepted")
    assert m2 and m2.group("syslog_program") == "sshd" and m2.group("syslog_pid") == "1234"
    assert m2.group("msg") == "accepted"


def test_syslogline_composite():
    cg = compile_grok("%{SYSLOGLINE}")
    m = re.search(
        cg.regex_named, "Aug 17 03:14:15 host-9.example.com cron[77]: job started"
    )
    assert m is not None
    assert m.group("syslog_timestamp") == "Aug 17 03:14:15"
    assert m.group("syslog_host") == "host-9.example.com"
    assert m.group("syslog_program") == "cron"
    assert m.group("syslog_pid") == "77"
    assert m.group("syslog_message") == "job started"


def test_httpd24_errorlog_composite():
    cg = compile_grok("%{HTTPD24_ERRORLOG}")
    # a GENUINE apache 2.4 default-format line: lowercase level,
    # microsecond timestamp, pid:tid
    real = (
        "[Thu Jun 27 11:55:44.569531 2013] [core:error] [pid 21823:tid 140] "
        "[client 10.9.8.7:51234] File does not exist: /var/www/favicon.ico"
    )
    m = re.search(cg.regex_named, real)
    assert m is not None, "real httpd 2.4 line must match"
    assert m.group("timestamp") == "Thu Jun 27 11:55:44.569531 2013"
    assert m.group("module") == "core"
    assert m.group("loglevel") == "error"
    assert m.group("pid") == "21823" and m.group("tid") == "140"
    assert m.group("clientip") == "10.9.8.7"
    assert m.group("clientport") == "51234"
    assert m.group("message") == "File does not exist: /var/www/favicon.ico"
    # uppercase/whole-second variant still matches
    line = (
        "[Fri Aug 14 12:34:56 2026] [core:ERROR] [pid 4321] "
        "[client 10.9.8.7:51234] File does not exist: /var/www/favicon.ico"
    )
    m = re.search(cg.regex_named, line)
    assert m is not None and m.group("loglevel") == "ERROR"
    # client section is optional (not all error lines carry it)
    m2 = re.search(cg.regex_named, "[Sat Jan 01 00:00:01 2026] [:WARN] [pid 9] server reload")
    assert m2 and m2.group("message") == "server reload" and m2.group("clientip") is None
    # modern logstash aliases resolve to the apache composites
    assert compile_grok("%{HTTPD_COMMONLOG}").fields == compile_grok("%{COMMONAPACHELOG}").fields


def test_load_pattern_file_and_dir(tmp_path):
    from logzoom_spark.grok import load_pattern_file, load_patterns_dir

    f1 = tmp_path / "custom1"
    f1.write_text(
        "# custom app patterns\n"
        "\n"
        "APPID app-[0-9]{4}\n"
        "APPLINE %{APPID:app} user=%{USERNAME:user}\n"
    )
    pats = load_pattern_file(str(f1))
    assert pats == {"APPID": "app-[0-9]{4}", "APPLINE": "%{APPID:app} user=%{USERNAME:user}"}
    # user patterns compose with each other AND the built-in library
    cg = compile_grok("%{APPLINE}", extra_patterns=pats)
    m = re.search(cg.regex_named, "app-0042 user=alice.b")
    assert m and m.group("app") == "app-0042" and m.group("user") == "alice.b"
    # dir loading: later files override earlier names
    (tmp_path / "custom2").write_text("APPID app-[0-9]+\n")
    merged = load_patterns_dir(str(tmp_path))
    assert merged["APPID"] == "app-[0-9]+"
    bad = tmp_path / "subdir_bad"
    bad.mkdir()
    badfile = bad / "bad"
    badfile.write_text("not-a-name!\n")
    with pytest.raises(ValueError, match="expected 'NAME pattern'"):
        load_pattern_file(str(badfile))


@pytest.mark.parametrize("engine", ["builtin", "pandas"])
def test_apply_grok_with_extra_patterns(spark, engine):
    df = spark.createDataFrame(
        [("app-7777 user=bob",), ("garbage",)], "text string"
    )
    extra = {"APPID": "app-[0-9]+"}
    out = apply_grok(df, "%{APPID:app} user=%{USERNAME:user}", engine=engine,
                     extra_patterns=extra)
    rows = {r.text: (r.app, r.user) for r in out.collect()}
    assert rows["app-7777 user=bob"] == ("app-7777", "bob")
    assert rows["garbage"] == (None, None)


def test_cycle_and_duplicate_field_rejected():
    with pytest.raises(ValueError, match="cycle"):
        compile_grok("%{A:x}", extra_patterns={"A": "%{B}", "B": "%{A}"})
    with pytest.raises(ValueError, match="duplicate"):
        compile_grok("%{INT:x} %{INT:x}")


def test_pandas_ascii_word_semantics(spark):
    """\\w must be ASCII in the pandas engine (Java/RE2 parity): a non-ASCII
    level value fails to parse identically in both engines."""
    df = spark.createDataFrame([("level=ÉRROR",), ("level=OK7",)], "text string")
    a = {r.text: r.lvl for r in apply_grok(df, "level=%{WORD:lvl}", engine="builtin").collect()}
    b = {r.text: r.lvl for r in apply_grok(df, "level=%{WORD:lvl}", engine="pandas").collect()}
    assert a == b
    assert a["level=OK7"] == "OK7"
    assert a["level=ÉRROR"] is None


def test_ip_and_timestamp_patterns():
    cg = compile_grok("%{IP:ip} at %{TIMESTAMP_ISO8601:when}")
    m = re.search(cg.regex, "10.1.2.3 at 2024-01-02T03:04:05.123Z boom")
    assert m.group(1) == "10.1.2.3"
    assert m.group(2) == "2024-01-02T03:04:05.123Z"
    assert GROK_PATTERNS["LOGLEVEL"]