"""Reference-semantics quirk suite (SURVEY.md §2.1 'semantic quirks'),
each Spark behavior compared to the pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from logzoom_spark.parse import parse_turns
from logzoom_spark.route import Route, apply_route, fan_out, gate_arith

from .oracle_py import parse_row, route_allows


def _parsed_rows(tiny_turns):
    return [parse_row(r.asDict()) for r in tiny_turns.collect()]


def _spark_routed_keys(df, route):
    return {(r.conv_id, r.turn_idx) for r in apply_route(df, route).collect()}


def _oracle_routed_keys(rows, rules, enforce=True):
    return {
        (r["conv_id"], r["turn_idx"]) for r in rows if route_allows(r, rules, enforce)
    }


def test_parse_matches_python_oracle(spark, tiny_turns):
    spark_rows = {
        (r.conv_id, r.turn_idx): (r.log_type, r.level, r.latency_ms, r.msg, r.parse_ok)
        for r in parse_turns(tiny_turns, with_attrs=False).collect()
    }
    for o in _parsed_rows(tiny_turns):
        assert spark_rows[(o["conv_id"], o["turn_idx"])] == (
            o["log_type"], o["level"], o["latency_ms"], o["msg"], o["parse_ok"],
        )


def test_pandas_engine_equals_builtin(spark, tiny_turns):
    a = parse_turns(tiny_turns, engine="builtin", with_attrs=False)
    b = parse_turns(tiny_turns, engine="pandas", with_attrs=False)
    cols = ["conv_id", "turn_idx", "log_type", "level", "latency_ms", "msg"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_missing_rule_key_rejects_all(spark, tiny_turns):
    """s3.go:303: fields[key] == nil ⇒ allowed=false."""
    parsed = parse_turns(tiny_turns)
    route = Route("r", "s", {"not_a_field": "x"})
    assert _spark_routed_keys(parsed, route) == set()


def test_rule_filter_matches_oracle(spark, tiny_turns):
    parsed = parse_turns(tiny_turns)
    rows = _parsed_rows(tiny_turns)
    for rules in [
        {"log_type": "log_type1"},
        {"log_type": "log_type2"},
        {"log_type": "log_type1", "level": "ERROR"},
        {"level": "WARN"},
        {},
    ]:
        got = _spark_routed_keys(parsed, Route("r", "s", rules))
        want = _oracle_routed_keys(rows, rules)
        assert got == want, rules


def test_es_sink_ignores_rules(spark, tiny_turns):
    """elasticsearch.go:146-153: rules stored but never checked."""
    parsed = parse_turns(tiny_turns)
    route = Route("r", "es", {"log_type": "log_type1"}, enforce_rules=False)
    got = _spark_routed_keys(parsed, route)
    assert got == {(r["conv_id"], r["turn_idx"]) for r in _parsed_rows(tiny_turns)}


def test_fanout_duplication(spark, tiny_turns):
    """buffer.go:62-68: every sink sees every (routed) event — branches
    overlap, they don't partition."""
    parsed = parse_turns(tiny_turns)
    routes = [
        Route("r1", "a", {"log_type": "log_type1"}),
        Route("r2", "b", {"level": "ERROR"}),
    ]
    branches = fan_out(parsed, routes)
    a = {(r.conv_id, r.turn_idx) for r in branches["a"].collect()}
    b = {(r.conv_id, r.turn_idx) for r in branches["b"].collect()}
    assert a & b, "rows matching both rules must appear in both sinks"


def test_double_sampling_compounds(spark, turns):
    """Input sample then sink sample compound (quirk #10); the S3 <= bound
    admits the boundary bucket where < does not."""
    n_all = turns.count()
    once = turns.filter(gate_arith(50, seed=0))
    twice = once.filter(gate_arith(50, seed=1))
    n_once, n_twice = once.count(), twice.count()
    assert n_once < n_all
    assert n_twice < n_once
    # le vs lt differ by exactly the pct-boundary bucket
    from logzoom_spark.hashing import portable_hash

    lt = turns.filter(gate_arith(50, seed=0, bound="lt")).count()
    le = turns.filter(gate_arith(50, seed=0, bound="le")).count()
    key = F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string"))
    boundary = turns.filter(F.pmod(portable_hash(key, 0), F.lit(100)) == 50).count()
    assert le - lt == boundary


def test_gate_arith_shape_agnostic(spark):
    """The gate must not assume any conv_id format (old version silently
    dropped every row whose id wasn't 'conv-%06d' — VERDICT r1 #4)."""
    rows = [(f"weird:{i}:id", i % 7) for i in range(1000)]
    rows += [("", 3), ("Ωmega", 5), ("no digits at all", 1)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    n = df.count()
    picked = df.filter(gate_arith(37, seed=0)).count()
    assert 0.30 * n < picked < 0.45 * n  # ~37%, no silent total drop
    s0 = {r.conv_id for r in df.filter(gate_arith(50, seed=0)).collect()}
    s1 = {r.conv_id for r in df.filter(gate_arith(50, seed=1)).collect()}
    assert s0 != s1 and s0 & s1  # seeds give independent gates


def test_parse_errors_counted_not_dropped(spark, tiny_turns):
    """input/redis/redis.go:85-88 silently drops bad JSON; we keep rows and
    flag them."""
    parsed = parse_turns(tiny_turns)
    assert parsed.count() == tiny_turns.count()
    bad = parsed.filter(~F.col("parse_ok"))
    assert bad.count() == 2  # garbled + empty string rows


def test_text_byte_equality_through_both_engines(spark, tiny_turns):
    """Per-turn text equality invariant incl. unicode/newline/tab through
    the Arrow round-trip (north-rule hard part #5)."""
    src = {(r.conv_id, r.turn_idx): r.text for r in tiny_turns.collect()}
    for engine in ["builtin", "pandas"]:
        out = parse_turns(tiny_turns, engine=engine, with_attrs=False)
        got = {(r.conv_id, r.turn_idx): r.text for r in out.collect()}
        assert got == src, engine


def test_nonstring_rule_compare_as_string(spark, tiny_turns):
    """Reference panics on non-string rule fields (s3.go:303 .(string));
    we compare lexically: rule on int column works via string cast."""
    parsed = parse_turns(tiny_turns)
    got = _spark_routed_keys(parsed, Route("r", "s", {"turn_idx": "0"}))
    assert got == {("c1", 0), ("c2", 0)}


def test_portable_hash_three_engine_parity(spark):
    """The 60-bit portable hash underpins every hash-dependent oracle
    (minhash/LSH/simhash/gates/sketches): Spark, DuckDB, and an
    independent Python md5 reimplementation must agree bit-for-bit on
    hostile inputs (unicode, quotes, newlines, empty, long)."""
    import hashlib

    import duckdb

    from logzoom_spark.hashing import portable_hash, portable_hash_sql

    corpus = [
        "", "a", "hello world", "日本語テキスト ✓", 'quote"inside',
        "line\nbreak", "tab\tchar", "ünïcödé", "x" * 5000, "0", "-1",
        "conv-000042|7", "NaN", "null", "'); DROP TABLE docs; --",
    ]
    for seed in (0, 1, 7919):
        py = {
            s: int(hashlib.md5((s + f"#{seed}").encode("utf-8")).hexdigest()[:15], 16)
            for s in corpus
        }
        df = spark.createDataFrame([(s,) for s in corpus], "s string")
        got_spark = {
            r["s"]: r["h"]
            for r in df.select("s", portable_hash(F.col("s"), seed).alias("h")).collect()
        }
        assert got_spark == py, f"spark != python at seed {seed}"
        con = duckdb.connect()
        con.execute("CREATE TABLE t (s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in corpus])
        got_duck = dict(
            con.execute(f"SELECT s, {portable_hash_sql('s', seed)} FROM t").fetchall()
        )
        assert got_duck == py, f"duckdb != python at seed {seed}"


def test_hostile_rows_never_kill_the_job(spark):
    """Job-abort regressions (review r3): duplicated KV keys must not trip
    DUPLICATED_MAP_KEY in the attrs map (last wins), a leading msg= must
    not leak quoted fragments into attrs, non-string JSON field values
    must not crash the pandas engine (and must render like
    get_json_object), and an overflowing latency must yield NULL in both
    engines."""
    import datetime as dt

    from logzoom_spark.parse import parse_turns

    rows = [
        ("c1", 0, "user", 'log_type=app level=INFO x=1 x=2 msg="m"', None),
        ("c1", 1, "user", 'msg="hello world" log_type=app level=INFO', None),
        ("c1", 2, "user", '{"log_type":"app","level":5,"latency_ms":12.5,"message":true}', None),
        ("c1", 3, "user", "log_type=app level=INFO latency_ms=99999999999999999999999", None),
        ("c1", 4, "user", '{"log_type":"app","level":"INFO","latency_ms":77}', None),
    ]
    base_ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(c, i, r, t, tool, base_ts) for (c, i, r, t, tool) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.turn_idx: r for r in parse_turns(df, with_attrs=True).collect()}
    assert got[0]["attrs"]["x"] == "2"  # last occurrence wins, no job abort
    assert "msg" not in got[1]["attrs"] and got[1]["attrs"]["log_type"] == "app"
    assert got[3]["latency_ms"] is None  # try_cast overflow -> NULL

    for engine in ("builtin", "pandas"):
        out = {r.turn_idx: r for r in parse_turns(df, engine=engine, with_attrs=False).collect()}
        assert out[2]["level"] == "5" and out[2]["msg"] == "true", engine
        assert out[2]["latency_ms"] is None, engine  # 12.5 not integral
        assert out[3]["latency_ms"] is None, engine
        assert out[4]["latency_ms"] == 77, engine
