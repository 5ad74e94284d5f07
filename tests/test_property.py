"""Property-based routing equivalence (SURVEY.md §5.2-5): for random field
maps and rule sets, the Spark routed set equals the Python oracle's."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logzoom_spark.parse import parse_turns
from logzoom_spark.route import Route, apply_route

from .oracle_py import parse_row, route_allows

_FIELD_VALUES = ["log_type1", "log_type2", "log_type3", "INFO", "ERROR", "x", ""]
_RULE_KEYS = ["log_type", "level", "msg", "role", "tool", "missing_key"]

_text = st.one_of(
    st.builds(
        lambda lt, lv, ms: f'level={lv} log_type={lt} latency_ms=7 msg="{ms}"',
        st.sampled_from(["log_type1", "log_type2"]),
        st.sampled_from(["INFO", "ERROR", "WARN"]),
        st.sampled_from(["a", "b", "evt"]),
    ),
    st.builds(
        lambda lt, lv: '{"message":"m","log_type":"%s","level":"%s","latency_ms":3}'
        % (lt, lv),
        st.sampled_from(["log_type1", "log_type2"]),
        st.sampled_from(["INFO", "ERROR"]),
    ),
    st.sampled_from(["", "garbage no kv", "x=1", "{not json", "日本語 ✓"]),
)

_row = st.tuples(
    st.sampled_from(["c1", "c2", "c3"]),
    st.integers(min_value=0, max_value=50),
    st.sampled_from(["user", "assistant", "system", "tool"]),
    _text,
    st.sampled_from([None, "bash", "search", "ghost_tool"]),
)

_rules = st.dictionaries(
    st.sampled_from(_RULE_KEYS), st.sampled_from(_FIELD_VALUES), max_size=3
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1])), rules=_rules)
def test_routed_set_equals_oracle(spark, rows, rules):
    base_ts = dt.datetime(2024, 1, 1)
    data = [
        (c, i, role, text, tool, base_ts + dt.timedelta(minutes=i))
        for (c, i, role, text, tool) in rows
    ]
    df = spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    parsed = parse_turns(df, with_attrs=False)
    got = {
        (r.conv_id, r.turn_idx)
        for r in apply_route(parsed, Route("r", "s", rules)).collect()
    }
    want = {
        (o["conv_id"], o["turn_idx"])
        for o in (parse_row(dict(zip(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"], d))) for d in data)
        if route_allows(o, rules)
    }
    assert got == want


_flap_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=200_000),  # seconds offset
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_flap_rows, cooldown=st.sampled_from([60, 3600, 50_000]))
def test_flap_suppress_invariants(spark, rows, cooldown):
    """For ANY input: (a) every row comes back exactly once (counted, not
    dropped); (b) within a key, consecutive KEPT rows are >= cooldown
    apart; (c) the earliest row per key is kept; (d) kept set equals a
    pure-Python replay of the scan."""
    import datetime as dt

    from logzoom_spark.ops.sre import flap_suppress

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, i, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "log_type string, turn_idx int, ts timestamp")
    out = flap_suppress(
        df, ("log_type",), ("turn_idx",), cooldown_s=cooldown
    ).collect()
    assert len(out) == len(data)  # (a)
    by_key: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.log_type, r.ts_us, r.turn_idx)):
        by_key.setdefault(r.log_type, []).append(r)
    for k, rs in by_key.items():
        kept_ts = [r.ts_us for r in rs if r.kept]
        assert rs[0].kept == 1  # (c)
        for a, b in zip(kept_ts, kept_ts[1:]):
            assert b - a >= cooldown * 1_000_000  # (b)
        # (d) pure-Python replay
        last = None
        for r in rs:
            ok = last is None or r.ts_us >= last + cooldown * 1_000_000
            assert r.kept == (1 if ok else 0)
            if ok:
                last = r.ts_us


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
        min_size=5,
        max_size=12,
        unique=True,
    ),
    extra=st.integers(min_value=5, max_value=25),
)
def test_containment_subset_always_found(spark, words, extra):
    """A doc whose shingle set is a SUBSET of another's always yields
    containment 10000 in the short->long direction, for any rare-shingle
    vocabulary — the guarantee MinHash banding can't make."""
    from logzoom_spark.ops.dedup import ngram_containment_pairs

    short = " ".join(words)
    long_ = short + " " + " ".join(f"pad{i}x" for i in range(extra))
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id bigint, text string"
    )
    out = ngram_containment_pairs(docs, threshold=0.99, hasher="md5").collect()
    assert len(out) == 1
    r = out[0]
    assert max(r.cont_ab10k, r.cont_ba10k) == 10000
