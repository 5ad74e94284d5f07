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
