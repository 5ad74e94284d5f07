"""Invariant tests for zorder_layout, ldiversity_audit,
session_event_trigrams, autocorr_lag_profile — the round-5 batch E/F
ops. Trigrams and autocorrelation are cross-checked against independent
pure-Python computations on sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _events(spark):
    return spark.read.parquet(f"{SF0001}/events.parquet")


def test_zorder_envelopes_localize_both_dims(spark):
    from logzoom_spark.ops.layout import zorder_layout

    ev = _events(spark)
    out = zorder_layout(ev, bits=8, n_file_bits=4).cache()
    assert out.agg(F.sum("n_rows")).collect()[0][0] == ev.count()
    assert out.count() <= 16
    # file id pins the top 2 bits of BOTH dimensions -> envelopes < 64
    assert out.filter(
        (F.col("max_u") - F.col("min_u") >= 64)
        | (F.col("max_d") - F.col("min_d") >= 64)
    ).count() == 0
    out.unpersist()


def test_zorder_rejects_bad_bits(spark):
    import pytest

    from logzoom_spark.ops.layout import zorder_layout

    with pytest.raises(ValueError):
        zorder_layout(_events(spark), bits=8, n_file_bits=0)
    with pytest.raises(ValueError):
        zorder_layout(_events(spark), bits=32, n_file_bits=4)


def test_ldiversity_flag_matches_definition(spark):
    from logzoom_spark.ops.audit import ldiversity_audit

    ev = _events(spark)
    out = ldiversity_audit(ev, l=3).cache()
    assert out.filter(
        F.col("ok") != (F.col("n_sensitive") >= 3).cast("int")
    ).count() == 0
    assert out.agg(F.sum("n_rows")).collect()[0][0] == ev.count()
    out.unpersist()


def test_session_trigrams_match_pure_python(spark):
    from logzoom_spark.aggregate import session_event_trigrams

    ev = _events(spark)
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"])
        )
    want = Counter()
    for seq in by_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        sess = []
        prev = None
        for ep, _eid, et in seq:
            if prev is None or ep - prev > 1800:
                sess.append([])
            sess[-1].append(et)
            prev = ep
        for s in sess:
            for i in range(len(s) - 2):
                want[(s[i], s[i + 1], s[i + 2])] += 1
    got = {
        (r["t1"], r["t2"], r["t3"]): r["n"]
        for r in session_event_trigrams(ev, gap_s=1800, top=10**9).collect()
    }
    assert got == dict(want)


def test_autocorr_lag0_is_energy(spark):
    from logzoom_spark.aggregate import autocorr_lag_profile

    ev = _events(spark)
    out = {
        r["lag_min"]: (r["n_pairs"], r["sum_prod"])
        for r in autocorr_lag_profile(ev).collect()
    }
    grid = Counter(
        int(r["ts"].timestamp()) // 60 for r in ev.select("ts").collect()
    )
    assert out[0] == (len(grid), sum(c * c for c in grid.values()))
    for lag in (1, 60, 1440):
        pairs = [
            grid[m] * grid[m + lag] for m in grid if (m + lag) in grid
        ]
        if pairs:
            assert out[lag] == (len(pairs), sum(pairs))
        else:
            assert lag not in out


def test_template_triangles_handcrafted(spark):
    import datetime as dt

    from logzoom_spark.ops.templates import template_triangles

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # convs c1, c2 each contain templates A, B, C -> all 3 edges have
    # presence 2 -> exactly one triangle; c3 adds an A-D edge seen once
    # (below min_both) so D joins no triangle.
    for cid in ("c1", "c2"):
        for i, body in enumerate(("sig A 11", "sig B 22", "sig C 33")):
            rows.append((cid, i, "system", body, None, t0))
    rows += [("c3", 0, "system", "sig A 44", None, t0),
             ("c3", 1, "system", "sig D 55", None, t0)]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["template"]: r["n_triangles"] for r in template_triangles(turns).collect()}
    assert got == {"sig A <#>": 1, "sig B <#>": 1, "sig C <#>": 1}


def test_funnel_within_bounds_and_monotone(spark):
    from logzoom_spark.ops.relational import funnel_within

    ev = _events(spark)
    tight = {r["step"]: r["n_users"] for r in funnel_within(ev, within_s=1).collect()}
    loose = {r["step"]: r["n_users"] for r in funnel_within(ev, within_s=10**9).collect()}
    for step, n in tight.items():
        assert n <= loose[step]
    vals = [r["n_users"] for r in funnel_within(ev, within_s=86400)
            .orderBy("step_idx").collect()]
    assert vals == sorted(vals, reverse=True)


def test_dwell_time_conserves_intervals(spark):
    from logzoom_spark.ops.behavior import dwell_time_by_state

    ev = _events(spark)
    out = dwell_time_by_state(ev)
    n_users = ev.select("user_id").distinct().count()
    assert out.agg(F.sum("n_intervals")).collect()[0][0] == ev.count() - n_users
    assert out.filter(F.col("mean_dwell_s") > F.col("max_dwell_s")).count() == 0


def test_conv_winnow_overlap_detects_shared_passage(spark):
    import datetime as dt

    from logzoom_spark.ops.text import conv_winnow_overlap

    t0 = dt.datetime(2024, 1, 1)
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        ("cA", 0, "user", f"intro words before {passage} trailing bits", None, t0),
        ("cB", 0, "user", f"{passage} followed by entirely different chatter here", None, t0),
        ("cC", 0, "user", "completely unrelated single turn conversation body text", None, t0),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in conv_winnow_overlap(turns, min_shared=1).collect()}
    assert ("cA", "cB") in got
    assert all("cC" not in p for p in got)


def test_bounce_rate_daily_totals(spark):
    from logzoom_spark.ops.behavior import bounce_rate_daily

    ev = _events(spark)
    out = bounce_rate_daily(ev).cache()
    assert out.filter(F.col("n_bounces") > F.col("n_sessions")).count() == 0
    assert out.filter(
        (F.col("bounce_bp") < 0) | (F.col("bounce_bp") > 10000)
    ).count() == 0
    # a huge gap threshold makes each user one session: bounces = users
    # with exactly one event
    one = bounce_rate_daily(ev, gap_s=10**9)
    per_user = ev.groupBy("user_id").count()
    assert one.agg(F.sum("n_sessions")).collect()[0][0] == per_user.count()
    assert one.agg(F.sum("n_bounces")).collect()[0][0] == per_user.filter(
        F.col("count") == 1
    ).count()
    out.unpersist()


def test_linear_attribution_conserves_credits(spark):
    from logzoom_spark.ops.behavior import linear_attribution

    ev = _events(spark)
    out = linear_attribution(ev).cache()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    total = out.agg(F.sum("total_credit_bp")).collect()[0][0]
    # floor equal-share: each purchase distributes (10000 - r) bp,
    # 0 <= r < its touch count; orphans distribute exactly 10000
    assert total <= 10000 * n_purch
    assert total > 10000 * n_purch - out.agg(F.sum("n_credits")).collect()[0][0]
    out.unpersist()


def test_linear_attribution_orphan_goes_to_none(spark):
    import datetime as dt

    from logzoom_spark.ops.behavior import linear_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t0, "purchase"),  # no prior touch -> none
        (2, 20, t0, "view"),
        (2, 21, dt.datetime(2024, 1, 1, 1), "purchase"),  # 1 touch
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    got = {r["touch_type"]: (r["n_credits"], r["total_credit_bp"])
           for r in linear_attribution(ev).collect()}
    assert got == {"none": (1, 10000), "view": (1, 10000)}


def test_benford_audit_shares_and_skew(spark):
    import datetime as dt

    from logzoom_spark.ops.audit import benford_audit

    out = benford_audit(_events(spark)).cache()
    assert out.agg(F.sum("share_bp")).collect()[0][0] <= 10000
    assert out.filter((F.col("digit") < 1) | (F.col("digit") > 9)).count() == 0
    out.unpersist()
    # all-nines data must show a strongly positive deviation on digit 9
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, i, t0, "view", 9.99) for i in range(50)],
        "event_id bigint, user_id bigint, ts timestamp, event_type string, value double",
    )
    nine = {r["digit"]: r["dev_bp"] for r in benford_audit(ev).collect()}
    assert nine == {9: 10000 - 457}


def test_zorder_skipping_rows_and_bounds(spark):
    from logzoom_spark.ops.layout import zorder_skipping_effectiveness

    out = zorder_skipping_effectiveness(_events(spark)).collect()
    assert {r["dim"] for r in out} == {"u", "d"}
    for r in out:
        assert 0 <= r["avg_hit_bp"] <= 10000
        assert r["file_hits"] <= r["n_probes"] * r["n_files"]


def test_ewma_alert_fires_on_spike_only(spark):
    import datetime as dt

    from logzoom_spark.ops.sre import ewma_rate_alerts

    rows = []
    eid = 0
    for day in range(18):
        n = 1000 if day == 17 else 10
        for i in range(n):
            rows.append((eid, 1, dt.datetime(2024, 1, 1 + day, 0, 0, i % 60)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    out = {r["day_no"]: r for r in ewma_rate_alerts(ev).collect()}
    days = sorted(out)
    first, last = out[days[0]], out[days[-1]]
    assert first["norm_x"] == 0 and first["is_alert"] == 0
    assert last["is_alert"] == 1
    assert sum(r["is_alert"] for r in out.values()) == 1


def test_bot_ring_detects_identical_sequences(spark):
    import datetime as dt

    from logzoom_spark.ops.behavior import bot_ring_detection

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1 and 2: identical type order AND identical gap shape
    for u in (1, 2):
        for i, (etype, off) in enumerate(
            [("view", 0), ("click", 10), ("purchase", 100)]
        ):
            rows.append((eid, u, t0 + dt.timedelta(seconds=off + u), etype))
            eid += 1
    # user 3: same types but a different gap shape (bucket differs)
    for etype, off in [("view", 0), ("click", 10), ("purchase", 5000)]:
        rows.append((eid, 3, t0 + dt.timedelta(seconds=off), etype))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = bot_ring_detection(ev, min_users=2).collect()
    assert len(out) == 1
    assert out[0]["n_users"] == 2 and out[0]["n_events"] == 3


def test_growth_report_equals_components(spark):
    from logzoom_spark.ops.behavior import (
        bounce_rate_daily,
        dormancy_reactivation,
        growth_report,
    )

    ev = _events(spark)
    rep = {r["day_no"]: r for r in growth_report(ev).collect()}
    dorm = {r["day_no"]: r for r in dormancy_reactivation(ev).collect()}
    bnc = {r["day_no"]: r for r in bounce_rate_daily(ev).collect()}
    assert set(rep) == set(dorm) | set(bnc)
    for d, r in rep.items():
        assert r["n_new"] <= r["n_active"]
        if d in dorm:
            assert r["n_active"] == dorm[d]["n_active"]
        if d in bnc:
            assert r["n_sessions"] == bnc[d]["n_sessions"]
