"""Invariant tests for ops.behavior (user-behavior analytics).

Value parity with DuckDB is covered by the oracle harness; these tests
pin the semantic invariants that survive any refactor: conservation
(counted, not dropped), monotonicity, and boundary rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _events(spark):
    return spark.read.parquet(f"{SF0001}/events.parquet")


def test_cohort_retention_offset0_is_cohort_size(spark):
    from logzoom_spark.ops.behavior import cohort_retention

    out = cohort_retention(_events(spark)).cache()
    zero = out.filter(F.col("day_offset") == 0)
    assert zero.filter(F.col("retention_bp") != 10000).count() == 0
    # every cohort has an offset-0 row, and no offset exceeds it
    bad = (
        out.join(
            zero.select("cohort_day", F.col("n_active").alias("size")),
            "cohort_day",
        )
        .filter(F.col("n_active") > F.col("size"))
        .count()
    )
    assert bad == 0
    assert zero.count() == out.select("cohort_day").distinct().count()
    out.unpersist()


def test_markov_transitions_conserve_events(spark):
    from logzoom_spark.ops.behavior import markov_transitions

    ev = _events(spark)
    out = markov_transitions(ev).cache()
    # every event is a src exactly once (the last one transitions to <end>)
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    ends = out.filter(F.col("dst_type") == "<end>")
    assert ends.agg(F.sum("n")).collect()[0][0] == (
        ev.select("user_id").distinct().count()
    )
    # row-conditional probabilities floor-sum to ≤ 10000
    sums = (
        out.groupBy("src_type")
        .agg(F.sum("prob_bp").alias("s"))
        .filter(F.col("s") > 10000)
        .count()
    )
    assert sums == 0
    out.unpersist()


def test_active_users_rolling_monotone_in_window(spark):
    from logzoom_spark.ops.behavior import active_users_rolling

    ev = _events(spark)
    out = active_users_rolling(ev, windows=(1, 7, 28)).cache()
    wide = (
        out.groupBy("day_no")
        .pivot("window_days", [1, 7, 28])
        .agg(F.first("n_active"))
    )
    assert wide.filter(
        (F.col("1") > F.col("7")) | (F.col("7") > F.col("28"))
    ).count() == 0
    # window=1 is exactly the per-day distinct actives
    dau = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
            "user_id",
        )
        .groupBy("day_no")
        .agg(F.count_distinct("user_id").alias("d"))
    )
    mism = (
        out.filter(F.col("window_days") == 1)
        .join(dau, "day_no")
        .filter(F.col("n_active") != F.col("d"))
        .count()
    )
    assert mism == 0
    out.unpersist()


def test_active_users_rolling_rejects_bad_windows(spark):
    import pytest

    from logzoom_spark.ops.behavior import active_users_rolling

    with pytest.raises(ValueError):
        active_users_rolling(_events(spark), windows=(0, 7))
    with pytest.raises(ValueError):
        active_users_rolling(_events(spark), windows=())


def test_schema_drift_first_day_all_new(spark, turns):
    from logzoom_spark.ops.behavior import schema_drift_daily

    out = schema_drift_daily(turns).cache()
    first = out.orderBy("day_no").first()
    assert first["n_new"] == first["n_keys"]
    assert first["n_gone"] == 0
    assert out.filter(F.col("n_new") > F.col("n_keys")).count() == 0
    out.unpersist()


def test_hourly_seasonality_conserves_and_flags(spark):
    from logzoom_spark.ops.behavior import hourly_seasonality

    ev = _events(spark)
    out = hourly_seasonality(ev).cache()
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    # hot flag means strictly more than 2× the uniform hourly share
    per_type = out.groupBy("event_type").agg(F.sum("n").alias("tot"))
    bad = (
        out.join(per_type, "event_type")
        .filter(
            (F.col("is_hot") == 1) & (F.col("n") * 24 <= 2 * F.col("tot"))
        )
        .count()
    )
    assert bad == 0
    out.unpersist()


def test_activity_concentration_totals(spark):
    from logzoom_spark.ops.behavior import activity_concentration

    ev = _events(spark)
    out = activity_concentration(ev).cache()
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert out.agg(F.sum("n_users")).collect()[0][0] == (
        ev.select("user_id").distinct().count()
    )
    # the last cumulative row covers everything
    last = out.orderBy(F.col("bucket_bits").asc()).first()
    assert last["cum_share_bp"] == 10000
    assert last["cum_events"] == ev.count()
    out.unpersist()
