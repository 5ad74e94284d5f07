"""User-behavior analytics over the event stream.

The reference ships raw frames to sinks and leaves analysis to whatever
reads them (reference: output/s3/s3.go, output/elasticsearch/
elasticsearch.go — opaque pass-through); these operators are the
product-analytics layer a 100 TB event pipeline computes IN the engine so
the sinks receive bounded aggregates instead of raw volume:

- `cohort_retention` — classic signup-cohort retention triangle.
- `markov_transitions` — first-order event-type transition matrix.
- `active_users_rolling` — DAU/WAU/MAU-style rolling distinct actives.
- `schema_drift_daily` — day-over-day KV-key churn in the raw text
  (the early-warning audit for upstream producers changing format —
  the failure the reference's parse-error counter only sees after the
  fact, reference: input/filebeat/filebeat.go drop counters).
- `hourly_seasonality` — hour-of-day load shape with hot-hour flags.
- `activity_concentration` — heavy-user concentration by power-of-two
  activity bucket (the skew evidence that sizes salting decisions).

Every output is integer-exact (epoch days, counts, floor basis points),
so each operator carries a full DuckDB value oracle.

Scale shape, shared: all six collapse the raw event volume to a distinct
or grouped set on the table's natural keys (user_id / day / event_type)
as the FIRST exchange; every later window or join runs over an aggregate
bounded by calendar days × type vocabulary, never by event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cohort_retention",
    "markov_transitions",
    "active_users_rolling",
    "schema_drift_daily",
    "hourly_seasonality",
    "activity_concentration",
]


def _day(col: str = "ts") -> F.Column:
    """Epoch-day BIGINT — the cross-engine-stable day key."""
    return F.datediff(F.to_date(F.col(col)), F.lit("1970-01-01")).cast("bigint")


def cohort_retention(events: DataFrame) -> DataFrame:
    """Signup-cohort retention triangle: users are cohorted by their
    first-seen day; for each (cohort_day, day_offset) report how many
    cohort members were active and the retention rate vs the cohort's
    size in floor basis points. Offset 0 is the cohort size by
    construction (retention_bp = 10000).

    Returns (cohort_day, day_offset, n_active, retention_bp).

    Scale shape: one distinct over (user_id, day) — the only exchange
    touching event volume — then a per-user min rides a second exchange
    on user_id (the table's natural key), and the final rollup plus the
    cohort-size window run over the (days × offsets)-bounded aggregate.
    """
    ud = events.select(
        F.col("user_id"), _day().alias("day_no")
    ).distinct()
    first = ud.groupBy("user_id").agg(F.min("day_no").alias("cohort_day"))
    tri = (
        ud.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day_no") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )
    size_w = Window.partitionBy("cohort_day")
    cohort_size = F.max(
        F.when(F.col("day_offset") == 0, F.col("n_active"))
    ).over(size_w)
    return tri.select(
        "cohort_day",
        "day_offset",
        "n_active",
        cohort_size.alias("_den"),
    ).select(
        "cohort_day",
        "day_offset",
        "n_active",
        F.expr("(n_active * 10000) div _den").cast("bigint").alias("retention_bp"),
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order user-journey transition matrix: for each user's
    event sequence (ordered by ts, event_id as the deterministic
    tiebreak) count src→dst event-type transitions; each user's final
    event transitions to the absorbing state ``<end>`` so rows are
    counted, never dropped. prob_bp is the floor-bp row-conditional
    probability P(dst | src).

    Returns (src_type, dst_type, n, prob_bp).

    Scale shape: one window on the natural user key (state = one row),
    then a map-side-combined rollup to the type-vocabulary × type-
    vocabulary matrix; the probability window runs over that bounded
    matrix."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("src_type"),
        F.coalesce(F.lead("event_type").over(w), F.lit("<end>")).alias("dst_type"),
    )
    mat = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    row_w = Window.partitionBy("src_type")
    return mat.select(
        "src_type",
        "dst_type",
        "n",
        F.sum("n").over(row_w).alias("_den"),
    ).select(
        "src_type",
        "dst_type",
        "n",
        F.expr("(n * 10000) div _den").cast("bigint").alias("prob_bp"),
    )


def active_users_rolling(
    events: DataFrame, windows: tuple[int, ...] = (1, 7, 28)
) -> DataFrame:
    """Rolling distinct actives (DAU/WAU/MAU family): for each observed
    day and each trailing window length w, the count of distinct users
    with ≥1 event in [day−w+1, day]. Only days that actually appear in
    the data are reported (the engine audits what it saw; calendar
    gap-filling is a presentation concern).

    Returns (day_no, window_days, n_active).

    Scale shape: event volume collapses to the distinct (user, day) set
    first; that set explodes by Σw (36 with the default windows) — a
    bounded constant factor on the SMALL set, not on raw events — then
    a semi-join against observed days and one exact-distinct rollup per
    (day, window)."""
    if not windows or any(w < 1 for w in windows):
        raise ValueError(f"window lengths must be >= 1, got {windows!r}")
    ud = events.select(F.col("user_id"), _day().alias("day_no")).distinct()
    days = ud.select("day_no").distinct()
    wins = F.array(*[F.lit(int(w)) for w in sorted(set(windows))])
    offs = (
        ud.select(
            "user_id",
            "day_no",
            F.explode(wins).alias("window_days"),
        )
        .select(
            "user_id",
            "window_days",
            F.explode(
                F.sequence(F.col("day_no"), F.col("day_no") + F.col("window_days") - 1)
            ).alias("day_no"),
        )
    )
    return (
        offs.join(days, "day_no", "semi")
        .groupBy("day_no", "window_days")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )


def schema_drift_daily(turns: DataFrame) -> DataFrame:
    """Day-over-day KV-key churn in the raw transcript text: for each
    observed day, the distinct ``key=`` tokens seen, how many are NEW
    (absent from the previous OBSERVED day) and how many of the previous
    day's keys are GONE. The first observed day has no baseline: n_new
    equals n_keys and n_gone is 0.

    Returns (day_no, n_keys, n_new, n_gone).

    Scale shape: the regexp key extraction is row-local; volume
    collapses to distinct (day, key) — bounded by days × key vocabulary
    — and the day-over-day comparison is two self-joins on that bounded
    set via each day's lag-observed predecessor."""
    dk = (
        turns.select(
            _day().alias("day_no"),
            F.explode(
                F.expr(r"regexp_extract_all(text, '([A-Za-z_][A-Za-z0-9_]*)=', 1)")
            ).alias("key"),
        )
        .distinct()
    )
    days = dk.select("day_no").distinct()
    prev = days.select(
        "day_no",
        F.lag("day_no").over(Window.orderBy("day_no")).alias("prev_day"),
    )
    cur = dk.join(prev, "day_no")
    prev_keys = dk.select(
        F.col("day_no").alias("prev_day"), F.col("key")
    )
    flagged = cur.join(prev_keys, ["prev_day", "key"], "left_anti").groupBy(
        "day_no"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    gone = (
        prev_keys.join(prev.filter(F.col("prev_day").isNotNull()), "prev_day")
        .join(dk, ["day_no", "key"], "left_anti")
        .groupBy("day_no")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gone"))
    )
    totals = dk.groupBy("day_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    return (
        totals.join(flagged, "day_no", "left")
        .join(gone, "day_no", "left")
        .select(
            "day_no",
            "n_keys",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("n_gone", F.lit(0)).cast("bigint").alias("n_gone"),
        )
    )


def hourly_seasonality(events: DataFrame) -> DataFrame:
    """Hour-of-day load shape per event type: count per (event_type,
    hour 0–23), the hour's share of the type's volume in floor basis
    points, and a hot-hour flag for hours carrying more than 2× the
    uniform share (share_bp with integer math: n*24 > 2*total). The
    measured basis for diurnal autoscaling and for scheduling compaction
    into cold hours.

    Returns (event_type, hour, n, share_bp, is_hot).

    Scale shape: one map-side-combined rollup to the 24 × type-
    vocabulary grid; the share window runs over that bounded grid."""
    grid = events.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type")
    total = F.sum("n").over(w)
    return grid.select(
        "event_type",
        "hour",
        "n",
        total.alias("_den"),
    ).select(
        "event_type",
        "hour",
        "n",
        F.expr("(n * 10000) div _den").cast("bigint").alias("share_bp"),
        F.expr("cast(n * 24 > 2 * _den AS INT)").alias("is_hot"),
    )


def activity_concentration(events: DataFrame) -> DataFrame:
    """Heavy-user concentration by power-of-two activity bucket: users
    are bucketed by bit-length of their event count (bucket b holds
    users with counts in [2^(b−1), 2^b)); per bucket report users,
    events, and the cumulative event share from the heaviest bucket
    down in floor basis points. The skew dossier that justifies salting
    a user-keyed join — if the top bucket carries most of the volume,
    the natural key is hot.

    Returns (bucket_bits, n_users, n_events, cum_events, cum_share_bp).

    Scale shape: one rollup on the natural user key, a second to the
    ~log2(max_count) bucket set; the cumulative window orders ONLY that
    bounded bucket set — never a global sort of users."""
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    buckets = per_user.groupBy(
        F.length(F.expr("bin(cnt)")).cast("int").alias("bucket_bits")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cnt").cast("bigint").alias("n_events"),
    )
    w = Window.orderBy(F.col("bucket_bits").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return buckets.select(
        "bucket_bits",
        "n_users",
        "n_events",
        F.sum("n_events").over(w).cast("bigint").alias("cum_events"),
        F.sum("n_events").over(total).alias("_den"),
    ).select(
        "bucket_bits",
        "n_users",
        "n_events",
        "cum_events",
        F.expr("(cum_events * 10000) div _den").cast("bigint").alias("cum_share_bp"),
    )


def conversion_latency_hist(
    events: DataFrame,
    from_type: str = "signup",
    to_type: str = "purchase",
) -> DataFrame:
    """Conversion-latency histogram: for each user with a `from_type`
    event, the gap from their FIRST such event to their first
    `to_type` event at-or-after it, bucketed by power-of-two seconds
    (bit length of the gap; gap 0 lands in bucket 1). Users who never
    convert are counted in bucket −1, not dropped.

    Returns (gap_bucket_bits, n_users, min_gap_s, max_gap_s).

    Scale shape: both sides collapse to per-user firsts before the
    join (user-cardinality, not event-cardinality); one join on the
    natural user key; the rollup is bounded by ~64 buckets."""
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    first_from = (
        events.filter(F.col("event_type") == from_type)
        .select("user_id", ep.alias("_ep"))
        .groupBy("user_id")
        .agg(F.min("_ep").alias("s_ep"))
    )
    to_ev = events.filter(F.col("event_type") == to_type).select(
        "user_id", ep.alias("p_ep")
    )
    per_user = (
        first_from.join(to_ev, "user_id", "left")
        .groupBy("user_id", "s_ep")
        .agg(
            F.min(
                F.when(F.col("p_ep") >= F.col("s_ep"), F.col("p_ep"))
            ).alias("c_ep")
        )
    )
    gap = F.col("c_ep") - F.col("s_ep")
    bucket = (
        F.when(F.col("c_ep").isNull(), F.lit(-1))
        .otherwise(F.length(F.expr("bin(c_ep - s_ep)")))
        .cast("int")
    )
    return (
        per_user.select(bucket.alias("gap_bucket_bits"), gap.alias("gap"))
        .groupBy("gap_bucket_bits")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("gap").cast("bigint").alias("min_gap_s"),
            F.max("gap").cast("bigint").alias("max_gap_s"),
        )
    )


def survival_table(events: DataFrame) -> DataFrame:
    """Kaplan-Meier-style survival table over user lifetimes: a user's
    lifespan is last-active-day − first-active-day (in days); for each
    observed lifespan value k report how many users churned exactly at
    k (n_churned), how many were still at risk entering k (n_at_risk =
    users with lifespan ≥ k), and the discrete hazard in floor basis
    points (n_churned / n_at_risk). Integer counts only — the actuarial
    curve downstream dashboards draw.

    Returns (day_offset, n_churned, n_at_risk, hazard_bp).

    Scale shape: events collapse to per-user (min, max) day on the
    natural user key; lifespans roll up to one row per observed value
    (bounded by calendar span) and the at-risk cumulative runs over
    that bounded set (sum of churned at ≥ k, via a desc window)."""
    life = (
        events.select(F.col("user_id"), _day().alias("day_no"))
        .groupBy("user_id")
        .agg((F.max("day_no") - F.min("day_no")).alias("day_offset"))
    )
    churn = life.groupBy("day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_churned")
    )
    w = Window.orderBy(F.col("day_offset").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return churn.select(
        "day_offset",
        "n_churned",
        F.sum("n_churned").over(w).cast("bigint").alias("n_at_risk"),
    ).select(
        "day_offset",
        "n_churned",
        "n_at_risk",
        F.expr("(n_churned * 10000) div n_at_risk").cast("bigint").alias("hazard_bp"),
    )


def dormancy_reactivation(events: DataFrame, dormant_days: int = 7) -> DataFrame:
    """Win-back audit: per observed day, how many of the day's active
    users were REACTIVATED — returning after at least `dormant_days`
    of inactivity (gap from their previous active day > dormant_days)
    — vs merely retained, with the reactivated share in floor basis
    points. First-ever-seen users are new, counted in n_active but in
    neither reactivated nor the gap ≤ threshold group.

    Returns (day_no, n_active, n_new, n_reactivated, reactivated_bp).

    Scale shape: one distinct over (user, day), one lag window on the
    natural user key, one rollup bounded by calendar days."""
    if dormant_days < 1:
        raise ValueError(f"need dormant_days >= 1, got {dormant_days}")
    ud = events.select(F.col("user_id"), _day().alias("day_no")).distinct()
    w = Window.partitionBy("user_id").orderBy("day_no")
    gaps = ud.select(
        "day_no",
        (F.col("day_no") - F.lag("day_no").over(w)).alias("gap"),
    )
    return (
        gaps.groupBy("day_no")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.isnull("gap").cast("int")).cast("bigint").alias("n_new"),
            F.sum(
                F.when(F.col("gap") > dormant_days, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_reactivated"),
        )
        .select(
            "day_no",
            "n_active",
            "n_new",
            "n_reactivated",
            F.expr("(n_reactivated * 10000) div n_active")
            .cast("bigint")
            .alias("reactivated_bp"),
        )
    )


def dwell_time_by_state(events: DataFrame) -> DataFrame:
    """Time-in-state profile: the gap from each event to the user's
    NEXT event is dwell time attributed to the current event's type
    (how long users sit on an error vs after a purchase). Each user's
    final event has no successor and is excluded by construction
    (unbounded dwell is a presentation choice, not a measurement).

    Returns (event_type, n_intervals, total_dwell_s, mean_dwell_s,
    max_dwell_s) with floor means.

    Scale shape: one lead window on the natural user key, one
    map-side-combined rollup to the type vocabulary."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    g = (
        events.select("user_id", "ts", "event_id", "event_type", ep.alias("_ep"))
        .select(
            "event_type",
            (F.lead("_ep").over(w) - F.col("_ep")).alias("dwell"),
        )
        .filter(F.col("dwell").isNotNull())
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dwell").cast("bigint").alias("total_dwell_s"),
        F.floor(F.sum("dwell") / F.count(F.lit(1))).cast("bigint").alias("mean_dwell_s"),
        F.max("dwell").cast("bigint").alias("max_dwell_s"),
    )


def bounce_rate_daily(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Daily bounce rate: sessions split on > gap_s inactivity per user
    (same rule as sessionize_gaps / session_event_trigrams); a bounce
    is a single-event session; each session counts on the day of its
    FIRST event. The classic engagement-health metric.

    Returns (day_no, n_sessions, n_bounces, bounce_bp).

    Scale shape: the split flag, session id and per-session rollup all
    ride ONE user-key exchange; the daily rollup is calendar-bounded."""
    if gap_s < 1:
        raise ValueError(f"need gap_s >= 1, got {gap_s}")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select(
        "user_id", "ts", "event_id", ep.alias("_ep"), _day().alias("day_no")
    ).withColumn(
        "_new",
        F.coalesce(
            F.col("_ep") - F.lag("_ep").over(wo) > gap_s, F.lit(True)
        ).cast("int"),
    ).withColumn(
        "_sess", F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = base.groupBy("user_id", "_sess").agg(
        F.count(F.lit(1)).alias("_n_ev"), F.min("day_no").alias("day_no")
    )
    return (
        per.groupBy("day_no")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum((F.col("_n_ev") == 1).cast("int")).cast("bigint").alias("n_bounces"),
        )
        .select(
            "day_no",
            "n_sessions",
            "n_bounces",
            F.expr("(n_bounces * 10000) div n_sessions")
            .cast("bigint")
            .alias("bounce_bp"),
        )
    )


def linear_attribution(
    events: DataFrame, lookback_s: int = 86400
) -> DataFrame:
    """Linear multi-touch attribution: every non-purchase touch within
    `lookback_s` before a purchase shares that purchase's 10000 bp
    equally (floor division); purchases with no touch in the window
    credit the synthetic 'none' channel — counted, not dropped. The
    multi-touch companion to `aggregate.purchase_attribution`
    (last-touch).

    Returns (touch_type, n_credits, total_credit_bp).

    Scale shape: purchases and touches join on the natural user key
    with a bounded time-range predicate (per-user 24 h density bounds
    the blow-up); the per-purchase touch count and the final rollup are
    map-side-combined aggregates on purchase id / type vocabulary."""
    if lookback_s < 1:
        raise ValueError(f"need lookback_s >= 1, got {lookback_s}")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), ep.alias("p_ep")
    )
    t = events.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("touch_type"), ep.alias("t_ep")
    )
    j = p.join(t, "user_id").filter(
        (F.col("t_ep") >= F.col("p_ep") - lookback_s)
        & (F.col("t_ep") < F.col("p_ep"))
    )
    per = j.groupBy("pid").agg(F.count(F.lit(1)).alias("n_touch"))
    credited = j.join(per, "pid").select(
        "touch_type", F.expr("10000 div n_touch").alias("credit_bp")
    )
    orphans = (
        p.join(j.select("pid").distinct(), "pid", "left_anti")
        .select(
            F.lit("none").alias("touch_type"),
            F.lit(10000).cast("bigint").alias("credit_bp"),
        )
    )
    return (
        credited.unionByName(orphans)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum("credit_bp").cast("bigint").alias("total_credit_bp"),
        )
    )


def bot_ring_detection(events: DataFrame, min_users: int = 2) -> DataFrame:
    """Bot-ring screen: users whose ENTIRE behavioral sequence — event
    types in (ts, event_id) order plus the power-of-two bucket of each
    inter-event gap — is byte-identical are almost certainly scripted
    (organic users never replay both the order and the timing shape).
    Each user collapses to one md5 sequence fingerprint; fingerprints
    shared by >= min_users form a ring.

    Returns (seq_fp, n_users, n_events) — n_events is per member (all
    members share it by construction).

    Scale shape: one user-key window (gap buckets) + one ordered
    aggregation per user — the exchange carries (user, type, bucket)
    triples once; rings roll up on the 32-byte digest."""
    from pyspark.sql import Window as W

    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_bucket = F.coalesce(
        F.length(F.expr("bin(_gap)")).cast("string"), F.lit("s")
    )
    steps = (
        events.select(
            "user_id", "ts", "event_id", "event_type", ep.alias("_ep")
        )
        .withColumn("_gap", F.col("_ep") - F.lag("_ep").over(w))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.concat_ws(":", "event_type", gap_bucket).alias("_step"),
        )
    )
    per_user = steps.groupBy("user_id").agg(
        F.md5(
            F.concat_ws(
                "\x1f",
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "_step"))
                ).getField("_step"),
            )
        ).alias("seq_fp"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        per_user.groupBy("seq_fp", "n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .filter(F.col("n_users") >= min_users)
        .select("seq_fp", "n_users", "n_events")
    )


def growth_report(events: DataFrame, dormant_days: int = 7, gap_s: int = 1800) -> DataFrame:
    """Flagship growth composition: one row per observed day joining the
    engagement dossiers — actives/new/reactivated (dormancy win-back)
    with sessions/bounces (bounce rate). The daily health report a
    growth team reads, assembled from already-verified operators with
    one calendar-bounded join.

    Returns (day_no, n_active, n_new, n_reactivated, reactivated_bp,
    n_sessions, n_bounces, bounce_bp).

    Scale shape: both inputs are calendar-bounded aggregates; the full
    outer join on day_no moves only those."""
    d = dormancy_reactivation(events, dormant_days=dormant_days)
    b = bounce_rate_daily(events, gap_s=gap_s)
    return (
        d.join(b, "day_no", "full_outer")
        .select(
            "day_no",
            F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("n_reactivated", F.lit(0)).cast("bigint").alias("n_reactivated"),
            F.coalesce("reactivated_bp", F.lit(0)).cast("bigint").alias("reactivated_bp"),
            F.coalesce("n_sessions", F.lit(0)).cast("bigint").alias("n_sessions"),
            F.coalesce("n_bounces", F.lit(0)).cast("bigint").alias("n_bounces"),
            F.coalesce("bounce_bp", F.lit(0)).cast("bigint").alias("bounce_bp"),
        )
    )


def cuped_adjusted_lift(events: DataFrame) -> DataFrame:
    """A/B lift with CUPED variance reduction (Deng, Xu, Kohavi, Walker,
    WSDM 2013): treatment = parity of the seeded portable user hash,
    metric Y = per-user value cents in the SECOND half of the day range,
    covariate X = the same user's FIRST-half cents (0 when absent — the
    standard fill), theta = cov(X,Y)/var(X) pooled over both arms, and
    the adjusted metric Y - theta*X removes the pre-period component of
    the variance.

    Everything is integer-exact: cents via floor(value*100), moments as
    DECIMAL sums, theta in micro-units via sign-split truncating
    division (sign(c) * (|c|*1e6 div v) — both engines truncate the
    NON-NEGATIVE magnitude, so floor-vs-trunc divergence on negatives
    cannot occur; the same guard everywhere below). Returns ONE row:
    (n_t, n_c, theta_micro, diff_raw_micro, diff_cuped_micro,
    var_reduction_bp) — mean lifts in micro-cents, var_reduction_bp =
    the squared X,Y correlation in basis points (the fraction of metric
    variance CUPED removes), computed as a two-step truncating ratio
    (deterministic in both engines; at 10^12-row scale rescale cents
    before squaring — cov^2 alone can exceed 38 digits).

    Scale shape: one groupBy on the user key builds (user, arm, x, y);
    the pooled moments are a 1-row aggregate and the per-arm totals a
    2-row aggregate of that same frame — the adjustment distributes over
    sums (sum(Y - theta*X) = sum(Y) - theta*sum(X)), so no second pass
    over users is ever needed."""
    from ..hashing import portable_hash

    day = F.datediff(F.to_date(F.col("ts")), F.lit("1970-01-01")).cast("bigint")
    base = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            day.alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    env = base.agg(
        F.expr("(min(d) + max(d) + 1) DIV 2").cast("bigint").alias("mid")
    )
    per_user = (
        base.crossJoin(F.broadcast(env))
        .groupBy("u")
        .agg(
            F.sum(F.when(F.col("d") < F.col("mid"), F.col("cents")).otherwise(0))
            .cast("decimal(19,0)")
            .alias("x"),
            F.sum(F.when(F.col("d") < F.col("mid"), 0).otherwise(F.col("cents")))
            .cast("decimal(19,0)")
            .alias("y"),
        )
        .withColumn("arm", F.pmod(portable_hash(F.col("u").cast("string")), F.lit(2)))
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("covn"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("varx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("vary"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n_arm"),
        F.sum("x").alias("sx_arm"),
        F.sum("y").alias("sy_arm"),
    )
    # sign-split truncating division: both engines truncate the
    # non-negative magnitude
    sdiv = (
        lambda num, den: F.when(F.col(den) == 0, F.lit(0).cast("bigint")).otherwise(
            F.signum(F.col(num)).cast("bigint")
            * F.expr(f"CAST(abs({num}) DIV {den} AS BIGINT)")
        )
    )
    wide = arms.groupBy().pivot("arm", [0, 1]).agg(
        F.first("n_arm").alias("n"),
        F.first("sx_arm").alias("sx"),
        F.first("sy_arm").alias("sy"),
    )
    # an empty hash-parity arm pivots to NULL columns, and NULL nn would
    # slip past sdiv's den == 0 guard (NULL == 0 → NULL → otherwise
    # branch) into NULL output rows where the oracle emits zeros —
    # coalesce every per-arm column to 0 so both engines agree on
    # degenerate inputs
    for _c in ["0_n", "1_n", "0_sx", "1_sx", "0_sy", "1_sy"]:
        wide = wide.withColumn(_c, F.coalesce(F.col(f"`{_c}`"), F.lit(0)))
    wide = (
        wide.crossJoin(F.broadcast(mom))
        .withColumn("theta_num", F.col("covn") * 1000000)
        .withColumn("theta_micro", sdiv("theta_num", "varx"))
        # mean raw lift numerator: (sy_t*n_c - sy_c*n_t) * 1e6
        .withColumn(
            "raw_num",
            (F.col("1_sy") * F.col("0_n") - F.col("0_sy") * F.col("1_n"))
            * 1000000,
        )
        .withColumn("nn", F.col("1_n") * F.col("0_n"))
        .withColumn("diff_raw_micro", sdiv("raw_num", "nn"))
        # adjusted totals distribute: sum(y*1e6 - theta*x) per arm
        .withColumn(
            "adj_t", F.col("1_sy") * 1000000 - F.col("theta_micro") * F.col("1_sx")
        )
        .withColumn(
            "adj_c", F.col("0_sy") * 1000000 - F.col("theta_micro") * F.col("0_sx")
        )
        .withColumn(
            "cuped_num",
            F.col("adj_t") * F.col("0_n") - F.col("adj_c") * F.col("1_n"),
        )
        .withColumn("diff_cuped_micro", sdiv("cuped_num", "nn"))
        # r^2 in bp, two-step truncating ratio (see docstring)
        .withColumn("c10k", F.col("covn") * 10000)
        .withColumn("step1", sdiv("c10k", "varx"))
        .withColumn("r2_num", F.col("step1") * F.col("covn"))
        .withColumn("var_reduction_bp", sdiv("r2_num", "vary"))
    )
    return wide.select(
        F.col("1_n").cast("bigint").alias("n_t"),
        F.col("0_n").cast("bigint").alias("n_c"),
        "theta_micro",
        "diff_raw_micro",
        "diff_cuped_micro",
        "var_reduction_bp",
    )


#: Poisson(1) inverse-CDF thresholds at 2^30 fixed point (k = 0..8; the
#: 2^-30-scale tail folds onto weight 9). The SAME literals appear in the
#: DuckDB oracle — both engines compare the identical integers.
POISSON1_THR = [
    395007542,
    790015084,
    987518855,
    1053353445,
    1069812093,
    1073103822,
    1073652444,
    1073730819,
    1073740615,
]


def poisson1_weight_sql(h_expr: str) -> str:
    """SQL CASE text mapping a uniform [0, 2^30) integer to a Poisson(1)
    draw by inverse CDF — dialect-neutral (shared by the Spark expr and
    the DuckDB oracle)."""
    whens = " ".join(
        f"WHEN ({h_expr}) < {t} THEN {k}" for k, t in enumerate(POISSON1_THR)
    )
    return f"CASE {whens} ELSE 9 END"


def ab_bootstrap_ci(events: DataFrame, n_reps: int = 32) -> DataFrame:
    """Per-arm Poisson-bootstrap confidence interval for mean user value
    — THE distributed bootstrap (each user draws an independent
    Poisson(1) replication weight per replica, so no replica ever needs
    a global resample; Chamandy et al., 'Estimating Uncertainty for
    Massive Data Streams', Google 2012). Arms are the same hash-parity
    split as cuped_adjusted_lift; weights come from the seeded portable
    hash of (user, replica) by inverse CDF over 2^30 fixed-point
    thresholds (POISSON1_THR) — pure integers, reproducible, verifiable.

    Returns one row per arm: (arm, n_users, mean_cents, lo05_cents,
    hi95_cents) — the point mean and the 5th/95th percentile-disc of the
    n_reps replica means (rank ceil(p*B), the _target_rank rule).

    Scale shape: users collapse to (user, arm, cents) on one key
    exchange; the replica explode (x n_reps) is row-local on that
    user-sized frame and map-side combines into 2*n_reps (arm, rep)
    cells before its shuffle — the exchange carries cells, not users;
    percentiles run over the n_reps-row per-arm frame."""
    from ..hashing import portable_hash

    if n_reps < 2:
        raise ValueError(f"need n_reps >= 2, got {n_reps}")
    per_user = (
        events.filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.col("user_id").alias("u"))
        .agg(
            F.sum(F.floor(F.col("value") * 100)).cast("decimal(19,0)").alias("y")
        )
        .withColumn("arm", F.pmod(portable_hash(F.col("u").cast("string")), F.lit(2)))
    )
    reps = per_user.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1)))
    ).withColumn(
        "h",
        F.pmod(
            portable_hash(F.concat_ws("|", F.col("u"), F.col("b")), seed=7),
            F.lit(1 << 30),
        ),
    ).withColumn("w", F.expr(poisson1_weight_sql("h")).cast("decimal(19,0)"))
    cells = reps.groupBy("arm", "b").agg(
        F.sum(F.col("w") * F.col("y")).alias("sw"),
        F.sum("w").alias("ww"),
    )
    rmeans = cells.select(
        "arm",
        F.when(F.col("ww") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.signum(F.col("sw")).cast("bigint")
            * F.expr("CAST(abs(sw) DIV ww AS BIGINT)")
        )
        .alias("rmean"),
    )
    w_rank = Window.partitionBy("arm").orderBy("rmean")
    lo_rank = -(-5 * n_reps // 100) or 1  # ceil(0.05*B), min 1
    hi_rank = -(-95 * n_reps // 100)
    pct = (
        rmeans.withColumn("rn", F.row_number().over(w_rank))
        .groupBy("arm")
        .agg(
            F.max(F.when(F.col("rn") == lo_rank, F.col("rmean"))).alias("lo05_cents"),
            F.max(F.when(F.col("rn") == hi_rank, F.col("rmean"))).alias("hi95_cents"),
        )
    )
    point = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").alias("sy"),
    ).select(
        "arm",
        "n_users",
        F.when(F.col("n_users") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.signum(F.col("sy")).cast("bigint")
            * F.expr("CAST(abs(sy) DIV n_users AS BIGINT)")
        )
        .alias("mean_cents"),
    )
    return point.join(pct, "arm").select(
        F.col("arm").cast("bigint").alias("arm"),
        "n_users",
        "mean_cents",
        "lo05_cents",
        "hi95_cents",
    )
