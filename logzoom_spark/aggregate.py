"""Per-sink aggregates: time-bucket counts, distinct-source TTL, metrics.

The reference's only aggregations are streaming counters (SURVEY.md §2.1
#12-#14): a 1-second sliding rate per sink (ratecounter,
elasticsearch.go:180-183), a per-output-file event count (s3.go:57-60), and
a distinct-source map with 600 s TTL eviction (websocket.go:111-138). The
graft generalizes them to `groupBy(key, window(ts, bucket)).count()` per
sink — Catalyst gives partial (map-side) + final hash aggregation for free,
so the shuffle carries only (key, bucket, partial_count) rows, not turns.

Window starts are emitted as epoch-second BIGINTs (floor(epoch/b)*b): this
is identical arithmetic in Spark and DuckDB, independent of session
timezone, and hash-stable for the oracle compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts_col: str = "ts", seconds: int = 300) -> Column:
    """Tumbling-bucket start as epoch seconds (bigint). Equivalent to
    `window(ts, f"{seconds} seconds").start` under a UTC session but
    cross-engine comparable."""
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    return (F.floor(epoch / seconds) * seconds).cast("bigint")


def window_counts(
    df: DataFrame, key: str | list[str], bucket_seconds: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """groupBy(key, time bucket).count() — the per-sink rate aggregate
    (reference analog: ratecounter per sink, elasticsearch.go:180-183,
    generalized from 1 s sliding to tumbling event-time buckets)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.withColumn("window_start", time_bucket(ts_col, bucket_seconds))
        .groupBy(*keys, "window_start")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def window_counts_multi(
    df: DataFrame,
    keys: list[str],
    bucket_seconds: int = 300,
    ts_col: str = "ts",
    persist: bool = True,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """All per-sink aggregates in ONE shuffle via GROUPING SETS.

    `groupBy` per key would shuffle the branch once per key (3× for
    role/tool/conv_id). GROUPING SETS computes every (key, bucket) set in a
    single partial+final hash aggregation — one shuffle whose rows are the
    union of the group keys. Returns (persisted combined frame, per-key
    slices filtered by grouping_id); caller unpersists the combined frame."""
    with_bucket = df.withColumn("window_start", time_bucket(ts_col, bucket_seconds))
    sets = [[k, "window_start"] for k in keys]
    combined = with_bucket.groupingSets(
        sets, *[F.col(k) for k in keys], F.col("window_start")
    ).agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("_gid"))
    if persist:
        combined = combined.persist()
    # grouping_id bit i (MSB-first over groupBy cols) is 0 iff that column
    # is part of the grouping set
    n = len(keys) + 1  # + window_start
    out: dict[str, DataFrame] = {}
    for i, k in enumerate(keys):
        gid = 0
        for j in range(len(keys)):
            if j != i:
                gid |= 1 << (n - 1 - j)
        out[k] = combined.filter(F.col("_gid") == gid).select(k, "window_start", "cnt")
    return combined, out


def conv_counts(df: DataFrame) -> DataFrame:
    """Per-conversation delivered-row count (reference analog: per-S3-file
    FileInfo.Count, s3.go:57-60 — the unit of lineage accounting)."""
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("turn_idx").alias("max_turn_idx"),
    )


def distinct_sources_ttl(
    df: DataFrame, ttl_seconds: int = 600, ts_col: str = "ts"
) -> DataFrame:
    """Distinct sources seen within `ttl` of the stream's high-water mark.

    Rebuilds the WebSocket index page's `map[source]→last_seen` with 600 s
    eviction (websocket.go:111-138) as an aggregate: last_seen per source,
    kept iff within TTL of max(ts) overall. The high-water mark is a 1-row
    broadcast join, not a collect."""
    hwm = df.select(F.max(F.col(ts_col).cast("timestamp")).alias("_hwm"))
    per_source = df.groupBy("source").agg(
        F.max(F.col(ts_col).cast("timestamp")).alias("last_seen_ts")
    )
    return (
        per_source.join(F.broadcast(hwm))
        .filter(
            F.unix_timestamp("last_seen_ts") >= F.unix_timestamp("_hwm") - F.lit(ttl_seconds)
        )
        .select(
            "source", F.unix_timestamp("last_seen_ts").cast("bigint").alias("last_seen")
        )
    )


def sink_partition_metrics(df: DataFrame, sink: str) -> DataFrame:
    """Physical per-partition row counts for the lineage/metrics table
    (north rule). Uses spark_partition_id — run-dependent, so this feeds
    the metrics sink, never an oracle-compared result."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .withColumn("sink", F.lit(sink))
    )


def conv_rollup(turns: DataFrame) -> DataFrame:
    """Two-level rollup: per-conversation stats (level 1) re-aggregated into
    a per-size distribution (level 2) — the hypertable-rollup shape (raw →
    hourly → daily) on the conversation axis. At scale level 1 is the only
    shuffle that sees per-turn rows; level 2 runs over one row per
    conversation (100 TB of turns → ~10^8 conv rows → trivially cheap)."""
    conv = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.countDistinct("tool").alias("n_tools"),
        (
            F.unix_timestamp(F.max(F.col("ts").cast("timestamp")))
            - F.unix_timestamp(F.min(F.col("ts").cast("timestamp")))
        ).cast("bigint").alias("span_sec"),
    )
    return (
        conv.groupBy("n_turns")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_roles").alias("sum_roles"),
            F.sum("n_tools").alias("sum_tools"),
            F.max("span_sec").alias("max_span_sec"),
        )
    )


def salted_counts(
    df: DataFrame, key: str, salt: int = 16, salt_src: str = "turn_idx"
) -> DataFrame:
    """Two-stage salted aggregation for skewed keys (north rule: skew
    handled explicitly). Stage 1 aggregates on (key, salt bucket) — a hot
    key's rows spread over `salt` reducers instead of one straggler; stage
    2 merges the per-salt partials (≤ salt rows per key — trivial).
    Result is provably identical to the direct groupBy (oracle-verified);
    use when a key's row count is orders of magnitude above the median and
    AQE's skew handling isn't available (e.g. pre-3.0 clusters or
    non-join aggregations over raw rows)."""
    stage1 = (
        df.groupBy(key, F.pmod(F.col(salt_src), F.lit(salt)).alias("_salt"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return stage1.groupBy(key).agg(F.sum("_cnt").alias("cnt"))


def json_field_stats(
    events: DataFrame,
    field: str = "k",
    group_col: str = "event_type",
    json_col: str = "props",
) -> DataFrame:
    """Per-group stats of one integer field inside a JSON props column —
    the schema-on-read aggregation every telemetry pipeline runs before
    promoting a JSON field to a real column: (group, n_events, n_with_field,
    sum_v, min_v, max_v, n_distinct_v). Field extraction is
    `get_json_object` (JVM JsonPath, codegen) — malformed JSON or a
    missing key yields NULL: counted in n_events, absent from the field
    stats (the counted-not-dropped rule).

    Scale shape: extraction is row-local; the aggregate is one map-side-
    combined groupBy on the (bounded) group key. distinct-count is exact
    (per-group value sets are bounded here); swap in the KMV/HLL sketch
    ops for unbounded-cardinality fields."""
    v = F.get_json_object(F.col(json_col), f"$.{field}").cast("bigint")
    return (
        events.select(F.col(group_col).alias("grp"), v.alias("_v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_v").alias("n_with_field"),
            F.sum("_v").alias("sum_v"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
            F.countDistinct("_v").alias("n_distinct_v"),
        )
    )


def rate_anomaly_mad(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    threshold_x100: int = 300,
) -> DataFrame:
    """Robust rate-anomaly flags over the per-minute event-rate series —
    the alerting step on top of `window_counts` (reference: LogZoom's
    rate aggregate is the monitoring primitive; this is what a consumer
    does with it): per event type, the minute buckets whose count
    deviates from the type's MEDIAN by more than (threshold_x100/100) ×
    MAD are anomalies. Median and MAD use percentile-disc semantics
    (smallest value whose rank reaches ceil(n/2)) — integer-exact and
    engine-identical, no float quantiles. MAD=0 series (constant rate)
    flag any deviation.

    Returns (event_type, minute, cnt, med, mad, is_anomaly) — every
    bucket, counted not dropped.

    Scale shape: the raw stream collapses to (type, minute) partial
    counts map-side — the only corpus-sized exchange carries one row per
    bucket; both disc-percentile windows run over the bucket series
    (bounded: minutes × types), and the verdict is row-local."""
    from pyspark.sql import Window

    buckets = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("minute", F.col(ts_col)).alias("minute"),
        )
        .groupBy("event_type", "minute")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("event_type")

    def disc_median(df, val, out):
        w_rn = wt.orderBy(F.col(val).asc(), F.col("minute").asc())
        ranked = df.withColumn("_rn", F.row_number().over(w_rn)).withColumn(
            "_n", F.count(F.lit(1)).over(wt)
        )
        med = ranked.filter(
            F.col("_rn") == F.expr("(_n + 1) div 2")
        ).select("event_type", F.col(val).alias(out))
        return df.join(med, "event_type")

    with_med = disc_median(buckets, "cnt", "med")
    dev = with_med.withColumn("_dev", F.abs(F.col("cnt") - F.col("med")))
    with_mad = disc_median(dev, "_dev", "mad")
    return with_mad.select(
        "event_type",
        "minute",
        "cnt",
        "med",
        "mad",
        (
            F.col("_dev") * 100 > F.lit(threshold_x100) * F.greatest("mad", F.lit(1))
        ).cast("int").alias("is_anomaly"),
    )


def conv_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation structural statistics — the transcript-corpus
    profiling pass run before filtering/packing: turn count, distinct
    roles, alternation breaks (a turn whose role equals the previous
    turn's role in turn_idx order — double-sends / merged messages),
    total and floored-mean turn length. One shuffle on conv_id (the
    table's native key); the lag window and the aggregate share it."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("bigint").alias("_len"),
    ).withColumn("_prev_role", F.lag("role").over(w))
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum(
            (F.col("role").eqNullSafe(F.col("_prev_role"))).cast("int")
        ).cast("bigint").alias("n_breaks"),
        F.sum("_len").alias("total_chars"),
        F.expr("sum(_len) div count(1)").cast("bigint").alias("mean_turn_chars"),
    )


def cohort_retention(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Classic cohort-retention matrix over the event stream — the
    engagement report every telemetry consumer builds on top of the
    reference's rate counters: users are bucketed by their FIRST active
    day (the cohort), and each (cohort_day, day_offset) cell counts the
    distinct users of that cohort still active `offset` days later.
    offset 0 is the cohort size itself, so retention fractions are
    ratios of integer cells — no floats anywhere.

    Returns (cohort_day, offset_d, n_users) — cohort_day as the
    day-start epoch-second BIGINT (house rule: no DATE/TIMESTAMP in
    oracle-compared output).

    Scale shape: the stream first collapses to distinct (user, day) —
    map-side partial distinct, one shuffle keyed on user_id; the
    first-day aggregate and the join back both reuse that same user_id
    partitioning (no second corpus shuffle); the final matrix aggregate
    is bounded (days × offsets cells)."""
    ud = (
        events.select(
            F.col("user_id"),
            F.unix_timestamp(F.date_trunc("day", F.col(ts_col)))
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    first = ud.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ud.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr("(d - cohort_day) div 86400").cast("bigint").alias("offset_d"),
        )
        .groupBy("cohort_day", "offset_d")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def decayed_activity(
    events: DataFrame,
    ts_col: str = "ts",
    halflife_min: int = 1440,
    scale: int = 10000,
) -> DataFrame:
    """Half-life-decayed activity score per user — the recency-weighted
    engagement metric (exponential decay, the standard 'hotness' rank):
    an event `h` whole half-lives before the corpus max timestamp
    contributes `scale >> h` points. Pure integer arithmetic (seconds
    div, shift) — bit-identical across engines, no float pow/exp.

    Returns (user_id, n_events, score).

    Scale shape: the 1-row max-timestamp aggregate joins in BROADCAST;
    the per-event weight is row-local codegen; the score is one
    map-side-combined groupBy on user_id. In an incremental pipeline
    the score re-ages by a constant shift per period, so the standing
    table updates without rescanning history."""
    ref = events.agg(F.max(F.unix_timestamp(F.col(ts_col))).alias("_ref"))
    w = F.expr(
        f"{int(scale)}L div shiftleft(1L, cast(least("
        f"(_ref - unix_timestamp({ts_col})) div {60 * int(halflife_min)}, 62) as int))"
    )
    return (
        events.join(F.broadcast(ref))
        .select("user_id", w.cast("bigint").alias("_w"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_w").alias("score"),
        )
    )


def session_path_trigrams(
    events: DataFrame,
    gap_min: int = 30,
    top_n: int = 50,
) -> DataFrame:
    """Top-N event-type trigrams along within-session user paths — the
    sequence-mining pass behind funnel discovery: sessions split on a
    >gap_min silence per user (same sessionize rule as the transcript
    sessionizer), the path is the session's event types in (ts,
    event_id) order, and every length-3 window of the path is counted
    corpus-wide.

    Returns (e1, e2, e3, cnt) — top_n by (cnt desc, e1, e2, e3).

    Scale shape: ONE shuffle on user_id serves the session-boundary lag
    window, the cumulative session counter, and the per-session
    collect; path assembly uses sort_array(collect_list(struct)) so the
    order is deterministic whatever the shuffle delivered; trigram
    expansion is row-local; the count aggregate is map-side combined on
    the (bounded: |types|³) trigram key and the final top-N is
    orderBy+limit = TakeOrdered, never a global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "_new",
            F.when(gap.isNull() | (gap > 60 * int(gap_min)), 1).otherwise(0),
        )
        .withColumn("_sess", F.sum("_new").over(w))
    )
    paths = sess.groupBy("user_id", "_sess").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("_path")
    )
    p = F.col("_path")
    idx = F.when(
        F.size(p) >= 3, F.sequence(F.lit(1), F.size(p) - 2)
    ).otherwise(F.expr("array()").cast("array<int>"))
    tri = paths.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(p, i).alias("e1"),
                    F.element_at(p, i + 1).alias("e2"),
                    F.element_at(p, i + 2).alias("e3"),
                ),
            )
        ).alias("t")
    ).select("t.e1", "t.e2", "t.e3")
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(top_n)
    )


def audience_overlap(events: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Audience-overlap matrix between event types — 'how many users who
    do X also do Y', the cross-sink counterpart of the reference's
    distinct-sources counter (websocket.go:111-138 keeps one such set
    per sink): exact Jaccard in integer bps between every pair of
    event-type user sets.

    Returns (t1, t2, n_a, n_b, inter, jaccard_bps) for t1 < t2.

    Scale shape: the stream collapses to distinct (type, user) first —
    map-side partial distinct, one shuffle on user_id; the pair
    expansion is a self-equi-join on that SAME user_id partitioning
    (co-located, no second corpus shuffle) and emits ≤ |types|² rows
    per user; set sizes join back in BROADCAST (|types| rows). For
    unbounded type cardinality swap the exact distinct for the KMV
    sketch ops."""
    ua = events.select(F.col(type_col).alias("t"), "user_id").distinct()
    sizes = ua.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        ua.select(F.col("t").alias("t1"), "user_id")
        .join(ua.select(F.col("t").alias("t2"), "user_id"), "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(F.broadcast(sizes.selectExpr("t AS t1", "n AS n_a")), "t1")
        .join(F.broadcast(sizes.selectExpr("t AS t2", "n AS n_b")), "t2")
        .select(
            "t1",
            "t2",
            "n_a",
            "n_b",
            "inter",
            F.expr("(inter * 10000) div (n_a + n_b - inter)")
            .cast("bigint")
            .alias("jaccard_bps"),
        )
    )


def conv_protocol_check(turns: DataFrame) -> DataFrame:
    """Transcript protocol validation — the structural gate a training
    pipeline runs before packing conversations: a well-formed
    conversation opens with system or user, closes with assistant or
    tool, never carries a system turn after position 0, and its
    user/assistant subsequence strictly alternates. Violations are
    COUNTED per conversation (never dropped), with the verdict as an
    integer flag.

    Returns (conv_id, n_turns, first_role, last_role, late_system,
    ua_violations, protocol_ok).

    Scale shape: one conv_id shuffle; first/last roles come from
    min/max over (turn_idx, role) structs inside the same aggregate —
    no window, no second pass; the alternation check is a lag window
    over the filtered user/assistant subsequence riding the identical
    partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ua = (
        turns.filter(F.col("role").isin("user", "assistant"))
        .withColumn("_prev", F.lag("role").over(w))
        .groupBy("conv_id")
        .agg(
            F.sum((F.col("role") == F.col("_prev")).cast("int"))
            .cast("bigint")
            .alias("ua_violations")
        )
    )
    base = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(F.struct("turn_idx", "role"))["role"].alias("first_role"),
        F.max(F.struct("turn_idx", "role"))["role"].alias("last_role"),
        F.sum(
            ((F.col("role") == "system") & (F.col("turn_idx") > 0)).cast("int")
        ).cast("bigint").alias("late_system"),
    )
    return (
        base.join(ua, "conv_id", "left")
        .withColumn("ua_violations", F.coalesce("ua_violations", F.lit(0)))
        .withColumn(
            "protocol_ok",
            (
                F.col("first_role").isin("system", "user")
                & F.col("last_role").isin("assistant", "tool")
                & (F.col("late_system") == 0)
                & (F.col("ua_violations") == 0)
            ).cast("int"),
        )
    )


def intra_conv_dup_turns(turns: DataFrame) -> DataFrame:
    """Within-conversation repeated-turn detector — the loop/spam gate
    for chat-log corpora (an assistant stuck repeating itself inflates
    next-token loss): a turn is a dup if its exact text bytes appeared
    at an EARLIER turn_idx of the same conversation. Digest-first: the
    dedup key is md5(text) so the exchange never carries turn bodies
    (the conv_dedup discipline applied within the conversation).

    Returns (conv_id, n_turns, n_distinct_texts, n_dup_turns).

    Scale shape: one shuffle on (conv_id, digest) for the first-seen
    window, then a map-side-combined rollup to conv_id; both keys hash
    within the same Exchange because the second groupBy is a prefix of
    nothing — AQE coalesces the bounded conv aggregate."""
    from pyspark.sql import Window

    d = turns.select(
        "conv_id",
        "turn_idx",
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("_h"),
    )
    w = Window.partitionBy("conv_id", "_h").orderBy("turn_idx")
    return (
        d.withColumn("_seen", F.row_number().over(w))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("_seen") == 1).cast("int"))
            .cast("bigint")
            .alias("n_distinct_texts"),
            F.sum((F.col("_seen") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_turns"),
        )
    )


def monthly_trend_slope(
    orders: DataFrame,
    group_col: str = "o_orderpriority",
    ts_col: str = "o_orderdate",
    scale: int = 1000,
) -> DataFrame:
    """Per-group least-squares slope of monthly order volume — the
    capacity-trend report (is this priority class growing?), computed
    EXACTLY in integers: with x = month index and y = monthly count,

        slope_milli = (n*Sxy - Sx*Sy) * scale // (n*Sxx - Sx*Sx)

    the closed-form OLS slope as one integer division (floor), plus the
    raw numerator/denominator so callers needing full precision keep
    the exact rational. Groups with a single distinct month (den = 0)
    report 0 slope — flat by definition, never a divide error.

    Returns (group, n_months, slope_num, slope_den, slope_milli).

    Scale shape: the stream collapses to bounded (group, month) cells
    first (map-side combined); the regression aggregates run over those
    cells — group-cardinality x months state, corpus-independent; no
    window, no sort."""
    month_idx = (
        F.year(F.col(ts_col)) * F.lit(12) + F.month(F.col(ts_col))
    ).cast("bigint")
    cells = (
        orders.select(F.col(group_col).alias("grp"), month_idx.alias("m"))
        .groupBy("grp", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    base = cells.groupBy("grp").agg(
        F.min("m").alias("_m0"),
    )
    stats = (
        cells.join(base, "grp")
        .select(
            "grp",
            (F.col("m") - F.col("_m0")).alias("x"),
            "y",
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return stats.select(
        F.col("grp").alias("grp"),
        F.col("n").alias("n_months"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.when(den == 0, F.lit(0))
        .otherwise(F.expr(f"(n * sxy - sx * sy) * {scale}L div (n * sxx - sx * sx)"))
        .cast("bigint")
        .alias("slope_milli"),
    )


def role_transitions(turns: DataFrame) -> DataFrame:
    """Corpus-wide role-to-role turn-transition matrix — the
    conversation-dynamics report (who speaks after whom: tool-loop
    density, system-interrupt rate) that complements the per-conv
    protocol gate with an aggregate view.

    Returns (role_from, role_to, n_transitions, n_convs) — transition
    counts and how many distinct conversations exhibit each.

    Scale shape: ONE conv_id shuffle feeds the lag window (turn_idx
    order inside the conversation's own partition); the matrix
    aggregate is map-side combined onto a bounded roles² key."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        turns.select("conv_id", "turn_idx", "role")
        .withColumn("_prev", F.lag("role").over(w))
        .filter(F.col("_prev").isNotNull())
    )
    return (
        pairs.groupBy(
            F.col("_prev").alias("role_from"), F.col("role").alias("role_to")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        )
    )


def kanon_release(
    events: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    by_day: bool = True,
    k: int = 5,
) -> DataFrame:
    """k-anonymity-gated aggregate release (Sweeney 2002): a cell of the
    dims × day cube is released only when it aggregates >= k distinct
    users; smaller cells are SUPPRESSED — emitted with the flag set and
    their metrics nulled, never silently dropped (the engine's
    counted-not-dropped house rule applied to privacy gating). This is
    the release gate in front of any externally shared telemetry
    rollup.

    Returns (*dims[, day], suppressed, n_users, n_events) — n_users /
    n_events are NULL on suppressed rows (releasing the sub-k count
    itself would leak the cohort size k-anonymity hides).

    Scale shape: one map-side-combined aggregate onto the bounded cube
    key; the distinct-user count is the only expansion and rides the
    same shuffle."""
    cols = [F.col(d) for d in dims]
    names = list(dims)
    if by_day:
        cols.append(
            F.unix_timestamp(F.date_trunc("day", F.col(ts_col)))
            .cast("bigint")
            .alias("day")
        )
        names.append("day")
    cells = events.groupBy(*cols).agg(
        F.countDistinct("user_id").cast("bigint").alias("_nu"),
        F.count(F.lit(1)).cast("bigint").alias("_ne"),
    )
    sup = F.col("_nu") < k
    return cells.select(
        *names,
        sup.cast("int").alias("suppressed"),
        F.when(sup, F.lit(None)).otherwise(F.col("_nu")).alias("n_users"),
        F.when(sup, F.lit(None)).otherwise(F.col("_ne")).alias("n_events"),
    )


def purchase_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    ts_col: str = "ts",
) -> DataFrame:
    """Last-touch conversion attribution (the standard marketing
    attribution model, public): each conversion event is credited to the
    LAST preceding non-conversion event of the same user (order: ts,
    event_id for deterministic ties); conversions with no preceding
    touch are credited to 'none' — counted, not dropped.

    Returns (attributed_type, n_conversions, total_gap_s, mean_gap_s) —
    gap = conversion time minus touch time; mean floor(total/n), NULL
    for the 'none' bucket.

    Scale shape: one window on the natural user key (last-ignoreNulls
    carry), then a rollup onto the bounded event-type key."""
    from pyspark.sql import Window

    ep = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("bigint")
    base = events.select(
        "user_id", "event_id", "event_type", ep.alias("_ep")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_ep", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != conversion_type, F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_ep = F.last(
        F.when(F.col("event_type") != conversion_type, F.col("_ep")),
        ignorenulls=True,
    ).over(w)
    conv = (
        base.withColumn("_tt", touch_type)
        .withColumn("_tep", touch_ep)
        .filter(F.col("event_type") == conversion_type)
        .select(
            F.coalesce(F.col("_tt"), F.lit("none")).alias("attributed_type"),
            (F.col("_ep") - F.col("_tep")).alias("_gap"),
        )
    )
    return conv.groupBy("attributed_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum("_gap").cast("bigint").alias("total_gap_s"),
        F.when(
            F.sum(F.col("_gap").isNotNull().cast("int")) > 0,
            F.floor(F.sum("_gap") / F.sum(F.col("_gap").isNotNull().cast("int"))),
        )
        .cast("bigint")
        .alias("mean_gap_s"),
    )


def gap_histogram(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Power-of-two histogram of inter-event gaps per user — the
    measured basis for choosing `sessionize_gaps`' threshold (the same
    evidence-not-guess loop `watermark_loss_curve` closes for
    watermarks). Buckets are integer-exact in every engine: bucket =
    length(bin(gap_s)) = floor(log2(gap_s)) + 1 (0-second gaps land in
    bucket 1, 'gap' = same-second events), so no floating log at
    boundaries.

    Returns (gap_bucket_bits, n_gaps, min_gap_s, max_gap_s) — read
    bucket b as gaps in [2^(b-1), 2^b).

    Scale shape: one lag window on the natural user key, then a rollup
    onto the ~40-row bucket key."""
    from pyspark.sql import Window

    ep = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("_ep", "event_id")
    base = (
        events.select("user_id", "event_id", ep.alias("_ep"))
        .withColumn("_gap", F.col("_ep") - F.lag("_ep").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    return (
        base.select(
            F.expr("length(bin(_gap))").cast("int").alias("gap_bucket_bits"),
            "_gap",
        )
        .groupBy("gap_bucket_bits")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.min("_gap").cast("bigint").alias("min_gap_s"),
            F.max("_gap").cast("bigint").alias("max_gap_s"),
        )
    )


def turn_latency_stats(turns: DataFrame) -> DataFrame:
    """Response-latency profile per role transition: for every turn,
    the gap in seconds since the PREVIOUS turn of the same conversation
    (turn_idx order), grouped by (prev_role → role). The
    assistant-after-user row is the user-visible response latency; the
    tool-after-assistant row is tool dispatch overhead. Conversation
    openers have no predecessor and are excluded by construction
    (nothing to measure).

    Returns (prev_role, role, n, min_gap_s, max_gap_s, mean_gap_s) with
    mean floored to integer seconds.

    Scale shape: one lag window on the native conv key, then a
    map-side-combined rollup to the roles² matrix."""
    from pyspark.sql import Window as W

    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    g = turns.select(
        F.lag("role").over(w).alias("prev_role"),
        F.col("role"),
        (ep - F.lag(ep).over(w)).alias("gap"),
    ).filter(F.col("prev_role").isNotNull())
    return g.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("gap").cast("bigint").alias("min_gap_s"),
        F.max("gap").cast("bigint").alias("max_gap_s"),
        F.floor(F.sum("gap") / F.count(F.lit(1))).cast("bigint").alias("mean_gap_s"),
    )


def session_event_trigrams(
    events: DataFrame, gap_s: int = 1800, top: int = 20
) -> DataFrame:
    """Most common within-session event-type trigrams: sessions split
    on > gap_s inactivity per user (the same gap rule as
    sessionize_gaps), trigrams read along (ts, event_id) order WITHOUT
    crossing session boundaries, corpus-wide counts, deterministic
    top-`top` (count desc, trigram asc). The sequence-mining input for
    journey optimization — what users actually do three steps at a
    time.

    Returns (t1, t2, t3, n).

    Scale shape: one user-key window stack (lag for the session split,
    cumulative sum for the session id, two leads for the trigram —
    all sharing ONE user_id exchange), a map-side-combined rollup to
    the type³ grid, TakeOrdered for the top slice."""
    from pyspark.sql import Window as W

    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select(
        "user_id", "ts", "event_id", "event_type", ep.alias("_ep")
    ).withColumn(
        "_new",
        (
            F.coalesce(
                F.col("_ep") - F.lag("_ep").over(wo) > gap_s, F.lit(True)
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(wo.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "_sess").orderBy("ts", "event_id")
    tri = base.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
        .limit(top)
    )


def autocorr_lag_profile(
    events: DataFrame, lags_min: tuple[int, ...] = (1, 60, 1440)
) -> DataFrame:
    """Raw autocorrelation profile of per-minute load at candidate lags
    (1 min, 1 h, 1 day by default): for each lag ℓ report how many
    minute pairs (t, t+ℓ) both carry traffic and the exact integer
    product sum Σ c_t·c_{t+ℓ}, plus the lag-0 energy row (Σ c_t²) the
    consumer normalizes against. A daily-periodic load shows
    sum_prod(1440)/pairs ≈ sum_sq(0)/minutes; a flat one decays — the
    measured basis for picking the seasonality window `hourly_
    seasonality` assumes. Absent minutes are zero-traffic and
    contribute nothing to either side (product 0), so the sparse join
    is exact.

    Returns (lag_min, n_pairs, sum_prod).

    Scale shape: volume collapses to the per-minute count grid first
    (bounded by time span); the lag comparison is one self-equi-join
    per lag on the shifted bounded grid."""
    if any(l < 1 for l in lags_min):
        raise ValueError(f"lags must be >= 1 minute, got {lags_min!r}")
    grid = (
        events.select(
            F.expr(
                "cast(unix_timestamp(cast(ts AS TIMESTAMP)) AS BIGINT) div 60"
            ).alias("m")
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    zero = grid.select(
        F.lit(0).cast("int").alias("lag_min"),
        F.lit(1).alias("_one"),
        (F.col("c") * F.col("c")).alias("_p"),
    )
    parts = [zero]
    for l in sorted(set(int(x) for x in lags_min)):
        a = grid.select(F.col("m"), F.col("c").alias("ca"))
        b = grid.select((F.col("m") - l).alias("m"), F.col("c").alias("cb"))
        parts.append(
            a.join(b, "m").select(
                F.lit(l).cast("int").alias("lag_min"),
                F.lit(1).alias("_one"),
                (F.col("ca") * F.col("cb")).alias("_p"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("lag_min").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_p").cast("bigint").alias("sum_prod"),
    )
