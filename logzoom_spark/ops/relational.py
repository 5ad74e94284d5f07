"""Temporal join operators Spark lacks as built-ins: as-of join and bounded
range join — both re-expressed as shuffle-once DataFrame plans (the naive
formulations are inequality joins, which Spark executes as
BroadcastNestedLoop / cartesian at scale: O(N·M) and a 100 TB death
sentence).

- ``asof_join``: union-tag-window. Tag right rows, union with left rows,
  sort within each key partition by (ts, right-first), and carry the right
  payload forward with ``last(ignorenulls)``. ONE shuffle on the key, no
  range explosion, no per-key collect — the distributed analog of pandas'
  merge_asof / kdb's aj.

- ``range_join_count``: bucketize time into `lookback`-second buckets, join
  on (key, bucket ∈ {b-1, b}) + residual predicate, re-aggregate per left
  row. The bounded 2× probe fanout turns the inequality join into an
  equi-join the hash-shuffle machinery (and AQE skew handling) runs well.

No reference analog (logzoom is a router, not a join engine); these extend
the relational surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row: the right row with the greatest ``right_ts`` ≤
    ``left_ts`` for the same ``key``; adds ``matched_ts`` + one
    ``matched_<c>`` per payload column (NULL when nothing precedes).

    ``right`` must be unique per (key, right_ts) — pre-aggregate ties away
    (an ambiguous as-of match is a data bug, not a join feature). Use
    epoch-second BIGINT ts columns for engine-exact semantics.
    """

    def _type(df: DataFrame, col: str) -> str:
        return df.schema[col].dataType.simpleString()

    left_cols = list(left.columns)
    l_tag = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(_type(right, right_ts)).alias("_rts"),
        *[F.lit(None).cast(_type(right, c)).alias(f"_r_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        *[
            F.col(key).alias(c) if c == key else F.lit(None).cast(_type(left, c)).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    # right rows sort BEFORE left rows at equal ts, so `<=` semantics match
    # a right row whose ts equals the left ts; one shuffle on key
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *left_cols,
        "_is_left",
        F.last(F.col("_rts"), ignorenulls=True).over(w).alias("matched_ts"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"matched_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_epoch: str,
    right_epoch: str,
    lookback: int,
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per left row: aggregate right rows of the same ``key`` with epoch in
    ``[left_epoch - lookback, left_epoch)`` (strictly before — a row never
    matches itself in self-joins). Epochs are integer seconds; left rows
    must be unique over their column tuple (they carry their own id).

    Default aggregate: ``n_in_range`` = count of matching right rows (0
    when none — the left join keeps unmatched probe rows and ``count`` of a
    right-side column ignores their nulls). Custom ``agg_exprs`` may
    reference right columns via their ``_r_``-prefixed aliases plus
    ``_re`` (the right epoch).
    """
    aggs = agg_exprs or {"n_in_range": F.count(F.col("_re"))}
    lb = F.lit(lookback)
    # floor, not cast: cast truncates toward zero, so negative epochs
    # (pre-1970) would land left/right rows in misaligned buckets and
    # silently miss in-range matches
    probe = left.withColumn(
        "_b", F.floor(F.col(left_epoch) / lb).cast("bigint")
    ).withColumn("_pb", F.explode(F.array(F.col("_b") - 1, F.col("_b"))))
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(right_epoch).cast("bigint").alias("_re"),
        *[
            F.col(c).alias(f"_r_{c}")
            for c in right.columns
            if c not in (key, right_epoch)
        ],
    ).withColumn("_rb", F.floor(F.col("_re") / lb).cast("bigint"))
    joined = probe.join(
        r,
        (probe[key] == r["_rk"])
        & (probe["_pb"] == r["_rb"])
        & (r["_re"] >= probe[left_epoch] - lb)
        & (r["_re"] < probe[left_epoch]),
        "left",
    )
    # each right row lives in exactly one bucket, so it matches at most one
    # of the two probe rows — the re-aggregation cannot double-count
    return joined.groupBy(*[F.col(f"`{c}`") for c in left.columns]).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_cols: list[str],
    n_salt: int = 8,
) -> DataFrame:
    """Skew-salted equi-join: the big (skewed) side gets a deterministic
    salt from `salt_cols`, the small side is replicated n_salt times, and
    the join runs on (key, salt) — a hot key's rows spread over n_salt
    reducers instead of one straggler task. The result SET is identical to
    the plain join for any salt assignment (each big row meets exactly one
    replica of each matching small row) — oracle-verified against the
    unsalted formulation. Use when AQE skew splitting is unavailable or
    the skew is in an aggregation-feeding join it can't split."""
    bs = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    )
    ss = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return bs.join(
        ss, (bs[big_key] == ss[small_key]) & (bs["_salt"] == ss["_salt"])
    ).drop("_salt")


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential funnel over an event log: a user reaches step i+1 when
    an event of that type occurs STRICTLY AFTER their earliest arrival at
    step i (earliest-arrival semantics — the standard product-analytics
    funnel; cf. window funnel functions in public OLAP engines). Returns
    one row per step: (step_idx, step, n_users), n_users monotonically
    non-increasing.

    Scale shape: each stage is a type-filtered min-aggregate on user_id
    (the log's natural bucket key) followed by a user_id equi-join with
    the previous stage's (user, ts) pairs — every exchange carries
    (user_id, timestamp) rows only, co-partitioned across stages, so the
    whole funnel reuses ONE hash partitioning; step count bounds the
    stage chain. NULL users are excluded (no identity to follow)."""
    if not steps:
        raise ValueError("need at least one funnel step")
    u, t, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    base = events.filter(u.isNotNull()).select(
        u.alias("_u"), ty.alias("_ty"), t.alias("_ts")
    )
    reached = (
        base.filter(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_arr"))
    )
    out_rows = [reached.select(F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"), F.col("_u"))]
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            base.filter(F.col("_ty") == s)
            .join(reached.select("_u", "_arr"), "_u")
            .filter(F.col("_ts") > F.col("_arr"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_arr"))
        )
        reached = nxt
        out_rows.append(
            reached.select(F.lit(i).alias("step_idx"), F.lit(s).alias("step"), F.col("_u"))
        )
    allr = out_rows[0]
    for r in out_rows[1:]:
        allr = allr.unionByName(r)
    return allr.groupBy("step_idx", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def bloom_pruned_join(
    small: DataFrame,
    big: DataFrame,
    small_key: str,
    big_key: str,
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over the SMALL side's
    keys (ops.sketch.bloom_build — identical bit layout), inline it as a
    LITERAL 31-bit-word array (m_bits/31 longs of bounded driver state,
    same discipline as the literal-centroid k-means assign), and prune
    the BIG side with a zero-shuffle row-local bit test BEFORE the join.
    The exact join then removes the Bloom's false positives, so the
    result is byte-identical to the plain join — which is exactly what
    the oracle checks. Spark's own `spark.sql.optimizer.runtimeFilter.*`
    does this automatically for some shapes; this operator is the
    explicit, engine-portable version for when the optimizer can't see
    the selectivity (pre-aggregated or UDF-derived small sides).

    At 100 TB this is the difference between shuffling the full fact
    table into the join and shuffling only the ~selectivity fraction
    that can possibly match.

    Returns pruned-big ⋈ small (inner, big_key == small_key)."""
    from ..hashing import portable_hash
    from .sketch import bloom_build

    words = {
        int(r.word_idx): int(r.word)
        for r in bloom_build(small, small_key, m_bits, n_hashes).collect()
    }
    arr = F.array(
        *[
            F.lit(words.get(i, 0)).cast("long")
            for i in range(m_bits // 31 + 1)
        ]
    )
    v = F.col(big_key)
    tmp = big.filter(v.isNotNull())
    flag = None
    bit_cols = []
    for i in range(n_hashes):
        bname = f"_bpj_bit_{i}"
        bit_cols.append(bname)
        tmp = tmp.withColumn(
            bname, F.pmod(portable_hash(v.cast("string"), seed=i), F.lit(m_bits))
        )
        word = F.element_at(arr, F.expr(f"cast({bname} div 31 AS INT) + 1"))
        t = (
            word.bitwiseAND(F.expr(f"shiftleft(1L, cast({bname} % 31 AS INT))"))
            != 0
        )
        flag = t if flag is None else (flag & t)
    pruned = tmp.filter(flag).drop(*bit_cols)
    return pruned.join(small, pruned[big_key] == small[small_key])


def funnel_within(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_s: int = 86400,
) -> DataFrame:
    """Time-bounded sequential funnel (ClickHouse's windowFunnel is the
    public analogue): a user advances to step i+1 only with an event
    STRICTLY after their step-i arrival and within `within_s` seconds
    of it — earliest-arrival semantics at every step, so the count is
    deterministic. The unbounded variant is `funnel_counts`; the bound
    is what makes the funnel actionable (conversions a year later are
    not this campaign's conversions).

    Returns (step_idx, step, n_users).

    Scale shape: per-step per-user min-aggregates chained by broadcast-
    friendly user-key joins — step count bounds the chain, every
    aggregate is map-side combined on the natural user key."""
    if not steps:
        raise ValueError("need at least one funnel step")
    if within_s < 1:
        raise ValueError(f"need within_s >= 1, got {within_s}")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .filter(F.col("user_id").isNotNull())
        .select("user_id", ep.alias("_arr"))
        .groupBy("user_id")
        .agg(F.min("_arr").alias("arr"))
    )
    out_rows = [(0, steps[0], cur)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col("event_type") == step)
            .select("user_id", ep.alias("_e"))
            .join(cur.select("user_id", "arr"), "user_id")
            .filter(
                (F.col("_e") > F.col("arr"))
                & (F.col("_e") <= F.col("arr") + within_s)
            )
            .groupBy("user_id")
            .agg(F.min("_e").alias("arr"))
        )
        out_rows.append((i, step, nxt))
        cur = nxt
    spark = events.sparkSession
    parts = []
    for idx, name, df in out_rows:
        parts.append(
            df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
                F.lit(idx).cast("int").alias("step_idx"),
                F.lit(name).alias("step"),
                "n_users",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("n_users") > 0)


def skyline_users(events: DataFrame, n_buckets: int = 64) -> DataFrame:
    """2-D skyline (Pareto front; Börzsönyi, Kossmann, Stocker, ICDE
    2001) over per-user (total value cents, event count), both
    maximized: the users no other user dominates — the multi-criteria
    top-set a single ORDER BY cannot express.

    A point p is dominated iff some q has q.v >= p.v, q.n >= p.n with
    one strict. Split by the v comparison: (a) strictly-greater-v
    dominators exist iff max-n over v' > p.v is >= p.n; (b) equal-v
    dominators exist iff the per-v max-n exceeds p.n. Both reduce to a
    running max over the DISTINCT-value spine — never a pairwise join.

    Scale shape: one user-key rollup, then the distinct-v spine (<=
    distinct totals); the strictly-greater running max runs two-level —
    equal-width v buckets from a 1-row broadcast envelope, an in-bucket
    strict-predecessor max window partitioned BY bucket (v DESC), and
    per-bucket offsets from a window over the n_buckets-row aggregate —
    the same distributed-prefix shape as ks_value_drift, max instead of
    sum. Returns (user_id, value_cents, n_events), dominance-free."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    pu = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("u"))
        .agg(
            F.sum(F.coalesce(F.floor(F.col("value") * 100), F.lit(0)))
            .cast("bigint")
            .alias("v"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    env = pu.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    nb = float(n_buckets)
    bucketed = pu.crossJoin(F.broadcast(env)).select(
        "u",
        "v",
        "n",
        F.expr(
            f"CASE WHEN vmax = vmin THEN 0 "
            f"ELSE least({n_buckets - 1}, CAST(floor((v - vmin) "
            f"/ ((vmax - vmin) / {nb})) AS INT)) END"
        ).alias("bkt"),
    )
    # per-distinct-v spine: max n at that exact v
    spine = bucketed.groupBy("bkt", "v").agg(F.max("n").alias("m_eq"))
    # in-bucket strict-predecessor running max, v DESC
    in_bkt = (
        Window.partitionBy("bkt")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = spine.withColumn("m_gt_local", F.max("m_eq").over(in_bkt))
    # per-bucket totals -> strictly-higher-bucket offsets (bkt DESC)
    bmax = spine.groupBy("bkt").agg(F.max("m_eq").alias("bm"))
    off_w = (
        Window.orderBy(F.col("bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bmax.select("bkt", F.max("bm").over(off_w).alias("m_hi"))
    gt = local.join(F.broadcast(offs), "bkt").select(
        "v",
        "m_eq",
        # Spark's greatest skips NULLs: NULL only when BOTH miss (the
        # global-max v in the top nonempty bucket), i.e. undominated
        F.greatest(F.col("m_gt_local"), F.col("m_hi")).alias("m_gt"),
    )
    return (
        bucketed.join(gt, "v")
        .filter(
            (F.col("m_gt").isNull() | (F.col("m_gt") < F.col("n")))
            & (F.col("m_eq") <= F.col("n"))
        )
        .select(F.col("u").alias("user_id"), F.col("v").alias("value_cents"), F.col("n").alias("n_events"))
    )


def session_incident_overlap(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Interval-overlap join: user sessions (the bounce_rate_daily /
    sessionize_gaps split rule — > gap_s inactivity starts a new
    session) against daily error-incident windows (per day, the
    [first, last] error-event envelope). The temporal-join shape a
    plain equi-join cannot express: which sessions were exposed to an
    incident, and for how long.

    Returns (user_id, sess_start_ep, day_no, overlap_s, n_errors) — one
    row per (session, incident) pair with positive or zero-length
    overlap (touching endpoints count, overlap_s >= 0).

    Scale shape: day-bucket blocking — a session explodes to the
    calendar days it spans (row-local sequence/explode; sessions are
    gap-bounded so the fan-out is tiny), incidents are single-day by
    construction, and the join is an EQUI-join on the day key followed
    by the residual range predicate; no session ever compares against
    another day's incidents and no pair is produced twice. The session
    rollup rides the same one user-key exchange as bounce_rate_daily;
    the incident table is calendar-bounded."""
    if gap_s < 1:
        raise ValueError(f"need gap_s >= 1, got {gap_s}")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type", ep.alias("_ep"))
        .withColumn(
            "_new",
            F.coalesce(
                F.col("_ep") - F.lag("_ep").over(wo) > gap_s, F.lit(True)
            ).cast("int"),
        )
        .withColumn(
            "_sess", F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    sessions = base.groupBy("user_id", "_sess").agg(
        F.min("_ep").alias("s_start"), F.max("_ep").alias("s_end")
    )
    incidents = (
        events.filter(
            (F.col("event_type") == "error") & F.col("ts").isNotNull()
        )
        .select(ep.alias("_ep"))
        .groupBy(F.expr("_ep DIV 86400").alias("day_no"))
        .agg(
            F.min("_ep").alias("i_start"),
            F.max("_ep").alias("i_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_errors"),
        )
    )
    days = sessions.select(
        "user_id",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                # integral DIV: exact integer arithmetic (the double
                # division's cast truncates toward zero, which would also
                # mis-bucket pre-1970 epochs), matching the oracle's `//`
                F.expr("s_start DIV 86400"),
                F.expr("s_end DIV 86400"),
            )
        ).alias("day_no"),
    )
    return (
        days.join(incidents, "day_no")
        .filter(
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end"))
        )
        .select(
            "user_id",
            F.col("s_start").alias("sess_start_ep"),
            "day_no",
            (
                F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
            ).cast("bigint").alias("overlap_s"),
            "n_errors",
        )
    )
