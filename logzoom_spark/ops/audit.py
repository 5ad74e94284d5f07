"""Pipeline-integrity and data-quality audits over the transcript stream.

The reference's delivery contract is at-least-once with no in-engine
verification (reference: input/filebeat/filebeat.go — ACK after enqueue,
drops counted but never reconciled); these operators are the audits a
100 TB deployment runs ON the engine's own output to prove the contract
held, plus the profiling that sizes its streaming and storage knobs:

- `lateness_audit` — measured event-time disorder per conversation;
  the empirical basis for choosing a Structured Streaming watermark
  (`withWatermark` delay should dominate the observed max lateness).
- `seq_gap_audit` — producer sequence-number reconciliation: missing
  seqs = dropped messages, duplicate seqs = at-least-once redelivery.
- `dq_profile` — Deequ-style column profile (completeness, distinctness;
  Schelter et al., VLDB 2018 is the public design).
- `storage_tiering_plan` — per-day bytes/rows with age-based hot/warm/
  cold tiers and newest-first cumulative bytes: the lifecycle policy
  input for a time-sliced sink (reference: output/s3/s3.go time slicing).

All outputs are integer-exact (epoch seconds, byte counts, ×10000 ratios).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "lateness_audit",
    "seq_gap_audit",
    "dq_profile",
    "storage_tiering_plan",
]


def lateness_audit(turns: DataFrame) -> DataFrame:
    """Event-time disorder per conversation: a turn is LATE when its
    event time precedes the running max of all earlier-ARRIVING turns
    (arrival order = turn_idx); its lateness is that deficit in seconds.
    Returns (conv_id, n_turns, n_late, max_late_s, total_late_s) — the
    max over conversations is the smallest safe watermark delay.

    Scale shape: one window partitioned by the table's native conv key
    (bounded by conversation length), then a map-side-combined rollup."""
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(F.max("_ep").over(w) - F.col("_ep"), F.lit(0))
    return (
        turns.select("conv_id", "turn_idx", ep.alias("_ep"))
        .withColumn("_late", F.coalesce(late, F.lit(0)))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum((F.col("_late") > 0).cast("int")).cast("bigint").alias("n_late"),
            F.max("_late").cast("bigint").alias("max_late_s"),
            F.sum("_late").cast("bigint").alias("total_late_s"),
        )
    )


def seq_gap_audit(turns: DataFrame) -> DataFrame:
    """Producer sequence reconciliation per conversation over the KV
    lines carrying ``seq=N``: span − distinct = messages MISSING
    (dropped somewhere before the sink), observed − distinct = DUPLICATED
    (at-least-once redelivery). Conversations with no seq-bearing lines
    are absent by construction (nothing to reconcile).

    Returns (conv_id, n_seq_lines, min_seq, max_seq, n_missing, n_dups).
    One aggregate on the native conv key; the distinct count rides the
    same shuffle."""
    seq = F.regexp_extract(F.col("text"), r"seq=(\d+)", 1)
    base = (
        turns.select("conv_id", seq.alias("_s"))
        .filter(F.col("_s") != "")
        .select("conv_id", F.col("_s").cast("bigint").alias("seq"))
    )
    return base.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seq_lines"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        (
            F.max("seq") - F.min("seq") + 1 - F.countDistinct("seq")
        ).cast("bigint").alias("n_missing"),
        (F.count(F.lit(1)) - F.countDistinct("seq")).cast("bigint").alias("n_dups"),
    )


def dq_profile(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Deequ-style column quality profile: for each named column,
    (col_name, n_rows, n_null, n_distinct, completeness_bp) with
    completeness = non-null fraction in basis points (floor). Values are
    compared as their string casts so the profile is type-agnostic.

    Scale shape: one map-side-combined aggregate per column (each a
    separate shuffle on that column's values — the price of exact
    distinct counts; swap in HLL from ops.sketch when approximate is
    acceptable). The final assembly is a union of k one-row frames —
    driver-bounded, k = len(cols)."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        one = df.select(s.alias("_v")).agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.isnull("_v").cast("int")).cast("bigint").alias("n_null"),
            F.countDistinct("_v").cast("bigint").alias("n_distinct"),
            F.expr(
                "((count(1) - sum(cast(_v IS NULL AS INT))) * 10000) div count(1)"
            )
            .cast("bigint")
            .alias("completeness_bp"),
        )
        parts.append(one)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def storage_tiering_plan(
    turns: DataFrame, hot_days: int = 7, warm_days: int = 30
) -> DataFrame:
    """Age-based lifecycle plan for a day-partitioned log store: per day,
    row count and text bytes; age in days versus the newest day in the
    corpus; tier ∈ hot/warm/cold by the two thresholds; and the
    cumulative bytes of this-day-and-newer (the hot+ working set if the
    cutoff were placed here).

    Returns (day, n_rows, bytes, age_days, tier, cum_bytes_newer).

    Scale shape: the per-day rollup is map-side combined; the newest-day
    scalar broadcasts; the cumulative window runs over the bounded
    per-day aggregate (rows = days retained, not data)."""
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
    )
    daily = (
        turns.select(day.alias("day"), F.octet_length("text").alias("_b"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("_b").cast("bigint").alias("bytes"),
        )
    )
    newest = daily.agg(F.max("day").alias("_newest"))
    j = daily.crossJoin(F.broadcast(newest))
    age = F.expr("(_newest - day) div 86400")
    w = (
        Window.orderBy(F.col("day").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.withColumn("age_days", age)
        .withColumn(
            "tier",
            F.when(F.col("age_days") < hot_days, F.lit("hot"))
            .when(F.col("age_days") < warm_days, F.lit("warm"))
            .otherwise(F.lit("cold")),
        )
        .withColumn("cum_bytes_newer", F.sum("bytes").over(w).cast("bigint"))
        .select("day", "n_rows", "bytes", "age_days", "tier", "cum_bytes_newer")
    )


def value_outliers_iqr(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tukey-fence outlier audit per group over a continuous measure:
    quartiles on integer cents (house rule: round(x·100) BIGINT), fences
    at ±1.5·IQR kept ×10 so the comparison stays integer-exact.

    Returns (group, n, q1_cents, q3_cents, n_low, n_high) — n_low/n_high
    count values strictly outside the fences.

    Scale shape: quartiles ride the (group, cents) histogram
    (`exact_percentiles_disc`); the fence check re-scans the facts with
    the per-group fences BROADCAST (groups are bounded), so the fact
    table never shuffles."""
    from .sketch import exact_percentiles_disc

    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = events.select(
        F.col(group_col).alias("grp"), cents.alias("cents")
    ).filter(F.col("cents").isNotNull())
    q = exact_percentiles_disc(base, "grp", "cents", (0.25, 0.75)).select(
        "grp",
        F.col("p25").alias("q1_cents"),
        F.col("p75").alias("q3_cents"),
    )
    flagged = base.join(F.broadcast(q), "grp").select(
        "grp",
        "q1_cents",
        "q3_cents",
        (
            F.col("cents") * 10
            < F.col("q1_cents") * 10 - 15 * (F.col("q3_cents") - F.col("q1_cents"))
        )
        .cast("int")
        .alias("_lo"),
        (
            F.col("cents") * 10
            > F.col("q3_cents") * 10 + 15 * (F.col("q3_cents") - F.col("q1_cents"))
        )
        .cast("int")
        .alias("_hi"),
    )
    return flagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("q1_cents").alias("q1_cents"),
        F.max("q3_cents").alias("q3_cents"),
        F.sum("_lo").cast("bigint").alias("n_low"),
        F.sum("_hi").cast("bigint").alias("n_high"),
    ).withColumnRenamed("grp", group_col)


def watermark_loss_curve(
    turns: DataFrame, candidates_s: tuple[int, ...] = (0, 60, 300, 3600, 21600)
) -> DataFrame:
    """Closes the loop `lateness_audit` opens: for each CANDIDATE
    watermark delay W, how many rows a streaming job with
    ``withWatermark(ts, W)`` would have dropped on this corpus (rows
    whose lateness vs the running per-conversation max exceeds W), as a
    measured loss curve — pick the smallest W whose drop rate is
    acceptable instead of guessing.

    Returns (watermark_s, n_rows, n_dropped, drop_bp), one row per
    candidate.

    Scale shape: one conv-key window computes lateness once; each
    candidate is a conditional sum over the SAME pass (no per-candidate
    scan); the result is len(candidates) rows."""
    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.coalesce(
        F.greatest(F.max("_ep").over(w) - F.col("_ep"), F.lit(0)), F.lit(0)
    )
    base = turns.select("conv_id", "turn_idx", ep.alias("_ep")).withColumn(
        "_late", late
    )
    aggs = []
    for c in candidates_s:
        aggs.append(
            F.sum((F.col("_late") > c).cast("int")).cast("bigint").alias(f"_d{c}")
        )
    one = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"), *aggs)
    parts = []
    for c in candidates_s:
        parts.append(
            one.select(
                F.lit(c).cast("bigint").alias("watermark_s"),
                F.col("_n").alias("n_rows"),
                F.col(f"_d{c}").alias("n_dropped"),
                F.expr(f"(_d{c} * 10000) div _n").cast("bigint").alias("drop_bp"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fk_integrity_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit between a fact and its dimension
    (Deequ's referential constraint, public design): orphan children
    (no matching parent — broken ingestion or late dimension) and
    childless parents (fine, but quantified). One row of evidence.

    Returns (n_child, n_orphans, orphan_bp, n_parents, n_childless).

    Scale shape: orphans via LEFT ANTI join on the key (the parent key
    set broadcasts when small, AQE decides); childless via the reverse
    anti-join over the child's DISTINCT keys — child facts collapse to
    their key set before crossing any exchange."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias("_pk")).distinct(),
        F.col(child_key) == F.col("_pk"),
        "left_anti",
    )
    childless = parent.join(
        child.select(F.col(child_key).alias("_ck")).distinct(),
        F.col(parent_key) == F.col("_ck"),
        "left_anti",
    )
    n_child = child.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select("n")
    n_orph = orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select("n")
    n_par = parent.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select("n")
    n_cl = childless.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select("n")
    return (
        n_child.withColumnRenamed("n", "n_child")
        .crossJoin(n_orph.withColumnRenamed("n", "n_orphans"))
        .crossJoin(n_par.withColumnRenamed("n", "n_parents"))
        .crossJoin(n_cl.withColumnRenamed("n", "n_childless"))
        .select(
            "n_child",
            "n_orphans",
            F.expr("(n_orphans * 10000) div n_child").cast("bigint").alias(
                "orphan_bp"
            ),
            "n_parents",
            "n_childless",
        )
    )


def ldiversity_audit(
    events: DataFrame,
    quasi_cols: tuple[str, ...] = ("event_type",),
    sensitive_col: str = "user_id",
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006 — the
    public successor check to k-anonymity): per quasi-identifier cell,
    count rows and DISTINCT sensitive values; a cell is releasable only
    when it carries at least `l` distinct sensitive values (a k-anon
    cell where everyone shares one sensitive value still leaks). The
    companion gate to `aggregate.kanon_release`.

    Returns (*quasi_cols, n_rows, n_sensitive, ok) with ok ∈ {0,1}.

    Scale shape: one aggregate on the quasi key; the exact distinct
    rides the same shuffle (swap in the HLL sketch from ops.sketch when
    approximate suffices at 100 TB)."""
    if l < 1:
        raise ValueError(f"need l >= 1, got {l}")
    return events.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct(sensitive_col).cast("bigint").alias("n_sensitive"),
        (F.count_distinct(sensitive_col) >= l).cast("int").alias("ok"),
    )


#: floor(log10(1 + 1/d) * 10000) for d = 1..9 — Benford's law expected
#: leading-digit shares in basis points (Newcomb 1881 / Benford 1938).
BENFORD_BP = (3010, 1760, 1249, 969, 791, 669, 579, 511, 457)


def benford_audit(events: DataFrame, col: str = "value") -> DataFrame:
    """Benford's-law audit of a numeric column: distribution of the
    leading significant digit of the integer cents vs the expected
    log-law shares — the classic fabricated-numbers screen (synthetic
    or capped metrics flatten the curve; real multiplicative data
    follows it). Rows with NULL or sub-cent magnitude carry no leading
    digit and are excluded (nothing to read a digit from).

    Returns (digit, n, share_bp, benford_bp, dev_bp) with dev = observed
    − expected (signed). All integer: the digit comes from the BIGINT
    cents rendered as a string — identical in any engine, no float
    log10 at the boundary.

    Scale shape: one row-local projection + a 9-key map-side-combined
    rollup; expected shares join from a 9-row literal table."""
    cents = F.floor(F.abs(F.col(col)) * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        events.select(cents.alias("_c"), digit.alias("digit"))
        .filter(F.col("_c") >= 1)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spark = events.sparkSession
    exp = spark.createDataFrame(
        [(d + 1, bp) for d, bp in enumerate(BENFORD_BP)],
        "digit int, benford_bp bigint",
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        obs.withColumn("_tot", F.sum("n").over(tot))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit",
            "n",
            F.expr("(n * 10000) div _tot").cast("bigint").alias("share_bp"),
            "benford_bp",
            (F.expr("(n * 10000) div _tot") - F.col("benford_bp"))
            .cast("bigint")
            .alias("dev_bp"),
        )
    )


def tcloseness_audit(
    events: DataFrame,
    quasi_cols: tuple[str, ...] = ("event_type",),
    sensitive_col: str = "user_id",
    t_bp: int = 2000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 — the
    successor to l-diversity): per quasi-identifier cell, the total
    variation distance between the cell's sensitive-value distribution
    and the GLOBAL distribution, in basis points. l-diversity only
    counts distinct sensitive values; a cell can carry l values yet be
    wildly skewed vs the population, leaking membership — t-closeness
    bounds that skew. Completes the release-gate family with
    `aggregate.kanon_release` and `ldiversity_audit`.

    TVD for categorical sensitive values = (1/2) * [ sum over values
    present in the cell of |p_cell - p_global| + total global mass of
    values ABSENT from the cell ], computed EXACTLY in integers:
    term1 = sum |n_cs*N - N_s*n_c|, term2 = (N - sum_present N_s)*n_c,
    tvd_bp = 10000*(term1+term2) div (2*n_c*N). Intermediate products
    stay < 2^63 up to ~10^9 rows; at full 100 TB scale cast the two
    count factors to DECIMAL(38,0) (Spark-native) for the same exact
    arithmetic.

    Returns (*quasi_cols, n_rows, tvd_bp, ok) with ok = tvd_bp <= t_bp.

    Scale shape: one (quasi, sensitive) aggregate, one sensitive-key
    aggregate (both map-side combined), a join on the sensitive key, a
    re-rollup on the quasi key, and a broadcast 1-row total. No body
    columns ever move; everything after the first rollup is
    count-sized."""
    if t_bp < 0 or t_bp > 10000:
        raise ValueError(f"need 0 <= t_bp <= 10000, got {t_bp}")
    # NULL sensitive values are excluded up front: an equi-join on the
    # sensitive key would silently drop them from the per-cell terms while
    # the grand total still counted them, skewing every denominator
    events = events.filter(F.col(sensitive_col).isNotNull())
    q = [F.col(c) for c in quasi_cols]
    cell_s = events.groupBy(*q, F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cs")
    )
    glob_s = events.groupBy(F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    total = events.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # carry n_c per cell via a window on the quasi key (rides the same
    # exchange as the (quasi, sensitive) aggregate — no extra shuffle) so
    # term1's |n_cs*N - N_s*n_c| sees the cell total on every row
    from pyspark.sql import Window

    wcell = Window.partitionBy(*quasi_cols)
    detail = (
        cell_s.join(glob_s, "_s")
        .crossJoin(F.broadcast(total))
        .withColumn("n_c", F.sum("n_cs").over(wcell).cast("bigint"))
    )
    return (
        detail.groupBy(*quasi_cols)
        .agg(
            F.max("n_c").alias("n_rows"),
            F.max("n_total").alias("_n"),
            F.sum(
                F.abs(F.col("n_cs") * F.col("n_total") - F.col("n_s") * F.col("n_c"))
            )
            .cast("bigint")
            .alias("_term1"),
            F.sum("n_s").cast("bigint").alias("_present"),
        )
        .select(
            *quasi_cols,
            F.col("n_rows"),
            F.expr(
                "CAST((10000 * (_term1 + (_n - _present) * n_rows)) "
                "DIV (2 * n_rows * _n) AS BIGINT)"
            ).alias("tvd_bp"),
        )
        .withColumn("ok", (F.col("tvd_bp") <= t_bp).cast("int"))
    )


def psi_value_drift(
    events: DataFrame,
    n_bins: int = 10,
    col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Population Stability Index of a numeric column between the first
    and second half of the observed day range — the standard ML-serving
    drift monitor (PSI < 0.1 stable, 0.1-0.25 watch, > 0.25 act). Bins
    are equal-width over the global [min, max]; both halves' bin shares
    are Laplace-smoothed (+1 per bin) so empty bins stay defined, and
    each bin's PSI term (share_cur - share_ref) * ln(share_cur /
    share_ref) is floor-quantized to 1e-6 BEFORE summation, so the total
    is an integer sum of per-bin integers — engine-identical regardless
    of float summation order (the same discipline as unigram_surprisal).

    Returns one row per bin: (bin, n_ref, n_cur, term_micro, psi_micro)
    with psi_micro the corpus total repeated per row (window over the
    n_bins-row aggregate). NULL values carry no bin and are excluded.

    Scale shape: one row-local bin projection + an n_bins-key map-side-
    combined rollup; the split day and value envelope come from a 1-row
    broadcast aggregate; every window runs over the n_bins-row spine."""
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("bigint")
    base = events.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("_v"), day.alias("_d")
    )
    stats = base.agg(
        F.min("_v").alias("_vmin"),
        F.max("_v").alias("_vmax"),
        F.expr("(min(_d) + max(_d) + 1) DIV 2").cast("bigint").alias("_mid"),
    )
    nb = float(n_bins)
    labeled = base.crossJoin(F.broadcast(stats)).select(
        F.expr(
            f"CASE WHEN _vmax = _vmin THEN 0 "
            f"ELSE least({n_bins - 1}, CAST(floor((_v - _vmin) "
            f"/ ((_vmax - _vmin) / {nb})) AS INT)) END"
        ).alias("bin"),
        (F.col("_d") < F.col("_mid")).alias("_is_ref"),
    )
    counts = labeled.groupBy("bin").agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("_is_ref"), 0).otherwise(1)).cast("bigint").alias("n_cur"),
    )
    spine = events.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    from pyspark.sql import Window

    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
        )
        .withColumn("_tr", F.sum("n_ref").over(tot))
        .withColumn("_tc", F.sum("n_cur").over(tot))
        .withColumn(
            "term_micro",
            F.expr(
                f"CAST(floor(1000000.0d * "
                f"((CAST(n_cur + 1 AS DOUBLE) / CAST(_tc + {n_bins} AS DOUBLE)"
                f"  - CAST(n_ref + 1 AS DOUBLE) / CAST(_tr + {n_bins} AS DOUBLE))"
                f" * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(_tc + {n_bins} AS DOUBLE))"
                f"      / (CAST(n_ref + 1 AS DOUBLE) / CAST(_tr + {n_bins} AS DOUBLE)))"
                f")) AS BIGINT)"
            ),
        )
        .withColumn("psi_micro", F.sum("term_micro").over(tot).cast("bigint"))
        .select("bin", "n_ref", "n_cur", "term_micro", "psi_micro")
    )


def dp_noisy_counts(
    events: DataFrame,
    eps_bits: int = 1,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Differentially-private release of the per-(key, day) event counts
    under the discrete Laplace (two-sided geometric) mechanism of
    Ghosh-Roughgarden-Sundararajan (SIAM J. Comput. 2012): noise =
    G1 - G2 with G1, G2 iid Geometric over {0, 1, ...} with success
    probability 1 - alpha, alpha = 2^-eps_bits, which is eps-DP for the
    unit-sensitivity daily histogram with eps = eps_bits * ln 2 (one
    event changes exactly one cell by 1, so the cells compose in
    parallel).

    Sampling is pure integer arithmetic — no ln(), no float, no RNG:
    a seeded 40-bit portable hash of the cell key is uniform on
    [0, 2^40); its leading-zero count L (= 40 - bit-length) is
    Geometric(1/2), and L div eps_bits is Geometric(1 - 2^-eps_bits)
    (P[L >= g*eps_bits] = 2^-(g*eps_bits) = alpha^g). The 2^-40 tail is
    folded onto the top value — the standard finite-precision
    truncation, deterministic in both engines. Two seeds give the two
    independent geometrics.

    The seeded-hash noise makes the mechanism REPRODUCIBLE, which is
    what lets DuckDB value-verify it; a production release would derive
    the seed from a secret (the privacy proof needs the adversary not
    to know the noise), exactly like the sampling gates elsewhere in
    this package trade a secret seed for verifiability.

    Returns (key, day, n_true, noise, n_released) with n_released =
    max(0, n_true + noise) (non-negativity is DP-safe post-processing).
    n_true is emitted for the parity/utility audit only — the DP release
    is the (key, day, n_released) projection.

    Scale shape: one map-side-combined count per (key, day) cell; noise
    is a row-local projection on the cell-sized aggregate. Nothing else
    moves."""
    if eps_bits < 1:
        raise ValueError(f"need eps_bits >= 1, got {eps_bits}")
    from ..hashing import portable_hash

    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("bigint")
    cells = (
        events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    cell_id = F.concat_ws("|", F.col("key"), F.col("day"))

    def geom(seed: int):
        # leading-zero count of a 40-bit uniform = Geometric(1/2);
        # integer-dividing by eps_bits thins it to Geometric(1 - alpha)
        h = F.pmod(portable_hash(cell_id, seed=seed), F.lit(1 << 40))
        return F.when(h == 0, F.lit(40)).otherwise(F.lit(40) - F.length(F.bin(h)))

    g1 = F.floor(geom(101).cast("bigint") / F.lit(eps_bits)).cast("bigint")
    g2 = F.floor(geom(102).cast("bigint") / F.lit(eps_bits)).cast("bigint")
    return cells.select(
        "key",
        "day",
        "n_true",
        (g1 - g2).cast("bigint").alias("noise"),
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.col("n_true") + g1 - g2).cast("bigint"),
        ).alias("n_released"),
    )


def ks_value_drift(
    events: DataFrame,
    n_buckets: int = 64,
    col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic of a numeric column
    between the first and second half of the observed day range — the
    distribution-shape companion to `psi_value_drift` (PSI sees binned
    mass shifts; KS sees the worst-case CDF gap at full resolution).

    D = max over observed values v of |F_ref(v) - F_cur(v)|, carried as
    the exact integer numerator |cum_ref(v)*n_cur - cum_cur(v)*n_ref|
    over the common denominator n_ref*n_cur (DECIMAL(38,0) — no float
    ever, so no summation-order slack and no overflow at 10^12 rows).
    Returns ONE row (n_ref, n_cur, at_value, d_num, ks_bp): the gap
    location (smallest value attaining the max), the exact numerator,
    and 10000*D. NULL values are excluded.

    Scale shape: the stream collapses to per-distinct-value (n_ref,
    n_cur) counts first (one shuffle, map-side combined); the global
    CDF prefix sums then run two-level — equal-width value buckets from
    a 1-row broadcast envelope, an in-bucket cumulative window
    partitioned BY bucket, and bucket offsets from a window over the
    n_buckets-row bucket aggregate (the same distributed-prefix-sum
    shape as pack_sequences, corpus.py) — so no window ever moves the
    distinct-value table to one task. The final argmax is a
    TakeOrdered(1), never a global sort."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("bigint")
    base = events.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("v"), day.alias("d")
    )
    env = base.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.expr("(min(d) + max(d) + 1) DIV 2").cast("bigint").alias("mid"),
    )
    nb = float(n_buckets)
    counts = (
        base.crossJoin(F.broadcast(env))
        .select(
            "v",
            F.expr(
                f"CASE WHEN vmax = vmin THEN 0 "
                f"ELSE least({n_buckets - 1}, CAST(floor((v - vmin) "
                f"/ ((vmax - vmin) / {nb})) AS INT)) END"
            ).alias("bkt"),
            (F.col("d") < F.col("mid")).alias("is_ref"),
        )
        .groupBy("bkt", "v")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("c_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("decimal(38,0)")
            .alias("c_cur"),
        )
    )
    in_bkt = Window.partitionBy("bkt").orderBy("v")
    local = (
        counts.withColumn("l_ref", F.sum("c_ref").over(in_bkt))
        .withColumn("l_cur", F.sum("c_cur").over(in_bkt))
    )
    bkt_tot = counts.groupBy("bkt").agg(
        F.sum("c_ref").alias("t_ref"), F.sum("c_cur").alias("t_cur")
    )
    off_w = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bkt_tot.select(
        "bkt",
        F.coalesce(F.sum("t_ref").over(off_w), F.lit(0).cast("decimal(38,0)"))
        .alias("o_ref"),
        F.coalesce(F.sum("t_cur").over(off_w), F.lit(0).cast("decimal(38,0)"))
        .alias("o_cur"),
    )
    tot_w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    totals = bkt_tot.select(
        F.sum("t_ref").over(tot_w).alias("n_ref"),
        F.sum("t_cur").over(tot_w).alias("n_cur"),
    ).limit(1)
    gaps = (
        local.join(F.broadcast(offs), "bkt")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            F.col("v").alias("at_value"),
            F.abs(
                (F.col("l_ref") + F.col("o_ref")) * F.col("n_cur")
                - (F.col("l_cur") + F.col("o_cur")) * F.col("n_ref")
            ).alias("d_num_dec"),
            (F.col("n_ref").cast("decimal(38,0)") * F.col("n_cur")).alias("den"),
        )
    )
    return (
        gaps.orderBy(F.col("d_num_dec").desc(), F.col("at_value").asc())
        .limit(1)
        .select(
            "n_ref",
            "n_cur",
            "at_value",
            F.col("d_num_dec").cast("bigint").alias("d_num"),
            F.expr("CAST((10000 * d_num_dec) DIV den AS BIGINT)").alias("ks_bp"),
        )
    )
