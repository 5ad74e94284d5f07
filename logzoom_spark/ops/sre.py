"""SRE-style alerting analytics over parsed log turns.

The reference stops at shipping lines to sinks (reference: output/
elasticsearch/elasticsearch.go, output/s3/s3.go — no in-engine alerting);
at 100 TB the alert math has to run where the data is. Three public
designs re-expressed Spark-first:

- `burn_rate_alerts` — the multiwindow, multi-burn-rate SLO alert from
  the Google SRE Workbook (ch. 5, "Alerting on SLOs", public): page only
  when BOTH a short and a long window burn the error budget faster than
  a factor, killing flappy single-window alerts.
- `latency_regression` — day-over-day exact-p95 shift per log_type; the
  "which signature got slow yesterday" triage query.
- `flap_suppress` — cooldown-based alert de-duplication: after an alert
  fires for a key, suppress repeats until `cooldown_s` has elapsed SINCE
  THE LAST EMITTED alert (a running, decision-dependent scan — not a
  fixed-bucket dedup, which `window_dedup_first` already covers).

Integer discipline throughout: ratios ship as ×100/×10000 BIGINTs so
every engine computes identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["burn_rate_alerts", "latency_regression", "flap_suppress"]


def burn_rate_alerts(
    turns: DataFrame,
    short_s: int = 3600,
    long_s: int = 86400,
    slo_den: int = 4,
    factor_x100: int = 150,
) -> DataFrame:
    """Multiwindow multi-burn-rate SLO alert (SRE Workbook ch. 5).

    The error budget is ``1/slo_den`` (slo_den=4 → 25% of lines may be
    level=ERROR). Burn rate = observed error ratio ÷ budget; a short
    window (fast detection) and its enclosing long window (sustained
    burn) must BOTH exceed ``factor_x100``/100 to page.

    Returns one row per short window:
    (window_start, n_short, err_short, burn_short_x100, burn_long_x100,
    page) — burn columns are floor(rate·100) BIGINTs, page ∈ {0,1}.

    Scale shape: two map-side-combined aggregates onto bounded time-bucket
    keys; the long side is broadcast-sized (windows/epoch, not rows) so
    the alignment join never shuffles the short side twice."""
    from ..parse import parse_turns

    base = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("level").isNotNull())
        .select(
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("_ep"),
            (F.col("level") == "ERROR").cast("int").alias("_err"),
        )
    )
    sw = (F.floor(F.col("_ep") / short_s) * short_s).cast("bigint")
    lw = (F.floor(F.col("_ep") / long_s) * long_s).cast("bigint")
    short = base.groupBy(sw.alias("window_start")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_short"),
        F.sum("_err").cast("bigint").alias("err_short"),
    )
    long = base.groupBy(lw.alias("_lw")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_nl"),
        F.sum("_err").cast("bigint").alias("_el"),
    )
    parent = (F.floor(F.col("window_start") / long_s) * long_s).cast("bigint")
    j = short.join(
        F.broadcast(long), parent == F.col("_lw"), "left"
    )
    burn_s = F.expr(f"(err_short * {slo_den} * 100) div n_short")
    burn_l = F.expr(f"(_el * {slo_den} * 100) div _nl")
    return j.select(
        "window_start",
        "n_short",
        "err_short",
        burn_s.alias("burn_short_x100"),
        burn_l.alias("burn_long_x100"),
        (
            (burn_s >= factor_x100) & (burn_l >= factor_x100)
        ).cast("int").alias("page"),
    )


def latency_regression(
    turns: DataFrame, threshold_bp: int = 2000
) -> DataFrame:
    """Day-over-day exact-p95 latency shift per log_type: flags a day
    whose p95 rose ≥ ``threshold_bp`` basis points over the PREVIOUS
    OBSERVED day. First observed day per log_type has no baseline and is
    emitted with NULLs (counted, not dropped).

    Returns (log_type, day, n_lines, p95, prev_p95, delta_bp, regressed).

    Scale shape: the percentile rides the (log_type, day, latency)
    histogram (`exact_percentiles_disc`); the lag window runs over the
    bounded per-day aggregate, never the rows."""
    from ..parse import parse_turns
    from .sketch import exact_percentiles_disc
    from pyspark.sql import Window

    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
    )
    base = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("latency_ms").isNotNull() & F.col("log_type").isNotNull())
        .select(
            F.concat_ws("|", F.col("log_type"), day.cast("string")).alias("_g"),
            "log_type",
            day.alias("day"),
            "latency_ms",
        )
    )
    pct = exact_percentiles_disc(base, "_g", "latency_ms", (0.95,)).select(
        "_g", F.col("p95")
    )
    counts = base.groupBy("_g", "log_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    daily = counts.join(pct, "_g").drop("_g")
    w = Window.partitionBy("log_type").orderBy("day")
    prev = F.lag("p95").over(w)
    # FLOOR division, not `div`: deltas go negative when p95 improves, and
    # Spark's `div` truncates toward zero while floor matches DuckDB `//`
    delta = F.floor((F.col("p95") - F.col("prev_p95")) * 10000 / F.col("prev_p95")).cast(
        "bigint"
    )
    return (
        daily.withColumn("prev_p95", prev)
        .withColumn("delta_bp", delta)
        .withColumn(
            "regressed",
            F.when(F.col("prev_p95").isNull(), F.lit(None).cast("int")).otherwise(
                (F.col("delta_bp") >= threshold_bp).cast("int")
            ),
        )
        .select(
            "log_type", "day", "n_lines", "p95", "prev_p95", "delta_bp", "regressed"
        )
    )


def flap_suppress(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    ts_col: str = "ts",
    cooldown_s: int = 14400,
) -> DataFrame:
    """Cooldown flap suppression: within each key, emit a row iff at
    least ``cooldown_s`` elapsed since the LAST EMITTED row — a running,
    decision-dependent scan (kept(i) depends on which earlier rows were
    kept), which no fixed-bucket dedup reproduces. Alertmanager's
    `repeat_interval` is the public analogue.

    All rows come back with a `kept` flag (suppressed rows are counted,
    never dropped — house rule). Order inside a key is (ts_us,
    *order_cols) for engine-identical tie-breaks.

    Scale shape: the ONLY legitimate per-row sequential state in this
    module — implemented as applyInPandas partitioned by key, so each
    key's scan is a single Arrow-batched pass and keys parallelize
    across executors. A key's alert history fits memory by construction
    (alerts, not raw lines). The DuckDB oracle replays the same scan as
    a recursive CTE — see oracles.py `flap_suppress_errors`."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cool_us = int(cooldown_s) * 1_000_000
    keys = list(key_cols)
    order = list(order_cols)
    inp = df.select(*keys, *order, ts_us.alias("ts_us"))
    out_schema = T.StructType(
        [inp.schema[c] for c in keys + order]
        + [
            T.StructField("ts_us", T.LongType()),
            T.StructField("kept", T.IntegerType()),
        ]
    )

    def scan(pdf):
        pdf = pdf.sort_values(["ts_us"] + order, kind="mergesort").reset_index(
            drop=True
        )
        kept = []
        last = None
        for t in pdf["ts_us"]:
            ok = last is None or t >= last + cool_us
            kept.append(1 if ok else 0)
            if ok:
                last = t
        pdf["kept"] = kept
        return pdf[keys + order + ["ts_us", "kept"]]

    return inp.groupBy(*keys).applyInPandas(scan, out_schema)


def sli_attainment(
    turns: DataFrame,
    latency_slo_ms: int = 1000,
    objective_bp: int = 5000,
) -> DataFrame:
    """Per-(log_type, day) SLI attainment: the fraction of lines whose
    parsed latency meets the SLO threshold, in basis points, with a
    breach flag against the objective. This is the SLI the burn-rate
    alert consumes upstream (SRE Workbook ch. 2/5 split: SLI here,
    alerting policy in `burn_rate_alerts`).

    Returns (log_type, day, n_lines, n_good, sli_bp, breach).
    One map-side-combined aggregate on the bounded (log_type, day) key."""
    from ..parse import parse_turns

    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
    )
    base = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("latency_ms").isNotNull() & F.col("log_type").isNotNull())
        .select(
            "log_type",
            day.alias("day"),
            (F.col("latency_ms") <= latency_slo_ms).cast("int").alias("_good"),
        )
    )
    return base.groupBy("log_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("_good").cast("bigint").alias("n_good"),
        F.expr("(sum(_good) * 10000) div count(1)").cast("bigint").alias("sli_bp"),
        (F.expr("(sum(_good) * 10000) div count(1)") < objective_bp)
        .cast("int")
        .alias("breach"),
    )


def incident_mttr(turns: DataFrame) -> DataFrame:
    """Mean-time-to-recovery per log_type: each ERROR line's recovery is
    the EARLIEST event-time INFO line that arrives later in the same
    conversation (arrival order = turn_idx); ttr = recovery − error in
    seconds (raw event-time difference — negative under event-time
    disorder, which `lateness_audit` measures; unresolved errors are
    counted, not dropped).

    Returns (log_type, n_errors, n_resolved, total_ttr_s, mean_ttr_s,
    max_ttr_s) — mean is floor(total/resolved), NULL when nothing
    resolved.

    Scale shape: one window on the native conv key (frame bounded by
    conversation length), then a rollup onto the bounded log_type key."""
    from pyspark.sql import Window

    from ..parse import parse_turns

    ep = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    p = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("level").isNotNull() & F.col("log_type").isNotNull())
        .select("conv_id", "turn_idx", "log_type", "level", ep.alias("_ep"))
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    rec = F.min(
        F.when(F.col("level") == "INFO", F.col("_ep"))
    ).over(w)
    errs = (
        p.withColumn("_rec", rec)
        .filter(F.col("level") == "ERROR")
        .withColumn("_ttr", F.col("_rec") - F.col("_ep"))
    )
    return errs.groupBy("log_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_errors"),
        F.sum(F.col("_ttr").isNotNull().cast("int")).cast("bigint").alias(
            "n_resolved"
        ),
        F.sum("_ttr").cast("bigint").alias("total_ttr_s"),
        F.when(
            F.sum(F.col("_ttr").isNotNull().cast("int")) > 0,
            F.floor(
                F.sum("_ttr") / F.sum(F.col("_ttr").isNotNull().cast("int"))
            ),
        )
        .cast("bigint")
        .alias("mean_ttr_s"),
        F.max("_ttr").cast("bigint").alias("max_ttr_s"),
    )


def changepoint_error_rate(turns: DataFrame) -> DataFrame:
    """Deterministic two-window changepoint score over the daily error
    rate (the integer-exact core of CUSUM / E-divisive-style detection;
    Matteson & James 2014 is the public framing): for each candidate
    boundary day t, split the corpus into days < t and days ≥ t and
    score |error_bp(before) − error_bp(after)|. The max-scoring day is
    the regime change; every candidate is emitted with its evidence so
    the picker is a trivial downstream max.

    Returns (day, n_before, n_after, err_bp_before, err_bp_after,
    score_bp) — days with an empty BEFORE side (the first observed day)
    carry NULLs, counted not dropped.

    Scale shape: the facts collapse to one row per day first
    (map-side-combined); the bidirectional cumulative windows run over
    that bounded daily aggregate only."""
    from pyspark.sql import Window

    from ..parse import parse_turns

    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
    )
    daily = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("level").isNotNull())
        .select(day.alias("day"), (F.col("level") == "ERROR").cast("int").alias("_e"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_e").cast("bigint").alias("_err"),
        )
    )
    w_before = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_after = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    nb = F.sum("_n").over(w_before)
    eb = F.sum("_err").over(w_before)
    na = F.sum("_n").over(w_after)
    ea = F.sum("_err").over(w_after)
    return (
        daily.withColumn("n_before", nb)
        .withColumn("_eb", eb)
        .withColumn("n_after", na)
        .withColumn("_ea", ea)
        .withColumn(
            "err_bp_before",
            F.when(
                F.col("n_before").isNotNull(),
                F.expr("(_eb * 10000) div n_before"),
            ).cast("bigint"),
        )
        .withColumn(
            "err_bp_after", F.expr("(_ea * 10000) div n_after").cast("bigint")
        )
        .withColumn(
            "score_bp",
            F.abs(F.col("err_bp_after") - F.col("err_bp_before")).cast("bigint"),
        )
        .select(
            "day", "n_before", "n_after",
            "err_bp_before", "err_bp_after", "score_bp",
        )
    )


def error_run_lengths(turns: DataFrame) -> DataFrame:
    """Sustained-failure detector: the longest CONSECUTIVE run of ERROR
    lines per conversation (arrival order), via the gaps-and-islands
    identity (turn rank − error rank is constant within a run). A
    10-error streak is an outage; 10 scattered errors are blips — counts
    alone can't tell them apart.

    Returns (conv_id, n_lines, n_errors, n_error_runs, max_error_run).

    Scale shape: two windows on the native conv key (frame bounded by
    conversation length), then one rollup per conversation."""
    from pyspark.sql import Window

    from ..parse import parse_turns

    p = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("level").isNotNull())
        .select("conv_id", "turn_idx", (F.col("level") == "ERROR").alias("_e"))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    we = Window.partitionBy("conv_id", "_e").orderBy("turn_idx")
    runs = p.withColumn(
        "_island", F.row_number().over(w) - F.row_number().over(we)
    )
    per_run = (
        runs.filter(F.col("_e"))
        .groupBy("conv_id", "_island")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_len"))
    )
    run_stats = per_run.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_error_runs"),
        F.max("_len").alias("max_error_run"),
        F.sum("_len").cast("bigint").alias("n_errors"),
    )
    totals = p.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    return totals.join(run_stats, "conv_id", "left").select(
        "conv_id",
        "n_lines",
        F.coalesce("n_errors", F.lit(0).cast("bigint")).alias("n_errors"),
        F.coalesce("n_error_runs", F.lit(0).cast("bigint")).alias("n_error_runs"),
        F.coalesce("max_error_run", F.lit(0).cast("bigint")).alias(
            "max_error_run"
        ),
    )


def ewma_rate_alerts(
    events: DataFrame,
    horizon: int = 16,
    threshold_x: int = 3,
) -> DataFrame:
    """EWMA-baseline volume alerts, integer-exact: each observed day's
    event count is compared against an exponentially-weighted baseline
    of the previous `horizon` OBSERVED days (weight 2^-j for the j-th
    day back, scaled by 2^horizon so everything stays BIGINT — the
    truncated power series of the classic EWMA recursion). A day alerts
    when count × norm > threshold_x × baseline, i.e. count exceeds
    threshold_x × the weighted mean. Days without any history never
    alert (norm = 0) — counted, not dropped.

    Returns (day_no, n, baseline_x, norm_x, is_alert).

    Scale shape: volume collapses to the per-day grid first (calendar-
    bounded); the `horizon` lag columns run in ONE window over that
    bounded grid. The no-partition window is over days, not data — the
    same bounded-aggregate exception as the histogram cut-point
    windows (documented there)."""
    from pyspark.sql import Window as W

    if horizon < 1 or horizon > 62 or threshold_x < 1:
        raise ValueError(
            f"need 1 <= horizon <= 62 and threshold_x >= 1, got {horizon}/{threshold_x}"
        )
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint")
    grid = events.groupBy(day.alias("day_no")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = W.orderBy("day_no")
    baseline = None
    norm = None
    for j in range(1, horizon + 1):
        weight = 1 << (horizon - j)
        term = F.coalesce(F.lag("n", j).over(w) * weight, F.lit(0))
        have = F.when(F.lag("n", j).over(w).isNotNull(), weight).otherwise(0)
        baseline = term if baseline is None else baseline + term
        norm = have if norm is None else norm + have
    scored = grid.select(
        "day_no",
        "n",
        baseline.cast("bigint").alias("baseline_x"),
        norm.cast("bigint").alias("norm_x"),
    )
    return scored.select(
        "day_no",
        "n",
        "baseline_x",
        "norm_x",
        (
            (F.col("norm_x") > 0)
            & (F.col("n") * F.col("norm_x") > threshold_x * F.col("baseline_x"))
        )
        .cast("int")
        .alias("is_alert"),
    )
