"""Drain-style log template mining over transcript turn text.

The reference ships raw lines to its sinks and leaves signature analysis
to whatever sits behind Elasticsearch (reference:
output/elasticsearch/elasticsearch.go:119-152 — bulk-index and done); a
100 TB log pipeline needs the mining INSIDE the engine: collapse the
variable parts of each line into a placeholder so billions of raw lines
reduce to a bounded template vocabulary, then aggregate per template.
The public designs this follows are SLCT (Vaarandi 2003) and Drain
(He et al., ICWS 2017); instead of Drain's incremental parse tree we use
the deterministic masking both papers start from (digit runs -> ``<#>``),
which makes the operator a pure projection — engine-portable,
oracle-checkable, and streaming-safe (stateless).

Scale shape: the masking is a row-local regexp projection (codegen,
zero exchange); the only shuffle in `log_template_mine` is the groupBy
on the TEMPLATE — a vocabulary that is bounded by log-format diversity,
not data volume — so map-side combine collapses each task's output to
(distinct templates/task) rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mask_template", "log_template_mine", "template_latency_profile"]


def mask_template(col: Column) -> Column:
    """Digit runs -> ``<#>``: 'seq=42 level=ERROR msg="evt-42"' and
    'seq=7 level=ERROR msg="evt-9"' mask to the same template. Pure
    projection; identical bytes in every engine."""
    return F.regexp_replace(col, "[0-9]+", "<#>")


def log_template_mine(turns: DataFrame, col: str = "text") -> DataFrame:
    """Mine the template vocabulary of a log stream: one row per masked
    template with volume (`n_lines`), spread (`n_convs`), and lifetime
    (`first_day` / `last_day` epoch-second day starts, `n_days` active).
    `first_day` IS the novelty signal: a template whose first_day is
    today is a brand-new log signature (new code path, new failure mode)
    — the downstream filter the Drain paper motivates.

    One map-side-combined aggregate onto the bounded template key."""
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("_day")
    )
    return (
        turns.filter(F.col(col).isNotNull())
        .select(mask_template(F.col(col)).alias("template"), "conv_id", day)
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
            F.min("_day").alias("first_day"),
            F.max("_day").alias("last_day"),
            F.countDistinct("_day").cast("bigint").alias("n_days"),
        )
    )


def template_latency_profile(turns: DataFrame) -> DataFrame:
    """Per-template latency SLO profile: exact discrete p50/p95 of the
    parsed `latency_ms` field grouped by the line's masked template,
    plus the line count. The per-signature latency distribution is what
    turns template mining from inventory into triage — "which log
    signature got slow" rather than "which endpoint".

    Exactness note: rides `exact_percentiles_disc`, whose shuffle and
    window carry one row per DISTINCT (template, latency) — integer
    latencies make that a histogram, not the data. For continuous
    measures at extreme scale use ops.sketch.hist_quantiles (documented
    approximate path)."""
    from ..parse import parse_turns
    from .sketch import exact_percentiles_disc

    base = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("latency_ms").isNotNull())
        .select(mask_template(F.col("text")).alias("template"), "latency_ms")
    )
    pct = exact_percentiles_disc(base, "template", "latency_ms", (0.5, 0.95))
    counts = base.groupBy("template").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    # template-keyed join of two already-bounded aggregates
    return counts.join(pct, "template").select(
        "template", "n_lines", "p50", "p95"
    )


def sre_triage_report(turns: DataFrame, recent_days: int = 7) -> DataFrame:
    """The flagship log-triage composition: one ranked-ready report per
    template joining volume/spread/lifetime (`log_template_mine`),
    latency SLO percentiles (`template_latency_profile`), error share,
    and a first-seen novelty flag. This is the "what changed, how bad,
    is it new" screen an on-call pulls first — assembled engine-side so
    only the bounded template vocabulary ever leaves the cluster.

    Returns (template, n_lines, n_convs, age_days, p50, p95, err_bp,
    is_new) — p50/p95 NULL for templates with no parsed latency; err_bp
    over lines with a parsed level; is_new = first seen within
    ``recent_days`` of the corpus's newest day.

    Scale shape: every stage aggregates onto the bounded template key
    before any join; the newest-day scalar broadcasts; joins are
    vocabulary-sized."""
    from ..parse import parse_turns

    t = log_template_mine(turns)
    lat = template_latency_profile(turns).select("template", "p50", "p95")
    err = (
        parse_turns(turns, with_attrs=False)
        .filter(F.col("level").isNotNull())
        .select(
            mask_template(F.col("text")).alias("template"),
            (F.col("level") == "ERROR").cast("int").alias("_e"),
        )
        .groupBy("template")
        .agg(
            F.expr("(sum(_e) * 10000) div count(1)").cast("bigint").alias("err_bp")
        )
    )
    newest = t.agg(F.max("last_day").alias("_newest"))
    cutoff = F.col("_newest") - (recent_days - 1) * 86400
    return (
        t.join(lat, "template", "left")
        .join(err, "template", "left")
        .crossJoin(F.broadcast(newest))
        .select(
            "template",
            "n_lines",
            "n_convs",
            F.expr("(_newest - first_day) div 86400").cast("bigint").alias(
                "age_days"
            ),
            "p50",
            "p95",
            "err_bp",
            (F.col("first_day") >= cutoff).cast("int").alias("is_new"),
        )
    )


def template_tail_sampling(
    turns: DataFrame, cap: int = 1000, seed: int = 0
) -> DataFrame:
    """Rare-signature-preserving log sampling (the "tail sampling" cost
    lever, public analogues: Honeycomb/OTel tail-based sampling): every
    line of a RARE template is kept; lines of templates above ``cap``
    occurrences are hash-gated at rate cap/df so each common template
    retains ~``cap`` lines in expectation. Rare failures survive intact
    while the bulk shrinks to a bounded per-signature budget.

    Returns every line with its verdict (counted, not dropped):
    (conv_id, turn_idx, template, df, rate_bp, kept).

    Design choice, scale-first: the gate is a per-line portable-hash
    test against a per-template rate (expected cap), NOT an exact
    row_number ≤ cap window — the dominant template holds most of the
    corpus, and a per-template window would route all of it through one
    task. The rate gate keeps the plan a broadcast join + stateless
    projection: the fact table never shuffles.

    Deterministic and engine-exact: rate_bp = min(10000,
    floor(cap·10000/df)); kept = pmod(md5-hash(conv_id|turn_idx), 10000)
    < rate_bp."""
    from ..hashing import portable_hash

    tpl = mask_template(F.col("text")).alias("template")
    lines = turns.filter(F.col("text").isNotNull()).select(
        "conv_id", "turn_idx", tpl
    )
    df_counts = lines.groupBy("template").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    rate = F.least(
        F.lit(10000).cast("bigint"), F.expr(f"({cap} * 10000) div df")
    )
    key = F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string"))
    bucket = F.pmod(portable_hash(key, seed), F.lit(10000))
    return (
        lines.join(F.broadcast(df_counts), "template")
        .withColumn("rate_bp", rate)
        .select(
            "conv_id",
            "turn_idx",
            "template",
            "df",
            "rate_bp",
            (bucket < F.col("rate_bp")).cast("int").alias("kept"),
        )
    )


def multiline_stitch(
    turns: DataFrame, anchor_pattern: str = r"^[^\s{]"
) -> DataFrame:
    """Filebeat-style multiline stitching (reference-adjacent: Beats'
    `multiline.pattern` config is the public design; the reference ships
    pre-framed lines and leaves stitching to the shipper): lines
    matching ``anchor_pattern`` START a record; non-matching lines
    (stack-trace continuations, wrapped JSON payloads) ATTACH to the
    most recent anchor in the same conversation, in arrival (turn_idx)
    order. Leading continuations with no anchor yet form group 0 —
    counted, not dropped.

    Returns (conv_id, group_id, n_lines, first_turn_idx, stitched) with
    `stitched` the newline-joined record, byte-exact (text-equality
    house rule).

    Scale shape: the anchor flag is a row-local regexp; the running
    anchor count is a window on the native conv key (frame bounded by
    conversation length); assembly is one aggregate on (conv_id, group)
    whose buffers are bounded by record length — a multiline record is
    a stack trace, not a corpus."""
    from pyspark.sql import Window

    is_anchor = F.col("text").rlike(anchor_pattern).cast("int")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = (
        turns.filter(F.col("text").isNotNull())
        .select("conv_id", "turn_idx", "text")
        .withColumn("group_id", F.sum(is_anchor).over(w).cast("bigint"))
    )
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return grouped.groupBy("conv_id", "group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("turn_idx").cast("bigint").alias("first_turn_idx"),
        F.concat_ws(
            "\n", F.transform(ordered, lambda s: s.getField("text"))
        ).alias("stitched"),
    )


def daily_top_templates(turns: DataFrame, k: int = 3) -> DataFrame:
    """Daily top-k template leaderboard ("today's loudest signatures"):
    rank templates within each day by line count, deterministic
    tie-break (count desc, template asc), keep rank ≤ k.

    Scale shape: one map-side-combined aggregate onto the bounded
    (day, template) key; the rank window runs over that bounded
    aggregate and Spark executes the filter as WindowGroupLimit (top-k
    pushdown), never materializing full ranks."""
    from pyspark.sql import Window

    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .cast("bigint")
    )
    cells = (
        turns.filter(F.col("text").isNotNull())
        .select(day.alias("day"), mask_template(F.col("text")).alias("template"))
        .groupBy("day", "template")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("n_lines").desc(), F.col("template").asc()
    )
    return (
        cells.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("day", "rnk", "template", "n_lines")
    )


def template_cooccurrence(turns: DataFrame) -> DataFrame:
    """Correlated-signature mining: which template PAIRS show up in the
    same conversations more often than chance — the "these two errors
    fire together" triage signal (co-occurring-alerts correlation is the
    public framing). Lift = P(both)/(P(a)·P(b)) in ×10000 fixed point,
    over distinct conversation presence.

    Returns (t1, t2, n_both, n_t1, n_t2, lift_x10000) for t1 < t2.

    Scale shape: the stream collapses to distinct (conv, template) first
    — map-side partial distinct, one shuffle on conv_id; the pair
    expansion is a self-equi-join on that SAME conv_id partitioning
    (co-located) and emits ≤ |vocabulary|² rows per conversation;
    marginals and the conversation total join back broadcast."""
    ct = (
        turns.filter(F.col("text").isNotNull())
        .select("conv_id", mask_template(F.col("text")).alias("t"))
        .distinct()
    )
    total = ct.select("conv_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_convs")
    )
    marg = ct.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    pairs = (
        ct.alias("a")
        .join(ct.alias("b"), "conv_id")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(marg.withColumnRenamed("t", "t1").withColumnRenamed("m", "n_t1")),
            "t1",
        )
        .join(
            F.broadcast(marg.withColumnRenamed("t", "t2").withColumnRenamed("m", "n_t2")),
            "t2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "n_both",
            "n_t1",
            "n_t2",
            F.expr("(n_both * _n_convs * 10000) div (n_t1 * n_t2)")
            .cast("bigint")
            .alias("lift_x10000"),
        )
    )


def template_params(turns: DataFrame) -> DataFrame:
    """Recovers what masking hides: per (template, parameter position),
    the distribution of the digit runs the mask collapsed — "parameter
    ranges per signature" (the follow-on analysis the Drain line of work
    runs on mined templates). Position is 1-based over the line's digit
    runs; runs that overflow BIGINT are dropped identically in both
    engines (try_cast).

    Returns (template, pos, n, n_distinct, min_val, max_val).

    Scale shape: extraction is a row-local regexp + posexplode; one
    map-side-combined aggregate onto the bounded (template, pos) key."""
    lines = turns.filter(F.col("text").isNotNull()).select(
        mask_template(F.col("text")).alias("template"),
        F.expr(r"regexp_extract_all(text, '[0-9]+', 0)").alias("_params"),
    )
    exploded = lines.select(
        "template", F.posexplode("_params").alias("_p0", "_v")
    ).select(
        "template",
        (F.col("_p0") + 1).cast("int").alias("pos"),
        F.expr("try_cast(_v AS BIGINT)").alias("val"),
    ).filter(F.col("val").isNotNull())
    return exploded.groupBy("template", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def sample_bias_audit(turns: DataFrame, cap: int = 200, seed: int = 0) -> DataFrame:
    """Honesty check on `template_tail_sampling`: per template, the
    Horvitz-Thompson estimate reconstructed FROM the kept sample
    (n_kept · 10000 / rate_bp) against the true count, with the bias in
    basis points — quantifying exactly what downstream aggregates lose
    by running on the sample (HT estimation is the public framing).

    Returns (template, n_true, n_kept, ht_estimate, bias_bp).

    Scale shape: rides the sampler's own output (broadcast rate join,
    no extra scan); one aggregate on the template key."""
    s = template_tail_sampling(turns, cap=cap, seed=seed)
    per = s.groupBy("template").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.max("rate_bp").alias("_rate"),
    )
    ht = F.expr("(n_kept * 10000) div _rate")
    # FLOOR division: bias is negative when the sample under-counts, and
    # floor matches DuckDB's // on both signs
    bias = F.floor((ht - F.col("n_true")) * 10000 / F.col("n_true")).cast("bigint")
    return per.select(
        "template",
        "n_true",
        "n_kept",
        ht.cast("bigint").alias("ht_estimate"),
        bias.alias("bias_bp"),
    )


def template_triangles(turns: DataFrame, min_both: int = 2) -> DataFrame:
    """Triangle census of the template co-occurrence graph: nodes are
    masked templates, edges are pairs sharing at least `min_both`
    conversations (the same distinct-presence edges as
    `template_cooccurrence`), and each template is scored by how many
    closed triangles it participates in — triangle density separates a
    CLUSTER of mutually-correlated failure signatures (one incident
    class) from a star around one noisy template. Completes the graph
    family (PageRank / label propagation / k-hop / CC) with the classic
    clustering-coefficient numerator.

    Returns (template, n_triangles) for templates in ≥1 triangle.

    Scale shape: volume collapses to distinct (conv, template) first;
    edges are vocabulary-bounded (≤ |V|²), and the triangle join is the
    standard ordered two-path + closing-edge plan (a<b<c) over that
    bounded edge set — never over raw rows."""
    ct = (
        turns.filter(F.col("text").isNotNull())
        .select("conv_id", mask_template(F.col("text")).alias("t"))
        .distinct()
    )
    edges = (
        ct.alias("a")
        .join(ct.alias("b"), "conv_id")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("u"), F.col("b.t").alias("v"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_both)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("template"))
        .groupBy("template")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return per
