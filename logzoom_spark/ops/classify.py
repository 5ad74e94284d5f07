"""Hashed-feature linear text classifier — the model-based filtering
stage of a training-data pipeline (fastText-style quality / language
classifiers a la CCNet: fit a cheap linear model on weak or held-out
labels, score the whole corpus, filter on the verdict).

Spark-first shapes:
- **features** (`_doc_buckets`): per-doc DISTINCT hashed token buckets
  (Bernoulli presence features, hashing trick caps the dimensionality at
  ``n_buckets`` regardless of vocabulary). Computed ROW-LOCALLY —
  ``array_distinct(transform(filter(split(text))))`` inside whole-stage
  codegen, then a narrow explode — so feature extraction itself is
  ZERO shuffle at any corpus size.
- **fit** (`classifier_fit`): one ``groupBy(bucket)`` whose partial
  aggregates collapse each partition to ≤ n_buckets rows before the
  exchange — the fit shuffle is BOUNDED by the feature space, not the
  corpus. The weight table (≤ n_buckets rows) is broadcastable by
  construction.
- **serve** (`classifier_score`): broadcast hash join against the weight
  table + one map-side-combinable ``groupBy(doc_id)``; the only
  row-scaled exchange carries (doc_id, count, sum) partials.

Determinism (oracle-exact in any engine): weights are fixed-point
integer evidence, ``w = (pos+1)·SCALE DIV (pos+neg+2)`` — the
Laplace-smoothed P(label | feature present) on a 10^6 grid; a doc's
score is the integer mean of its features' evidence (unseen buckets
take the uninformative prior SCALE/2), and the default verdict compares
it against the model's stored intercept — the train base rate, kept as
the sentinel bucket -1 in the same weights table. No logs, no floats: summing
trained log-odds weights would serve through the IDENTICAL plan (inject
them via the same bounded weights table), but fixed-point evidence
keeps the full fit→serve pipeline value-matchable against a DuckDB
twin. Token bucketing uses the portable 60-bit md5 hash both engines
compute identically (hashing.py).

No reference analog (logzoom has no model surface); extends the
training-data operator set mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import portable_hash

SCALE = 1_000_000


def _bucket_array(n_buckets: int, seed: int, text_col: str):
    """Row-local distinct feature buckets of a text column (array<bigint>
    inside whole-stage codegen) — the shared feature definition of every
    fit/serve path, so their memberships can never drift."""
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    return F.array_distinct(
        F.transform(
            F.filter(toks, lambda t: t != ""),
            lambda t: portable_hash(t, seed) % n_buckets,
        )
    )


def _doc_buckets(
    docs: DataFrame,
    n_buckets: int,
    seed: int,
    text_col: str,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep, bucket): one row per distinct (doc, feature
    bucket). The distinct is row-local (array_distinct before the
    explode), so this is a pure projection — docs with no tokens
    (empty/NULL text) yield no rows and are re-attached by the caller."""
    return docs.select(
        "doc_id",
        *keep,
        F.explode(_bucket_array(n_buckets, seed, text_col)).alias("bucket"),
    )


def classifier_fit(
    docs: DataFrame,
    label_col: Column | str,
    n_buckets: int = 1024,
    seed: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, w): fixed-point evidence weights from a labeled corpus.
    ``label_col`` is a boolean column/name; ``w`` estimates
    P(label | bucket present) as (pos+1)·SCALE DIV (pos+neg+2), exact
    BIGINT. The result is bounded (≤ n_buckets rows) — persist it and
    broadcast at serve time."""
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    labeled = docs.withColumn("__y", y.cast("boolean"))
    fb = _doc_buckets(labeled, n_buckets, seed, text_col, keep=("__y",))
    evidence = F.expr(f"((pos + 1) * {SCALE}) DIV (n + 2)").alias("w")
    weights = fb.groupBy("bucket").agg(
        F.sum(F.col("__y").cast("bigint")).alias("pos"),
        F.count(F.lit(1)).alias("n"),
    ).select("bucket", evidence)
    # the model's intercept: the label base rate over the TRAIN DOCS,
    # stored as the sentinel bucket -1 (real buckets live in
    # [0, n_buckets), so it can never be matched by a feature) — the way
    # NB serializes its prior next to its conditionals. Serving compares
    # evidence against it: posterior above base rate ⇔ predict positive.
    prior = labeled.agg(
        F.sum(F.col("__y").cast("bigint")).alias("pos"),
        F.count(F.lit(1)).alias("n"),
    ).select(F.lit(-1).alias("bucket"), evidence)
    return weights.unionByName(prior)


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1024,
    seed: int = 0,
    text_col: str = "text",
    threshold: int | None = None,
) -> DataFrame:
    """(doc_id, n_feats, score_fp, pred): integer mean evidence per doc
    and the verdict. The default threshold is the model's own stored
    prior (the bucket=-1 intercept row): mean evidence above the train
    base rate ⇔ more-likely-positive-than-average — the NB-correct
    comparison, and the one that stays meaningful when the feature
    evidence is weak and scores hug the base rate. Pass an int to
    override (e.g. SCALE//2 for an absolute posterior cut). Buckets the
    fit never saw score the uninformative prior SCALE/2; a weights table
    with no intercept row keeps every score and yields NULL preds (the
    inline path raises instead — it can check eagerly). Docs with NO
    features (empty/NULL text) are KEPT — counted-not-dropped policy —
    with n_feats=0 and NULL score/pred (unknowable, not false)."""
    fb = _doc_buckets(docs, n_buckets, seed, text_col)
    sc = (
        fb.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("w"), F.lit(SCALE // 2))).alias("s"),
        )
        .select("doc_id", "n_feats", F.expr("s DIV n_feats").alias("score_fp"))
    )
    if threshold is None:
        # an aggregate is ALWAYS one row (NULL __thr when the intercept is
        # absent), so a weights table missing bucket=-1 yields NULL preds
        # with scores intact — a filter().crossJoin() would instead come
        # back EMPTY and silently zero every doc's features
        thr_df = weights.agg(
            F.max(F.when(F.col("bucket") == -1, F.col("w"))).alias("__thr")
        )
        sc = sc.crossJoin(F.broadcast(thr_df))
        thr_col = F.col("__thr")
    else:
        thr_col = F.lit(int(threshold))
    return docs.select("doc_id").join(sc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        "score_fp",
        F.when(
            F.col("score_fp").isNotNull(), F.col("score_fp") >= thr_col
        ).alias("pred"),
    )


def classifier_score_inline(
    docs: DataFrame,
    weights: DataFrame | dict[int, int],
    n_buckets: int = 1024,
    seed: int = 0,
    text_col: str = "text",
    threshold: int | None = None,
) -> DataFrame:
    """Zero-shuffle serve: same output contract as ``classifier_score``
    ((doc_id, n_feats, score_fp, pred)) but the bounded weight table is
    inlined as a map literal and the whole scorer is a STATELESS
    PROJECTION — no explode, no join, no aggregation. That makes it
    (a) the cheapest batch plan (one scan, zero exchanges) and (b) legal
    on a Structured Streaming DataFrame unchanged, which is the standing
    model-gate deployment: fit offline, score every arriving doc at
    ingest. A pytest proves row-identical output vs the join-based path.

    Accepts the ``classifier_fit`` DataFrame (collected here — bounded,
    ≤ n_buckets+1 rows, the trained-centroids pattern; collecting a
    STREAM is impossible, so pass the dict form when composing
    stream-on-stream) or a pre-collected ``{bucket: w}`` dict. The
    intercept (bucket -1) must be present unless ``threshold`` is
    given."""
    if isinstance(weights, DataFrame):
        weights = {int(r["bucket"]): int(r["w"]) for r in weights.collect()}
    if threshold is None:
        if -1 not in weights:
            raise ValueError(
                "weights carry no bucket=-1 intercept; fit with "
                "classifier_fit or pass threshold= explicitly"
            )
        threshold = int(weights[-1])
    entries = [
        F.lit(x).cast("bigint")
        for b, w in sorted(weights.items())
        if b >= 0
        for x in (int(b), int(w))
    ]
    if entries:
        wmap = F.create_map(*entries)
        look = lambda b: F.coalesce(  # noqa: E731
            F.element_at(wmap, b), F.lit(SCALE // 2).cast("bigint")
        )
    else:  # degenerate fit (no featureful train docs): pure prior
        look = lambda b: F.lit(SCALE // 2).cast("bigint")  # noqa: E731
    scores = F.transform(_bucket_array(n_buckets, seed, text_col), look)
    return (
        docs.select("doc_id", scores.alias("__sc"))
        .select(
            "doc_id",
            F.size("__sc").cast("bigint").alias("n_feats"),
            F.aggregate(
                "__sc", F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("__s"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.expr("CASE WHEN n_feats > 0 THEN __s DIV n_feats END").alias(
                "score_fp"
            ),
            F.when(
                F.col("n_feats") > 0,
                F.expr("__s DIV n_feats") >= F.lit(int(threshold)),
            ).alias("pred"),
        )
    )


def classifier_confusion(
    scored: DataFrame, docs: DataFrame, label_col: Column | str
) -> DataFrame:
    """(label, pred, n_docs): the evaluation rollup — join predictions
    back to truth and count the confusion cells (NULL pred = unscorable
    docs get their own row). One bounded groupBy."""
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    truth = docs.select("doc_id", y.cast("boolean").alias("label"))
    return (
        scored.join(truth, "doc_id")
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def classifier_auc(
    scored: DataFrame, docs: DataFrame, label_col: Column | str
) -> DataFrame:
    """Threshold-free ranking evaluation: exact ROC-AUC of the classifier
    score against truth via the Mann-Whitney rank statistic, computed in
    integer basis points. AUC = P(score_pos > score_neg) + (1/2)P(tie) =
    [ sum over distinct scores s of pos_s * (2*cum_neg_below(s) + neg_s) ]
    / (2 * P * N) — the grouped-histogram form, so ties are handled
    exactly (each tied pair contributes 1/2) without any float ranks.

    Returns ONE row (n_pos, n_neg, n_unscored, auc_bp); unscorable docs
    (NULL score — no features) are counted, not silently dropped.

    Scale shape: one groupBy on the integer score (bounded: score_fp
    lives in [0, SCALE], so the histogram is at most SCALE+1 rows no
    matter the corpus size), then the cumulative window and final rollup
    run over that bounded aggregate only — the same bounded-window
    discipline as pack_sequences' bucket prefix sum. The numerator is <
    2*P*N*10000, within BIGINT up to ~10^7 docs per class; beyond that
    cast the histogram counts to DECIMAL(38,0)."""
    from pyspark.sql import Window

    y = F.col(label_col) if isinstance(label_col, str) else label_col
    truth = docs.select("doc_id", y.cast("boolean").alias("_y"))
    joined = scored.join(truth, "doc_id")
    hist = (
        joined.filter(F.col("score_fp").isNotNull())
        .groupBy("score_fp")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("bigint").alias("pos"),
            F.sum(F.when(F.col("_y"), 0).otherwise(1)).cast("bigint").alias("neg"),
        )
    )
    cum = Window.orderBy("score_fp").rowsBetween(Window.unboundedPreceding, -1)
    unscored = joined.filter(F.col("score_fp").isNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unscored")
    )
    return (
        hist.withColumn("cneg", F.coalesce(F.sum("neg").over(cum), F.lit(0)))
        .agg(
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum("neg").cast("bigint").alias("n_neg"),
            F.sum(F.col("pos") * (2 * F.col("cneg") + F.col("neg")))
            .cast("bigint")
            .alias("_num"),
        )
        .crossJoin(F.broadcast(unscored))
        .select(
            "n_pos",
            "n_neg",
            "n_unscored",
            # DECIMAL(38,0) operands: _num ≈ 2·P·N would overflow BIGINT
            # past ~10^7 docs per class; the histogram is bounded so the
            # wide-decimal arithmetic costs nothing (the ks_value_drift
            # discipline)
            F.expr(
                "CASE WHEN n_pos > 0 AND n_neg > 0 "
                "THEN CAST((10000 * CAST(_num AS DECIMAL(38,0))) "
                "DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"
            ).alias("auc_bp"),
        )
    )


def calibration_curve(
    scored: DataFrame,
    docs: DataFrame,
    label_col: Column | str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for the classifier: scores binned into
    equal-width slices of the [0, SCALE] fixed-point range; per bin the
    empirical positive rate vs the mean predicted score — a calibrated
    model tracks the diagonal (pos_bp ~ mean_score_fp/100 for
    SCALE = 1e6). Complements `classifier_auc` (ranking) with the
    probability-quality view used to pick filtering thresholds.

    Returns (bin, n, n_pos, pos_bp, mean_score_fp), integer-exact;
    unscorable docs (NULL score) are excluded here — they carry no
    probability to calibrate (classifier_auc counts them). Bins are
    equal-width over the OBSERVED [min, max] score (a Laplace-smoothed
    mean-of-evidence score concentrates near the prior, so fixed
    [0, SCALE] bins would collapse the whole corpus into one cell);
    the envelope comes from a 1-row broadcast aggregate.

    Scale shape: one row-local bin projection + an n_bins-key map-side-
    combined rollup; nothing else moves."""
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    truth = docs.select("doc_id", y.cast("boolean").alias("_y"))
    pts = scored.filter(F.col("score_fp").isNotNull()).join(truth, "doc_id")
    env = pts.agg(
        F.min("score_fp").alias("_smin"), F.max("score_fp").alias("_smax")
    )
    return (
        pts.crossJoin(F.broadcast(env))
        .select(
            F.expr(
                f"least({n_bins - 1}, "
                f"CAST(((score_fp - _smin) * {n_bins}) "
                f"DIV (_smax - _smin + 1) AS INT))"
            ).alias("bin"),
            "score_fp",
            "_y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
            F.sum("score_fp").cast("bigint").alias("_s"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("CAST((n_pos * 10000) DIV n AS BIGINT)").alias("pos_bp"),
            F.expr("CAST(_s DIV n AS BIGINT)").alias("mean_score_fp"),
        )
    )


def loo_target_encode(
    events: DataFrame,
    key_col: str = "event_type",
    target_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    feature for downstream models: each row's encoding is the mean
    target of its OWN group EXCLUDING the row itself, enc = (sum_g - x)
    / (n_g - 1). Plain group-mean encoding leaks the row's own label
    into its feature; LOO is the standard counter (public art:
    Micci-Barreca, SIGKDD Explorations 2001).

    Integer-exact: targets as floor(x*100) cents, encoding as truncating
    integer division (numerator is non-negative for non-negative
    targets; both engines truncate toward zero). Rows with a NULL
    target, or in a singleton group, get NULL enc — counted, not
    dropped.

    Returns (id_col, key_col, target_cents, enc_cents).

    Scale shape: one map-side-combined (key) rollup joined back on the
    key — broadcast when the key domain is dim-sized (event types), a
    plain shuffled equi-join when it is not; the fact table is scanned
    once per side."""
    c = F.floor(F.col(target_col) * 100).cast("bigint")
    base = events.select(F.col(id_col), F.col(key_col), c.alias("target_cents"))
    g = base.filter(F.col("target_cents").isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("target_cents").cast("bigint").alias("_s"),
    )
    return base.join(F.broadcast(g), key_col, "left").select(
        id_col,
        key_col,
        "target_cents",
        F.expr(
            "CASE WHEN target_cents IS NULL OR _n IS NULL OR _n <= 1 THEN NULL "
            "ELSE CAST((_s - target_cents) DIV (_n - 1) AS BIGINT) END"
        ).alias("enc_cents"),
    )


def mi_feature_rank(docs: DataFrame, label: Column) -> DataFrame:
    """Mutual information I(X; Y) in micro-nats between each candidate
    categorical feature and a boolean label — the feature-selection
    ranking run before fitting `classifier_fit` (high-MI features carry
    signal; near-zero ones are hash-bucket noise).

    Features are fixed, engine-portable projections of the document row:
    `source` (native), `len_bucket` (n_chars div 512), `has_digit`
    (regexp on text; NULL text is its own level). I(X;Y) =
    Σ_cells (n_xy/n)·ln(n_xy·n / (n_x·n_y)); each cell's term is
    floor-quantized to 1e-6 nats BEFORE summation (the
    summation-order-proof discipline of psi_value_drift — cell terms can
    be negative, and floor is floor in both engines, not
    truncation).

    Returns (feature, n_levels, mi_micro) ranked descending. MI is
    non-negative in exact math; the quantized total can dip a few
    micro-nats below zero for an independent pair, which is itself the
    correct \"no signal\" reading.

    Scale shape: ONE scan — the three features leave the row as a
    row-local stack() (3 rows per doc, no self-union rescans); one
    map-side-combined groupBy on (feature, level, y); every marginal
    re-aggregates the cell table (bounded by Σ levels · 2), and the
    final sum is per-feature over that same bounded frame."""
    y = F.coalesce(label, F.lit(False)).alias("y")
    feats = docs.select(
        F.expr(
            "stack(3, "
            " 'source', coalesce(source, '<null>'), "
            " 'len_bucket', coalesce(cast(n_chars div 512 AS STRING), '<null>'), "
            " 'has_digit', CASE WHEN text IS NULL THEN '<null>' "
            "              WHEN text rlike '[0-9]' THEN '1' ELSE '0' END "
            ") AS (feature, level)"
        ),
        y,
    )
    cells = feats.groupBy("feature", "level", "y").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n_xy")
    )
    lv = cells.groupBy("feature", "level").agg(F.sum("n_xy").alias("n_x"))
    yy = cells.groupBy("feature", "y").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.groupBy("feature").agg(
        F.sum("n_xy").alias("n"),
        F.countDistinct("level").alias("n_levels"),
    )
    terms = (
        cells.join(lv, ["feature", "level"])
        .join(yy, ["feature", "y"])
        .join(F.broadcast(tot), "feature")
        .select(
            "feature",
            "n_levels",
            F.expr(
                "CAST(floor(1000000.0d * (CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))"
                " * ln(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)"
                "      / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    return (
        terms.groupBy("feature", "n_levels")
        .agg(F.sum("term_micro").cast("bigint").alias("mi_micro"))
        .orderBy(F.col("mi_micro").desc(), F.col("feature").asc())
    )
