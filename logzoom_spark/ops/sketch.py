"""Deterministic sketches: distinct-count estimation with exact
cross-engine reproducibility.

Standard HLL sketches (``approx_count_distinct``) are implementation-
defined — two engines give different estimates, so they can't be
value-verified. A **KMV (k-minimum-values) sketch** over the portable hash
(hashing.py) has none of that slack: the k smallest 60-bit hashes of a set
are a pure function of the set, so the kth-minimum — and the integer
estimate derived from it — is bit-identical in Spark and DuckDB while
retaining the sketch's O(k) memory / mergeability story.

Estimator: with h uniform on [0, M) and t = kth smallest hash,
E[distinct] ≈ (k-1) * M / t  (the classic KMV estimate), computed in
integer arithmetic: ``(k-1) * M div t`` with M = 2^60.

Scale shape: two-stage salted partial + merge. Stage 1 keeps the k
smallest hashes per (group, salt) — every partition-sized task sorts only
its salt shard, never a whole group. Stage 2 merges the ≤ n_salt·k
survivors per group (k-min of a union is a pure function of the inputs'
k-mins — the mergeability property `kmv_merge_rollup` proves by pytest).
No stage ever routes an entire group through one task, unlike a plain
``Window.partitionBy(grp)`` over the raw rows (for a 3-value group key at
100 TB that is three tasks sorting the whole table). The shuffles carry
(key, hash) pairs — never the values themselves — so bytes are
fixed-width, exactly like the dedup digest shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import portable_hash

#: hash space of portable_hash: 15 hex digits = 60 bits
HASH_SPACE = 1 << 60

#: salt width for the stage-1 partial sketches (shards per group)
DEFAULT_N_SALT = 32


def _target_rank(p: float) -> Column:
    """1-based percentile_disc target rank max(1, ceil(p·n)) as a column
    over `n` — integer-exact: binary-float p overshoots for many (p, n)
    pairs (ceil(0.07 * 100) is 8, not 7), so the rate is carried as an
    exact basis-point integer and the ceiling is integer div. The
    greatest(1, …) clamp makes p=0.0 the group MINIMUM (rank 1) instead
    of rank 0, which no cumulative range contains. Shared by
    exact_percentiles_disc and hist_quantile_estimate so the rank rule
    cannot drift between the exact path and the sketch path."""
    p10k = int(round(p * 10000))
    return F.expr(f"greatest(1L, (cast({p10k} AS BIGINT) * n + 9999) div 10000)")


def _rank_hits_bin(p: float) -> Column:
    """True on the histogram row whose cumulative range
    (cum - cnt, cum] contains the target rank for p."""
    r = _target_rank(p)
    return (r > F.col("cum") - F.col("cnt")) & (r <= F.col("cum"))


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: int = 64,
    n_salt: int = DEFAULT_N_SALT,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns (group, kth_min_hash, est_distinct, exact_k) where exact_k is
    the number of sketch slots actually filled (= exact distinct count
    when the group has fewer than k distinct values — small groups are
    exact, large groups are estimated, the standard KMV behavior).

    Two-stage plan: per-(grp, salt) top-k partials (salt = hash mod
    ``n_salt``, so shards are disjoint by construction and a duplicate
    value always lands in the same shard), then a merge window over the
    ≤ n_salt·k partial rows per group. Identical output to the direct
    single-window formulation for any n_salt — asserted by pytest — but
    no task ever sorts a whole group."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    # NULL values are excluded up front (count-distinct semantics): a null
    # hash would sort first, eat a sketch slot, and inflate exact_k while
    # max('h') skipped it — shifting kth_min_hash to the (k-1)th minimum
    hashed = (
        df.filter(v.isNotNull())
        .select(F.col(group_col).alias("grp"), portable_hash(v.cast("string")).alias("h"))
        .withColumn("salt", F.pmod(F.col("h"), F.lit(n_salt)))
    )
    # stage 1: per-shard dedup + top-k (hash mod salt ⇒ dup hashes share a
    # shard, so cross-shard duplicates cannot exist after this)
    w1 = Window.partitionBy("grp", "salt").orderBy("h")
    partial = (
        hashed.dropDuplicates(["grp", "h"])
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    # stage 2: merge ≤ n_salt·k rows per group — bounded input per task
    w2 = Window.partitionBy("grp").orderBy("h")
    topk = partial.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)
    return (
        topk.groupBy("grp")
        .agg(F.max("h").alias("kth_min_hash"), F.count(F.lit(1)).alias("exact_k"))
        .select(
            F.col("grp").alias(group_col),
            "kth_min_hash",
            F.when(
                F.col("exact_k") < k, F.col("exact_k")
            ).otherwise(
                F.expr(f"({k} - 1) * cast({HASH_SPACE} as decimal(38,0)) div kth_min_hash").cast("bigint")
            ).alias("est_distinct"),
            "exact_k",
        )
    )


def exact_percentiles_disc(
    df: DataFrame, group_col: str, value_col: str, percentiles: tuple[float, ...] = (0.5, 0.95)
) -> DataFrame:
    """Exact discrete percentiles via a value histogram + cumulative rank —
    no interpolation, so the result is a value FROM the data and identical
    in every engine (percentile_disc semantics: smallest value whose
    cumulative fraction ≥ p, i.e. the element at 1-based rank ceil(p·n)).

    Scale shape: ``groupBy(grp, val).count()`` collapses the table to its
    value HISTOGRAM with map-side partial aggregation — the shuffle and the
    follow-up cumulative window carry one row per DISTINCT (group, value),
    not per input row. For discretized measures (integer latencies, bucketed
    sizes) that is orders of magnitude smaller than the data; the old
    formulation (`Window.partitionBy(grp)` row_number over raw rows) routed
    every row of a group through one task. The target rank ceil(p·n) falls
    on the histogram row whose cumulative range [cum-cnt+1, cum] contains
    it. For truly continuous values at extreme scale, use Spark's
    `percentile_approx` instead (documented trade-off: approximate but
    single-pass mergeable)."""
    hist = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val"))
        .filter(F.col("val").isNotNull())
        .groupBy("grp", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    agg_cols = [
        F.max(F.when(_rank_hits_bin(p), F.col("val")))
        .alias(f"p{int(round(p * 100))}")  # round: int(0.29*100) is 28
        for p in percentiles
    ]
    return ranked.groupBy("grp").agg(*agg_cols).withColumnRenamed("grp", group_col)


def kmv_merge_rollup(
    df: DataFrame,
    coarse_key: str,
    fine_key: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Mergeability demo/path: build per-(coarse, fine) KMV sketches, then
    MERGE them up to coarse groups — the two-level rollup every sketch
    exists for (daily sketches → monthly distinct counts without re-reading
    raw data). Merging k-minimum-value sets = union the hash sets, re-take
    the k smallest; because the k-min of a union is a pure function of the
    inputs' k-mins, the merged estimate is bit-identical to sketching the
    coarse group directly — asserted by a pytest, and the reason partial
    (map-side) sketch aggregation is safe at 100 TB."""
    w_fine = Window.partitionBy(coarse_key, fine_key).orderBy("h")
    fine_sketch = (
        df.filter(F.col(value_col).isNotNull())  # count-distinct semantics
        .select(
            coarse_key,
            fine_key,
            portable_hash(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w_fine))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # merge: union of per-fine k-min sets -> k smallest per coarse group
    w_coarse = Window.partitionBy(coarse_key).orderBy("h")
    merged = (
        fine_sketch.select(coarse_key, "h")
        .distinct()
        .withColumn("rn", F.row_number().over(w_coarse))
        .filter(F.col("rn") <= k)
    )
    kth = merged.groupBy(coarse_key).agg(
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
        F.count(F.lit(1)).alias("n_seen"),
    )
    return kth.select(
        coarse_key,
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(
            F.expr(f"({k} - 1) * cast({HASH_SPACE} as decimal(38,0)) div kth")
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    key_col: Column | str,
    depth: int = 4,
    width: int = 1024,
    seg_col: str | None = None,
) -> DataFrame:
    """Count-Min Sketch of ``key_col`` frequencies: ``depth`` hash rows ×
    ``width`` counters, each counter = the number of input rows whose
    seeded portable hash lands in that (row, bucket) cell.

    Returns (seg?, row_i, bucket, cnt) — at most depth·width rows per
    segment regardless of input size. Scale shape: the d bucket ids are
    computed per input row JVM-side, posexploded, then hash-aggregated —
    map-side combine collapses every partition to ≤ depth·width partial
    rows BEFORE the shuffle, so shuffle bytes are bounded by
    depth × width × partitions, never by the row count. Counters are
    additive, so per-segment sketches merge by summing cells
    (`cms_merge`) — the same partial-aggregation safety argument as the
    KMV rollup, proven equal to a direct build by pytest.

    NULL keys are excluded (frequency-of-value semantics, matching
    kmv_distinct's NULL policy).
    """
    v = F.col(key_col) if isinstance(key_col, str) else key_col
    buckets = F.array(
        *[F.pmod(portable_hash(v.cast("string"), seed=i), F.lit(width)) for i in range(depth)]
    )
    segs = [F.col(seg_col).alias("seg")] if seg_col else []
    exploded = (
        df.filter(v.isNotNull())
        .select(*segs, F.posexplode(buckets).alias("row_i", "bucket"))
    )
    keys = (["seg"] if seg_col else []) + ["row_i", "bucket"]
    return exploded.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketch: DataFrame) -> DataFrame:
    """Merge per-segment CMS sketches into one: counters are additive, so
    the merged sketch is the cell-wise sum over segments — bit-identical
    to building one sketch over the union of the segments' rows."""
    return sketch.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_point_estimates(
    sketch: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point frequency estimates for every row of ``keys_df``: the CMS
    estimate is the MIN over the key's depth counters (classic
    upper-bound estimator; never undercounts, overcounts only on
    collisions). Keys absent from the sketch estimate 0 via the left
    join + coalesce.

    The sketch side is bounded (≤ depth·width rows) and broadcast — the
    probe never shuffles the key set."""
    v = F.col(key_col)
    buckets = F.array(
        *[F.pmod(portable_hash(v.cast("string"), seed=i), F.lit(width)) for i in range(depth)]
    )
    coords = keys_df.select(v.alias("qkey"), F.posexplode(buckets).alias("row_i", "bucket"))
    joined = coords.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return (
        joined.groupBy("qkey")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(F.col("qkey").alias(key_col), "est_count")
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch: bounded-state mergeable quantiles
# ---------------------------------------------------------------------------


def hist_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: int,
    seg_col: str | None = None,
) -> DataFrame:
    """Fixed-width histogram sketch of ``value_col`` per group: one
    counter per occupied bin, bin = floor(value / bin_width).

    The bounded-state complement to `exact_percentiles_disc`: that path's
    shuffle carries one row per DISTINCT (group, value) — exact, but for
    a continuous measure at 100 TB the distinct count approaches the row
    count. This sketch's state is capped by the value RANGE / bin_width
    regardless of row count, and bins are additive, so per-segment
    sketches merge by summing (`hist_quantile_merge`) — the same
    mergeability contract as KMV and CMS, pytest-proven equal to a
    direct build. Deterministic, so the estimate is bit-identical across
    engines, unlike t-digest/GK whose state depends on input order:
    integral value columns bin by PURE-INTEGER floor division
    ((v − pmod(v, w)) div w — double division would lose bits past 2^53
    and misbin boundary values, the corpus.py prefix-sum hazard), while
    fractional columns bin by floor(v / w), IEEE-defined on doubles.

    Returns (seg?, grp, bin, cnt). NULL values are excluded.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if not float(bin_width) > 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")
    v = F.col(value_col)
    integral_col = isinstance(
        df.schema[value_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    integral_width = float(bin_width) == int(bin_width) and int(bin_width) >= 1
    if integral_col and integral_width:
        # exact floor for any sign: v - pmod(v, w) is the largest multiple
        # of w <= v, so the (truncating, integer) div is exact — `/` would
        # route through double and round past 2^53
        w = int(bin_width)
        bin_expr = F.expr(f"(_v - pmod(_v, {w}L)) div {w}L")
    else:
        # fractional width (or fractional column): IEEE double floor with
        # the UNTRUNCATED width, so hist_quantile_estimate's
        # (bin+1)*bin_width upper bounds line up with the bin edges
        bin_expr = F.floor(F.col("_v").cast("double") / F.lit(float(bin_width))).cast(
            "bigint"
        )
    segs = [F.col(seg_col).alias("seg")] if seg_col else []
    binned = (
        df.filter(v.isNotNull())
        .select(*segs, F.col(group_col).alias("grp"), v.alias("_v"))
        .select(*(["seg"] if seg_col else []), "grp", bin_expr.alias("bin"))
    )
    keys = (["seg"] if seg_col else []) + ["grp", "bin"]
    return binned.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def hist_quantile_merge(sketch: DataFrame) -> DataFrame:
    """Merge per-segment histogram sketches: cell-wise sum over segments,
    bit-identical to one sketch built over the union of rows."""
    return sketch.groupBy("grp", "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile_estimate(
    sketch: DataFrame,
    bin_width: int,
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Quantile estimates from a histogram sketch: the estimate for p is
    the EXCLUSIVE UPPER EDGE of the bin containing 1-based rank
    ceil(p·n) — (bin+1)·bin_width, the supremum of values that can fall
    in the bin (bins hold real-valued data, so the inclusive integer
    edge would undercut e.g. 249.25 in bin [240, 250)). Guarantee:
    exact < estimate ≤ exact + bin_width where exact is the
    percentile_disc value; integer-exact rank arithmetic (basis points,
    integer ceil-div) as in exact_percentiles_disc. The cumulative
    window runs over occupied bins — ≤ range/bin_width rows per group."""
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = sketch.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    agg_cols = [
        F.max(F.when(_rank_hits_bin(p), (F.col("bin") + 1) * bin_width))
        .alias(f"p{int(round(p * 100))}_ub")
        for p in percentiles
    ]
    return ranked.groupBy("grp").agg(*agg_cols)


# ---------------------------------------------------------------------------
# HyperLogLog — the canonical mergeable distinct sketch, made
# engine-deterministic (public algorithm: Flajolet et al. 2007)
# ---------------------------------------------------------------------------


def _hll_alpha_c(p: int) -> int:
    """round(alpha_m · m²) as an exact integer constant (driver-side)."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    return int(round(alpha * m * m))


def hll_sketch(
    df: DataFrame, group_col: str, value_col: Column | str, p: int = 6
) -> DataFrame:
    """Per-group HLL registers: (grp, bucket, rho) with bucket = the
    portable hash's top ``p`` bits and rho = leading-zero run (+1) of the
    remaining 60-p bits — max-aggregated, so the register table is
    mergeable by ``hll_merge`` (max is idempotent/commutative, the same
    partial-agg-safety contract as KMV/CMS/histogram).

    Fully deterministic and SQL-twinnable: rho comes from the binary
    string length of the residue (``bin``), never from float log2 — the
    whole sketch is a pure integer function of the portable md5 hash, so
    Spark and DuckDB build bit-identical registers.

    Scale shape: map-side max-combine collapses each partition to
    ≤ groups × m register rows before the one exchange; state is m
    (= 2^p) registers per group regardless of input rows."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    rbits = 60 - p
    h = portable_hash(v.cast("string"))
    d = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("grp"), h.alias("_h")
    )
    rest = F.expr(f"_h % {1 << rbits}L")
    rho = F.when(rest == 0, F.lit(rbits + 1)).otherwise(
        F.lit(rbits + 1) - F.length(F.bin(rest))
    )
    return (
        d.select(
            "grp",
            F.expr(f"_h div {1 << rbits}L").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables (segments/epochs) by per-bucket max — proven
    equal to a direct build by pytest, like the other sketch families."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 6) -> DataFrame:
    """(grp, hll_est): the raw HLL harmonic-mean estimate from a register
    table, in pure integer arithmetic so both engines agree bit-for-bit:
    each register contributes S >> rho (S a power of two sized driver-side
    so C·S < 2^62 never overflows), absent registers contribute S, and
    the estimate is the single integer division (C·S) div Σterms with
    C = round(alpha_m·m²). Truncation of terms with rho > log2(S) is
    identical in both engines (deterministic, astronomically rare).

    No small-range linear-counting branch: that needs ln(), whose last
    bits differ across libm builds — `kmv_distinct` is this engine's
    exact-small-group path; HLL here is the bounded-state
    (m registers/group, vs KMV's k hashes) estimate for huge groups."""
    m = 1 << p
    c = _hll_alpha_c(p)
    shift = 61 - c.bit_length()
    s_unit = 1 << shift
    agg = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum(F.expr(f"shiftright({s_unit}L, rho)")).alias("_sum"),
    )
    return agg.select(
        "grp",
        F.expr(
            f"{c * s_unit}L div greatest(_sum + ({m}L - _nb) * {s_unit}L, 1L)"
        ).alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, group_col: str, value_col: Column | str, p: int = 6
) -> DataFrame:
    """Sketch + estimate in one call: (group_col, hll_est)."""
    est = hll_estimate(hll_sketch(df, group_col, value_col, p), p)
    return est.withColumnRenamed("grp", group_col)


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch (public algorithm:
# Bloom 1970), the broadcastable complement to the anti-join in
# `ops.dedup.dedup_incremental`
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    key_col: Column | str,
    m_bits: int = 4096,
    n_hashes: int = 4,
    seg_col: str | None = None,
) -> DataFrame:
    """Bloom filter over ``key_col``: an ``m_bits``-wide bitset with
    ``n_hashes`` seeded portable hashes per key, returned RELATIONALLY as
    (seg?, word_idx, word) — one row per nonzero 31-bit word
    (word_idx = bit div 31, word = OR of 1<<(bit%31)). 31-bit words keep
    every mask a small positive BIGINT, so Spark and DuckDB agree without
    touching sign-bit shift semantics.

    Scale shape: the bit positions are computed per input row JVM-side
    and DISTINCT-collapsed before any exchange — the shuffle carries at
    most min(rows·n_hashes, m_bits) distinct (word_idx, bit) coordinates
    regardless of input size, and the finished filter is ≤ m_bits/31
    rows: broadcastable no matter how large the corpus it summarizes.
    At 10^12 turns the incremental-dedup membership gate becomes a
    broadcast of m_bits/31 rows instead of a shuffle of the standing
    fingerprint table (`dedup_incremental`'s anti-join stays as the
    exact confirmation pass on the sketch's survivors — Bloom has false
    positives, never false negatives).

    Bitsets are OR-mergeable (`bloom_merge`): per-segment/epoch filters
    combine by word-wise bit_or, proven equal to a direct build by
    pytest — the same partial-agg contract as KMV/CMS/histogram/HLL.
    NULL keys are excluded (membership-of-value semantics)."""
    if m_bits < 31 or n_hashes < 1:
        raise ValueError(f"need m_bits >= 31 and n_hashes >= 1, got {m_bits}/{n_hashes}")
    v = F.col(key_col) if isinstance(key_col, str) else key_col
    bits = F.array(
        *[
            F.pmod(portable_hash(v.cast("string"), seed=i), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    )
    segs = [F.col(seg_col).alias("seg")] if seg_col else []
    seg_keys = ["seg"] if seg_col else []
    coords = (
        df.filter(v.isNotNull())
        .select(*segs, F.explode(bits).alias("bit"))
        .select(
            *seg_keys,
            F.expr("bit div 31L").alias("word_idx"),
            F.expr("bit % 31L").alias("_b"),
        )
        .distinct()
    )
    return coords.groupBy(*seg_keys, "word_idx").agg(
        F.sum(F.expr("shiftleft(1L, cast(_b AS INT))")).alias("word")
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge filters built with identical (m_bits, n_hashes): word-wise
    bitwise OR — bit-identical to one filter built over the union of the
    inputs' keys. Implemented as sum over distinct (word_idx, bit)
    coordinates so the `bit_or` aggregate (absent from older engines)
    isn't needed: re-exploding each word to its set bits keeps every
    coordinate counted once."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    # normalize EVERY input (including the first) to the two sketch
    # columns — a first filter carrying extras (e.g. a seg column from
    # bloom_build(seg_col=...)) would otherwise break the unionByName
    out = filters[0].select("word_idx", "word")
    for f in filters[1:]:
        out = out.unionByName(f.select("word_idx", "word"))
    bits = F.expr("filter(sequence(0, 30), b -> (word & shiftleft(1L, b)) != 0L)")
    return (
        out.select("word_idx", F.explode(bits).alias("_b"))
        .distinct()
        .groupBy("word_idx")
        .agg(F.sum(F.expr("shiftleft(1L, cast(_b AS INT))")).alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership verdict for every row of ``keys_df`` against a filter
    from `bloom_build` (same m_bits/n_hashes): (key_col,
    maybe_present) — true iff ALL n_hashes bits are set. No false
    negatives (every inserted key probes true); false positives at the
    classic (1-e^{-kn/m})^k rate, bounded by pytest.

    The filter side is ≤ m_bits/31 rows and broadcast; the probe is a
    broadcast left join + row-local bit test — the key set itself never
    shuffles. One verdict row per DISTINCT key; NULL keys verdict NULL
    (counted, not dropped)."""
    v = F.col(key_col)
    bits = F.array(
        *[
            F.pmod(portable_hash(v.cast("string"), seed=i), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    )
    coords = keys_df.filter(v.isNotNull()).select(
        v.alias("qkey"), F.explode(bits).alias("bit")
    ).select(
        "qkey",
        F.expr("bit div 31L").alias("word_idx"),
        F.expr("shiftleft(1L, cast(bit % 31L AS INT))").alias("mask"),
    )
    joined = coords.join(F.broadcast(bloom), ["word_idx"], "left")
    hit = (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask"))
    present = (
        joined.groupBy("qkey")
        .agg(F.min(hit.cast("int")).alias("_all"))
        .select(F.col("qkey").alias(key_col), (F.col("_all") == 1).alias("maybe_present"))
    )
    null_keys = (
        keys_df.filter(v.isNull())
        .select(v.alias(key_col), F.lit(None).cast("boolean").alias("maybe_present"))
        .distinct()
    )
    return present.unionByName(null_keys)


def hll_sliding_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window_days: int = 3,
    p: int = 6,
) -> DataFrame:
    """Trailing-W-day distinct-value estimate per day via HLL register
    REUSE — the sliding-window rollup that makes sketches pay off at
    scale: each day's registers are built once from the raw stream,
    then every window is a per-bucket max-merge of W register sets
    (m rows per day), never a recount of the raw rows. A 90-day
    dashboard over a year of 100 TB logs touches the raw data exactly
    once.

    Windows are anchored on observed days only: output (day, hll_est)
    where ``day`` is the window END day (epoch seconds, day-start) and
    the estimate covers [day - (W-1) days, day].

    Identical register/estimate arithmetic to hll_sketch/hll_estimate
    (pure integer function of the portable hash), so the DuckDB twin is
    bit-identical.

    Scale shape: one shuffle builds daily registers (map-side
    max-combined, <= days x m rows); the window expansion multiplies
    REGISTERS by W (days x m x W rows, corpus-independent), merges with
    another bounded max-aggregate, and the raw stream is scanned
    exactly once."""
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col(ts_col)))
        .cast("bigint")
        .alias("d")
    )
    d2 = df.select(day, F.col(value_col).alias("_v"))
    sk = hll_sketch(d2, "d", "_v", p)
    days = d2.select("d").distinct()
    expanded = sk.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda i: F.col("grp") + i.cast("bigint") * F.lit(86400),
            )
        ).alias("wd"),
        "bucket",
        "rho",
    )
    merged = (
        expanded.groupBy("wd", "bucket")
        .agg(F.max("rho").alias("rho"))
        .join(
            F.broadcast(days.withColumnRenamed("d", "wd")), "wd"
        )
        .withColumnRenamed("wd", "grp")
    )
    return (
        hll_estimate(merged, p)
        .withColumnRenamed("grp", "day")
        .select(F.col("day").cast("bigint").alias("day"), "hll_est")
    )


# ---------------------------------------------------------------------------
# Sketch estimator audits: join-size (CMS inner product) and set
# intersection (KMV/theta) — the planner-input estimates a 100 TB engine
# computes INSTEAD of the exact operation, emitted here side-by-side with
# the exact value so the estimator's error is itself a verified quantity.
# ---------------------------------------------------------------------------


def _kmv_topk(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: int,
    n_salt: int = DEFAULT_N_SALT,
) -> DataFrame:
    """The k smallest portable hashes per group — the KMV sketch ROWS
    (grp, h), built with the same two-stage salted plan as
    `kmv_distinct` (per-shard top-k, then a merge window over ≤
    n_salt·k survivors) so no task ever sorts a whole group."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = (
        df.filter(v.isNotNull())
        .select(F.col(group_col).alias("grp"), portable_hash(v.cast("string")).alias("h"))
        .withColumn("salt", F.pmod(F.col("h"), F.lit(n_salt)))
    )
    w1 = Window.partitionBy("grp", "salt").orderBy("h")
    partial = (
        hashed.dropDuplicates(["grp", "h"])
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return (
        partial.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_set_overlap(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    k: int = 64,
    with_exact: bool = True,
) -> DataFrame:
    """Theta-sketch-style set-intersection estimate between every pair of
    event-type user sets — the bounded-memory path `audience_overlap`'s
    docstring defers to for unbounded type cardinality (that operator
    expands exact per-user pairs; this one compares k-row sketches).

    Per pair: theta = min of the two sketches' kth-minimum hashes (a
    sketch with fewer than k distinct members contributes theta =
    HASH_SPACE — it IS its whole set); n_common = |common hashes <
    theta|; est_inter = n_common * HASH_SPACE div theta (the standard
    theta-sketch estimator, exact when both sets fit their sketches).
    Deterministic in the portable hash, hence value-verifiable.

    Returns (t1, t2, theta, n_common, est_inter, exact_inter, err_bp)
    for t1 < t2; err_bp = sign * (10000*|est-exact| div exact)
    (truncating on the non-negative magnitude, so both engines agree on
    negatives). With with_exact=False the exact audit columns are
    skipped — the production shape: nothing beyond the k-row sketches
    and the |types|-row kth table ever moves.

    Scale shape: one distinct-collapse shuffle builds the sketches
    (two-stage salted top-k, `_kmv_topk`); the pair stage joins two
    ≤|types|·k-row sketch tables on h and the |types|²-row pair spine
    is a broadcast. The exact audit reuses the `audience_overlap`
    self-equi-join on the user key."""
    base = events.filter(
        F.col(type_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(F.col(type_col).alias("t"), F.col(user_col).alias("u"))
    # lazy checkpoint instead of cache(): the ≤|types|·k-row sketch feeds
    # the kth aggregate and both pair sides, and a cache() here pinned
    # its blocks for the session lifetime (never unpersisted); checkpoint
    # blocks are released by the ContextCleaner when the plan is dropped
    sk = _kmv_topk(base, "t", F.col("u"), k).localCheckpoint(eager=False)
    kth = sk.groupBy("grp").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("nk")
    )
    theta_t = kth.select(
        F.col("grp").alias("t"),
        F.when(F.col("nk") < k, F.lit(HASH_SPACE).cast("bigint"))
        .otherwise(F.col("kth"))
        .alias("th"),
    )
    spine = (
        theta_t.select(F.col("t").alias("t1"), F.col("th").alias("th1"))
        .join(
            theta_t.select(F.col("t").alias("t2"), F.col("th").alias("th2")),
            F.col("t1") < F.col("t2"),
        )
        .withColumn("theta", F.least("th1", "th2"))
        .select("t1", "t2", "theta")
    )
    common = (
        sk.select(F.col("grp").alias("t1"), "h")
        .join(sk.select(F.col("grp").alias("t2"), "h"), "h")
        .filter(F.col("t1") < F.col("t2"))
        .join(F.broadcast(spine), ["t1", "t2"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # both sides are |types|^2-bounded; the OUTER side cannot carry a
    # broadcast hint, and none is needed
    est = (
        spine.join(common, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "theta",
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
        )
        .withColumn(
            "est_inter",
            F.expr(
                f"CAST((n_common * CAST({HASH_SPACE} AS DECIMAL(38,0))) "
                f"DIV theta AS BIGINT)"
            ),
        )
    )
    if not with_exact:
        return est
    ua = base.distinct()
    exact = (
        ua.select(F.col("t").alias("t1"), "u")
        .join(ua.select(F.col("t").alias("t2"), "u"), "u")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        est.join(exact, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "theta",
            "n_common",
            "est_inter",
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
        )
        .withColumn(
            "err_bp",
            F.when(F.col("exact_inter") == 0, F.lit(0).cast("bigint")).otherwise(
                F.signum(F.col("est_inter") - F.col("exact_inter")).cast("bigint")
                * F.expr(
                    "CAST((10000 * abs(est_inter - exact_inter)) "
                    "DIV exact_inter AS BIGINT)"
                )
            ),
        )
    )


def cms_join_size_estimate(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Equi-join output-cardinality estimate via the Count-Min inner
    product (Alon-Matias-Szegedy F2 / Cormode-Muthukrishnan §4.2):
    |A ⋈ B| = Σ_key n_A(key)·n_B(key), estimated as the MIN over the
    depth hash rows of Σ_bucket cntA·cntB. Each row's inner product is
    the true join size plus non-negative collision cross-terms, so the
    estimate NEVER undercounts — the safe direction for a planner
    deciding shuffle partitioning or broadcast eligibility.

    Returns ONE row (exact_rows, est_rows, overcount_bp). All products
    and sums are DECIMAL(38,0) — exact at 10^12-row inputs where
    per-key counts squared overflow BIGINT.

    Scale shape: each input is read once and collapses map-side to
    ≤ depth·width partial cells before its one bounded shuffle
    (cms_build); the inner product joins two ≤ depth·width-row sketches
    (broadcast). The exact side — one groupBy per input co-partitioned
    on the join key — is the audit; a planner runs only the sketch
    path."""
    ska = cms_build(a, key_a, depth=depth, width=width).select(
        "row_i", "bucket", F.col("cnt").cast("decimal(38,0)").alias("cnt_a")
    )
    skb = cms_build(b, key_b, depth=depth, width=width).select(
        "row_i", "bucket", F.col("cnt").cast("decimal(38,0)").alias("cnt_b")
    )
    est = (
        ska.join(F.broadcast(skb), ["row_i", "bucket"])
        .groupBy("row_i")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
        .agg(F.min("ip").alias("est_dec"))
    )
    na = (
        a.filter(F.col(key_a).isNotNull())
        .groupBy(F.col(key_a).alias("k"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_a"))
    )
    nb = (
        b.filter(F.col(key_b).isNotNull())
        .groupBy(F.col(key_b).alias("k"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_b"))
    )
    exact = na.join(nb, "k").agg(
        F.coalesce(F.sum(F.col("n_a") * F.col("n_b")), F.lit(0).cast("decimal(38,0)"))
        .alias("exact_dec")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("exact_dec").cast("bigint").alias("exact_rows"),
        F.col("est_dec").cast("bigint").alias("est_rows"),
        F.when(F.col("exact_dec") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr("CAST((10000 * (est_dec - exact_dec)) DIV exact_dec AS BIGINT)")
        )
        .alias("overcount_bp"),
    )
