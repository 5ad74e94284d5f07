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

Scale shape: one shuffle on the group key; per group only k hashes are
kept (window row_number ≤ k). The groupBy path carries (key, hash) pairs —
never the values themselves — so shuffle bytes are fixed-width, exactly
like the dedup digest shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import portable_hash

#: hash space of portable_hash: 15 hex digits = 60 bits
HASH_SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: Column | str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns (group, kth_min_hash, est_distinct, exact_k) where exact_k is
    the number of sketch slots actually filled (= exact distinct count
    when the group has fewer than k distinct values — small groups are
    exact, large groups are estimated, the standard KMV behavior)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = df.select(
        F.col(group_col).alias("grp"), portable_hash(v.cast("string")).alias("h")
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
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
    """Exact discrete percentiles via rank positions — no interpolation, so
    the result is a value FROM the data and identical in every engine
    (percentile_disc semantics: smallest value whose cumulative fraction
    ≥ p, i.e. the element at 1-based rank ceil(p·n) in sort order).

    One shuffle (partition by group, sort by value) — the same plan shape
    as any ranked top-k; no driver-side work. Ordering by value alone is
    enough: ties occupy a contiguous rank range, so the value at any rank
    is deterministic even though row_number among ties is not."""
    w = Window.partitionBy("grp").orderBy(F.col("val").asc())
    base = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val"))
        .filter(F.col("val").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    )
    agg_cols = [
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("val"))
        ).alias(f"p{int(round(p * 100))}")  # round: int(0.29*100) is 28
        for p in percentiles
    ]
    return base.groupBy("grp").agg(*agg_cols).withColumnRenamed("grp", group_col)


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
        df.select(
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
