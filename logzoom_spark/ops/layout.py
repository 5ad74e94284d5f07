"""Physical-layout planning: Z-order clustering for multi-dimension
data skipping.

The reference's only layout control is the S3 sink's time slicing
(reference: output/s3/s3.go — one dimension, time); a 100 TB lakehouse
wants file layouts that let scans skip on TWO dimensions at once
(Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort orders are the
public analogues). ``zorder_layout`` assigns every row a Morton
(bit-interleaved) z-value over two bucketed dimensions and reports the
per-file min/max envelope of each dimension — the statistics a
min/max-pruning scan uses, and the direct evidence that the layout
localizes BOTH dimensions (narrow envelopes per file) where a
single-dim sort localizes only one.

Integer-exact throughout; the bit interleave is unrolled shifts/masks
identical in Spark SQL and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_z", "zorder_layout"]


def morton_z(a: F.Column, b: F.Column, bits: int = 8) -> F.Column:
    """Morton code: interleave the low `bits` bits of a (even positions)
    and b (odd positions). Pure shifts/masks — whole-stage codegen, and
    expressible verbatim in the oracle dialect."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_layout(
    events: DataFrame, bits: int = 8, n_file_bits: int = 4
) -> DataFrame:
    """Z-order layout plan over (user bucket, day bucket): bucket both
    dimensions to `bits` bits (modulo — callers with sparse ids
    pre-densify), interleave into a Morton z-value, and split the
    z-range into 2^n_file_bits files by the TOP z bits. Returns the
    per-file envelope a pruning scan reads:

    (file_id, n_rows, min_u, max_u, min_d, max_d) — narrow u AND d
    envelopes per file demonstrate two-dimensional locality.

    Scale shape: the z-value and file id are row-local projections (the
    sort a real writer would do is within-partition via
    sortWithinPartitions on z — no global sort); the envelope rollup is
    one map-side-combined aggregate on the 2^n_file_bits key."""
    if not (0 < n_file_bits <= 2 * bits <= 62):
        raise ValueError(f"need 0 < n_file_bits <= 2*bits <= 62, got {bits}/{n_file_bits}")
    u = F.pmod(F.col("user_id"), F.lit(1 << bits)).cast("bigint")
    d = F.pmod(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint"),
        F.lit(1 << bits),
    )
    z = morton_z(u, d, bits=bits)
    shift = 2 * bits - n_file_bits
    rows = events.select(
        u.alias("_u"), d.alias("_d"), F.shiftright(z, shift).alias("file_id")
    )
    return rows.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("_u").cast("bigint").alias("min_u"),
        F.max("_u").cast("bigint").alias("max_u"),
        F.min("_d").cast("bigint").alias("min_d"),
        F.max("_d").cast("bigint").alias("max_d"),
    )


def zorder_skipping_effectiveness(
    events: DataFrame, bits: int = 8, n_file_bits: int = 4
) -> DataFrame:
    """Quantified payoff of the Z-order layout: for EVERY possible
    point predicate on each dimension (u = X, d = X for X in
    [0, 2^bits)), count how many files' min/max envelopes a pruning
    scan must read, and report the average hit rate in basis points —
    the number a layout decision is actually made on (a perfect
    single-dim sort gives ~1/n_files on its dim and ~10000 on the
    other; Z-order lands both dims in between).

    Returns (dim, n_probes, n_files, file_hits, avg_hit_bp).

    Scale shape: the envelope table is 2^n_file_bits rows (bounded);
    probes are a generated 2^bits-row range; the audit is a broadcast
    range join between two bounded frames — data volume is touched
    only by `zorder_layout`'s one aggregate."""
    env = zorder_layout(events, bits=bits, n_file_bits=n_file_bits)
    spark = events.sparkSession
    probes = spark.range(1 << bits).select(F.col("id").cast("bigint").alias("x"))
    out = []
    for dim, lo, hi in (("u", "min_u", "max_u"), ("d", "min_d", "max_d")):
        hits = (
            probes.join(
                F.broadcast(env.select(lo, hi)),
                (F.col("x") >= F.col(lo)) & (F.col("x") <= F.col(hi)),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("file_hits"))
        )
        n_files = env.agg(F.count(F.lit(1)).cast("bigint").alias("n_files"))
        out.append(
            hits.join(n_files)
            .select(
                F.lit(dim).alias("dim"),
                F.lit(1 << bits).cast("bigint").alias("n_probes"),
                "n_files",
                "file_hits",
                F.expr(f"(file_hits * 10000) div ({1 << bits} * n_files)")
                .cast("bigint")
                .alias("avg_hit_bp"),
            )
        )
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    return res
