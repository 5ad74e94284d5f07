"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Fan a narrow-parallelism input out to the session's default
    parallelism before CPU-heavy per-row work.

    The guide's "input skew" case (§2.5): a single small/unsplittable file
    scans as ONE task, so a compute-bound projection pipelined onto the
    scan (shingle + per-seed digest trees, grok, tokenize+explode) runs on
    one core no matter how many the session has. Round-robin repartition
    immediately after the read fixes exactly that — and ONLY that: when
    the scan already has at least ``min_factor × defaultParallelism``
    partitions (any real multi-file table at scale), this is a no-op and
    adds no exchange, so it cannot regress the 100 TB path. The decision
    derives from the runtime's own parallelism, not a constant tuned to
    one machine.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
