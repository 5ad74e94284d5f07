"""Similarity search over the `embeddings` table (array<float> column).

Baseline: brute-force top-k against a query vector — a broadcast of one
row against the full table, no shuffle until the final top-k (which is a
TakeOrdered, not a sort). Scale path: LSH-bucketed search — random
hyperplane signatures bucket the table; a query probes only its bucket.

Determinism: embeddings are quantized to integer grids
(floor(double(x)*1000)) before dot products, so scores are exact BIGINTs —
identical in any engine and under any reduction order. The float32→float64
cast is exact; double multiply is IEEE-defined; no accumulation-order drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, scale: int = 1000) -> Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * scale).cast("bigint"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def brute_force_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, scale: int = 1000
) -> DataFrame:
    """Exact top-k by quantized dot product vs one stored vector.

    Plan shape: broadcast-NLJ of the 1-row query against the scan, then a
    global TakeOrdered(k) — no full sort, no wide shuffle. At 100 TB this
    is one pass over the embedding column only (Parquet prunes the rest).
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize(F.col("embedding"), scale).alias("qv")
    )
    cand = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", quantize(F.col("embedding"), scale).alias("v")
    )
    scored = cand.join(F.broadcast(q)).select(
        "vec_id", dot(F.col("v"), F.col("qv")).alias("dot")
    )
    return scored.orderBy(F.desc("dot"), F.asc("vec_id")).limit(k)


def norms_by_label(emb: DataFrame, scale: int = 1000) -> DataFrame:
    """Per-label count and exact quantized sum-of-squares (embedding health
    stats — integer-exact, engine-independent)."""
    qv = quantize(F.col("embedding"), scale)
    return (
        emb.select("label", dot(qv, qv).alias("sq"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("sq").alias("sum_sq"))
    )


def lsh_bucket_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, planes: int = 8, scale: int = 1000
) -> DataFrame:
    """LSH-bucketed ANN: sign of the dot with `planes` deterministic
    pseudo-random hyperplanes forms a bucket id; search only the query's
    bucket. Deterministic planes: element j of plane p is
    (xxhash64-free) integer pattern ((p*1315423911 + j*2654435761) mod 2001)
    - 1000 — reproducible in pure SQL for the oracle."""
    dims = 64  # embeddings.parquet vectors are fixed 64-d

    def plane(p: int) -> Column:
        return F.array(
            *[
                F.lit(((p * 1315423911 + j * 2654435761) % 2001) - 1000).cast("bigint")
                for j in range(dims)
            ]
        )

    qv = quantize(F.col("embedding"), scale)
    bucket = None
    for p in range(planes):
        bit = F.when(dot(qv, plane(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket * 2 + bit
    with_bucket = emb.select("vec_id", qv.alias("v"), bucket.cast("bigint").alias("bucket"))
    qrow = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = with_bucket.filter(F.col("vec_id") != query_vec_id)
    scored = (
        cand.join(F.broadcast(qrow), cand.bucket == F.col("qbucket"))
        .select("vec_id", dot(F.col("v"), F.col("qv")).alias("dot"))
    )
    return scored.orderBy(F.desc("dot"), F.asc("vec_id")).limit(k)
