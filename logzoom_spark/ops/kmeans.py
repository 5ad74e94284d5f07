"""Distributed k-means (Lloyd's algorithm) over the embeddings table — the
clustering step of semantic-dedup / domain-discovery curation pipelines
(SemDeDup-style: cluster embeddings, then dedup within clusters; our
`semantic_dedup` consumes exactly this assignment shape).

Spark-first plan, per Lloyd iteration:
- **assign**: centroids are BOUNDED (k rows of dims ints), so they are
  inlined as literals and the nearest-centroid argmin is a pure projection
  inside whole-stage codegen — ZERO shuffle, one pass over the embedding
  column (same driver-bounded-state pattern as ``similarity.ivf_assign``).
- **update**: element-wise centroid means via per-dimension `sum` columns
  under one `groupBy(cell)` — map-side partial aggregation collapses each
  partition to k×(dims+1) longs before the shuffle, so the exchange carries
  O(k·dims) per partition regardless of row count. The k result rows are
  collected to the driver (bounded: k×dims ints) to build the next
  iteration's literal centroids.

Determinism (oracle-exact in any engine):
- embeddings quantized to integer grids (floor(double(x)·scale)) so
  distances are exact BIGINTs — no float accumulation-order drift;
- argmin tie-break by LOWEST cell id via array_min over (dist², cell)
  structs — struct ordering is field-by-field, so the minimum is
  (smallest dist², then smallest cell), exact BIGINT throughout;
- centroid means floor-quantized: floor(sum / n) per dimension (exact —
  sums fit a double's 53-bit mantissa at any realistic scale·dim);
- init centroids = the stored vectors with vec_id ∈ [0, k) (deterministic,
  SQL-expressible stand-in for k-means‖ seeding — swap in trained seeds via
  the same bounded-literal path if needed).

Empty clusters drop out of the update (standard Lloyd variant): a cell with
no members contributes no mean row, and later iterations assign over the
surviving centroids only.

No reference analog (logzoom has no vector surface); this extends the
training-data operator set mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize


def _assign(base: DataFrame, cents: list[tuple[int, list[int]]], k: int) -> DataFrame:
    """(vec_id, v, cell, dist2): nearest centroid per row, ties to the
    lowest cell id. Pure codegen projection — centroids are inlined
    literals, no join, no shuffle. The argmin is array_min over
    (dist², cell) structs (struct ordering is field-by-field, so the min
    is (smallest dist², then smallest cell)) — exact BIGINT throughout,
    no dist²·k+cell packing whose float-division unpacking would round
    past 2^53."""
    # centroids as ONE literal array-of-arrays + a single transform lambda
    # instead of k unrolled zip_with/aggregate copies: the distances are
    # identical BIGINTs, but the expression tree shrinks ~k× — Catalyst
    # analysis + codegen of the per-centroid unrolled form dominated
    # wall-clock on bounded tables (each Lloyd round recompiles the plan)
    cells_lit = F.array(*[F.lit(int(cell)) for cell, _ in cents])
    cvs_lit = F.array(
        *[F.array(*[F.lit(int(x)) for x in cv]) for _, cv in cents]
    )
    dists = F.transform(
        cvs_lit,
        lambda cv: F.aggregate(
            F.zip_with(F.col("v"), cv, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    best = F.array_min(
        F.zip_with(
            dists, cells_lit, lambda d, c: F.struct(d.alias("d"), c.alias("c"))
        )
    )
    # ragged row (embedding shorter than dims): zip_with NULL-pads, every
    # dist² is NULL, and struct ordering sorts NULL `d` FIRST — so an
    # unguarded best["c"] would silently assign such rows to the lowest
    # cell. Null the cell out instead (the F.least-era behavior): NULL
    # cluster, NULL dist2, and the update's groupBy drops the row.
    return base.select(
        "vec_id",
        "v",
        F.when(best["d"].isNotNull(), best["c"]).cast("int").alias("cell"),
        best["d"].cast("bigint").alias("dist2"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
) -> tuple[DataFrame, list[dict]]:
    """Run ``iters`` Lloyd assignment rounds (mean update between rounds);
    return (assignment, centroids). The assignment is (vec_id, cluster,
    dist2); the centroids are the ones the FINAL assignment used, as
    ``[{"vec_id": cell, "v": [ints]}, ...]`` with dense ids in [0, k) —
    directly valid as ``similarity.ivf_assign(..., centroids=...)`` /
    ``knn_join(..., centroids=...)`` trained seeds (their id-density
    validation is satisfied by construction).

    ``iters=1`` is exactly the IVF coarse assignment; ``iters≥2`` refines
    centroids toward the data. Driver state per iteration is k×dims ints;
    everything row-scaled stays distributed (see module docstring for the
    per-iteration plan shape).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    base = emb.select(
        "vec_id", quantize(F.col("embedding"), scale).alias("v")
    )
    cents = sorted(
        (int(r["vec_id"]), [int(x) for x in r["v"]])
        for r in base.filter(F.col("vec_id") < k).collect()
    )
    if not cents:
        raise ValueError(f"no init centroids: no vec_id in [0, {k})")
    # wrong dims would otherwise fail far from the cause: a too-large dims
    # makes the update's out-of-range v[i] sums NULL (int(None) TypeError
    # at collect), a too-small one NULL-pads zip_with and silently turns
    # every dist²/cluster NULL
    for _, cv in cents:
        if len(cv) != dims:
            raise ValueError(
                f"dims={dims} but embeddings have {len(cv)} dimensions"
            )
    if iters > 1:
        base = base.persist()  # each update collect + reassign re-reads base
    try:
        assigned = _assign(base, cents, k)
        for _ in range(iters - 1):
            sums = assigned.groupBy("cell").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(dims)],
            )
            # floor(sum/n) per dimension; k bounded rows reach the driver
            cents = sorted(
                (int(r["cell"]), [int(r[f"s{i}"]) // int(r["n"]) for i in range(dims)])
                for r in sums.collect()
            )
            assigned = _assign(base, cents, k)
    finally:
        if iters > 1:
            # lazy uncache: the returned plan stays valid, the final
            # consumer just re-scans the source once
            base.unpersist()
    assignment = assigned.select(
        "vec_id", F.col("cell").alias("cluster"), "dist2"
    )
    return assignment, [{"vec_id": c, "v": cv} for c, cv in cents]


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, cluster, dist2) after ``iters`` Lloyd rounds — see
    ``kmeans_fit`` (this is its assignment half)."""
    assignment, _ = kmeans_fit(emb, k=k, iters=iters, dims=dims, scale=scale)
    return assignment


def cluster_sizes(assignment: DataFrame) -> DataFrame:
    """(cluster, n_vecs, inertia) rollup of a kmeans_assign result —
    the convergence/balance health signal (inertia = Σ dist²,
    integer-exact)."""
    return assignment.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("dist2").alias("inertia"),
    )
