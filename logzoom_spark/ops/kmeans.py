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


def lloyd_partial_sums(
    raw: DataFrame,
    jobs: list[tuple[int, int, bool, list[tuple[int, list[int]]]]],
    width: int,
    scale: int,
) -> DataFrame:
    """(subj, cell, n, s0..s{width-1}): per-Arrow-batch nearest-centroid
    assignment and partial member sums for a list of slice-jobs over ONE
    scan of ``raw`` (vec_id, e=raw embedding) — the map-side half of a
    Lloyd mean update, shared by `kmeans_fit` (one full-width job) and
    `ops.pq.pq_fit` (one job per subspace).

    Each job is (subj, offset, exact_len, cents): rows are quantized
    (floor(float64·scale) — bit-identical to the JVM `quantize`), the
    job's slice [offset, offset+width) is assigned to its nearest
    centroid by one exact GEMM (`_dots_exact`; D² = |v|² − 2v·c + |c|²,
    all int64), ties to the lowest cell id (cents are cell-sorted, so
    argmin's first-minimum IS the lowest id), and ≤ |cents| partial rows
    per batch are emitted. ``exact_len`` jobs skip rows whose width ≠
    offset+width (the full-vector zip_with NULL-pads either direction →
    NULL cell → dropped from the old update); non-exact jobs need only
    width ≥ offset+width (a longer row still fills the slice). The
    reducer is a tiny groupBy(subj, cell) over k·batches rows."""
    schema = "subj int, cell int, n bigint, " + ", ".join(
        f"s{i} bigint" for i in range(width)
    )
    sc = int(scale)
    W = int(width)
    jobs_py = [
        (int(subj), int(off), bool(exact), [int(c) for c, _ in cents],
         [[int(x) for x in cv] for _, cv in cents])
        for subj, off, exact, cents in jobs
        if cents
    ]

    def part(it):
        import numpy as np
        import pandas as pd

        from logzoom_spark.ops.similarity import _dots_exact

        mats = [
            (subj, off, exact, np.array(cells, dtype=np.int64),
             np.array(cvs, dtype=np.int64))
            for subj, off, exact, cells, cvs in jobs_py
        ]
        for pdf in it:
            if len(pdf) == 0:
                continue
            lens = pdf["e"].map(lambda x: -1 if x is None else len(x)).to_numpy()
            frames = []
            for L in np.unique(lens):
                if L < 0:
                    continue
                idx = np.nonzero(lens == L)[0]
                V = None
                for subj, off, exact, cells, C in mats:
                    if (L != off + W) if exact else (L < off + W):
                        continue
                    if V is None:
                        E = np.stack(
                            [np.asarray(pdf["e"].iat[i], dtype=np.float64) for i in idx]
                        )
                        V = np.floor(E * sc).astype(np.int64)
                    S = V[:, off : off + W]
                    G = _dots_exact(S, C)
                    D2 = (S * S).sum(1)[:, None] - 2 * G + (C * C).sum(1)[None, :]
                    a = np.argmin(D2, axis=1)
                    counts = np.bincount(a, minlength=len(cells))
                    sums = np.zeros((len(cells), W), dtype=np.int64)
                    np.add.at(sums, a, S)
                    nz = np.nonzero(counts > 0)[0]
                    d = {"subj": np.full(len(nz), subj, dtype=np.int32),
                         "cell": cells[nz].astype(np.int32),
                         "n": counts[nz].astype(np.int64)}
                    for i in range(W):
                        d[f"s{i}"] = sums[nz, i]
                    frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return raw.mapInPandas(part, schema)


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
    # update rounds run the Arrow/numpy partial-sum kernel over the RAW
    # embedding scan (`lloyd_partial_sums` — one exact GEMM per batch,
    # ≤ k partial rows per batch into a tiny groupBy) instead of an
    # interpreted literal-argmin projection feeding a dims-column hash
    # aggregate; centroids are bit-identical (same quantization, same
    # argmin tie-break, same integer sums and floor-divided means)
    raw = emb.select("vec_id", F.col("embedding").alias("e"))
    if iters > 1:
        raw = raw.persist()  # each update re-reads the scan
    try:
        for _ in range(iters - 1):
            part = lloyd_partial_sums(raw, [(0, 0, True, cents)], dims, scale)
            sums = part.groupBy("cell").agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dims)],
            )
            # floor(sum/n) per dimension; k bounded rows reach the driver
            cents = sorted(
                (int(r["cell"]), [int(r[f"s{i}"]) // int(r["n"]) for i in range(dims)])
                for r in sums.collect()
            )
    finally:
        if iters > 1:
            # lazy uncache: the returned plan stays valid, the final
            # consumer just re-scans the source once
            raw.unpersist()
    assignment = _assign(base, cents, k).select(
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
