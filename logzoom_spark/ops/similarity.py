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


def _dots_exact(A, B):
    """Integer-exact dot-product matrix A·Bᵀ of two int64 numpy matrices.

    Fast path: float64 GEMM (BLAS) whenever every |entry| < 2^20 and the
    width is < 2^13 — then every elementwise product is an integer below
    2^40 and every partial sum stays below 2^53, so the result is exact
    under ANY accumulation order (all intermediates are exactly
    representable doubles); cast back to int64 loses nothing. Otherwise
    fall back to int64 matmul (exact, same BIGINT wraparound semantics as
    the JVM expression it replaces). Quantized embeddings here are
    |entry| ≤ scale·max|x| ≈ a few thousand, so the BLAS path always
    applies in practice."""
    import numpy as np

    if (
        A.size
        and B.size
        and A.shape[1] < (1 << 13)
        and max(np.abs(A).max(), np.abs(B).max()) < (1 << 20)
    ):
        return (A.astype(np.float64) @ B.astype(np.float64).T).astype(np.int64)
    return A @ B.T


def _cos2_pairs_within(
    withg: DataFrame, group_col: str, t2_100: int
) -> DataFrame:
    """(doc_a, doc_b, cos2_pct) for all within-group pairs (doc_a < doc_b)
    passing the sqrt-free cosine test dot ≥ 0 AND dot²·100 div (|a|²·|b|²)
    ≥ t2_100 — the pair stage shared by `cosine_dup_pairs` (LSH-bucket
    groups) and `semdedup` (k-means-cell groups).

    One Arrow batch per group (`applyInPandas`): the group's quantized
    vectors become one int64 matrix and ALL pairwise dots come from a
    single exact GEMM (`_dots_exact`) instead of a self-join evaluating an
    interpreted zip_with/aggregate per pair — no pair rows are ever
    materialized in the exchange (the old self-join shuffled O(c²) rows
    per group; this shuffles the c member rows once). Row blocks of 1024
    bound the scratch matrix, so a 100 TB cell never holds a c×c GEMM at
    once. Engine-exact parity notes: members are processed per distinct
    vector LENGTH (the JVM zip_with NULL-pads mismatched lengths into a
    NULL dot, dropping the pair — cross-length pairs are likewise never
    emitted here); zero-norm members produce nn = 0 whose division the
    JVM turns NULL (dropped) — masked out identically; ids sort ascending
    so doc_a < doc_b by construction."""
    import pandas as pd  # noqa: F401  (executor-side import)

    def pairs_fn(pdf):
        import numpy as np
        import pandas as pd

        a_out: list = []
        b_out: list = []
        c_out: list = []
        ids_all = pdf["vec_id"].to_numpy()
        vs = pdf["v"]
        lens = vs.map(lambda x: 0 if x is None else len(x)).to_numpy()
        for L in np.unique(lens):
            idx = np.nonzero(lens == L)[0]
            if len(idx) < 2 or L == 0:
                continue
            order = np.argsort(ids_all[idx])
            idx = idx[order]
            ids = ids_all[idx]
            V = np.stack([np.asarray(vs.iat[i], dtype=np.int64) for i in idx])
            n2 = (V * V).sum(axis=1)
            n = len(ids)
            cols = np.arange(n)[None, :]
            for s in range(0, n, 1024):
                e = min(n, s + 1024)
                D = _dots_exact(V[s:e], V)
                m = cols > np.arange(s, e)[:, None]
                ii, jj = np.nonzero(m)
                ii = ii + s
                d = D[m]
                nn = n2[ii] * n2[jj]
                keep = (d >= 0) & (nn > 0)
                d, nn, ii, jj = d[keep], nn[keep], ii[keep], jj[keep]
                cos2 = (d * d * 100) // nn
                keep = cos2 >= t2_100
                a_out.append(ids[ii[keep]])
                b_out.append(ids[jj[keep]])
                c_out.append(cos2[keep])
        if not a_out:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cos2_pct": []}).astype(
                {"doc_a": "int64", "doc_b": "int64", "cos2_pct": "int64"}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a_out),
                "doc_b": np.concatenate(b_out),
                "cos2_pct": np.concatenate(c_out),
            }
        )

    return withg.groupBy(group_col).applyInPandas(
        pairs_fn, "doc_a bigint, doc_b bigint, cos2_pct bigint"
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


def _hyperplane(p: int, dims: int = 64) -> Column:
    """Deterministic pseudo-random hyperplane p (integer pattern, exactly
    reproducible in SQL — see lsh_bucket_topk docstring)."""
    return F.array(
        *[
            F.lit(((p * 1315423911 + j * 2654435761) % 2001) - 1000).cast("bigint")
            for j in range(dims)
        ]
    )


def _bucket_expr(v: Column, planes: int) -> Column:
    # one literal array of hyperplanes + a fold instead of `planes`
    # unrolled dot subtrees — identical bit order (plane 0 is the MSB),
    # ~planes× smaller expression tree (see ops/kmeans.py:_assign)
    planes_lit = F.array(*[_hyperplane(p) for p in range(planes)])
    bits = F.transform(
        planes_lit,
        lambda pl: F.when(dot(v, pl) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.aggregate(
        bits,
        F.lit(0).cast("bigint"),
        lambda acc, bit: acc * 2 + bit,
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    scale: int = 1000,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space analog of
    MinHash near-dup: hyperplane-LSH buckets bound the candidate set, exact
    (quantized-integer) cosine verifies survivors. No all-pairs join ever
    runs; shuffle carries (bucket, vec_id, quantized vector) only, and
    over-wide buckets are dropped before the self-join (same "stop words"
    cap as ops.dedup.lsh_candidate_pairs).

    Exactness without sqrt: cos(a,b) >= t  <=>  dot >= 0 and
    dot^2 * 100 >= t^2*100 * |a|^2 * |b|^2 — all BIGINT arithmetic
    (quantized entries ≤ ~1000, 64 dims → dot^2·100 < 2^63), identical in
    any engine. Reported as ``cos2_pct`` = dot²·100 div (|a|²·|b|²).

    The within-bucket pair stage is one exact GEMM per bucket
    (`_cos2_pairs_within`): the self-join that shuffled O(bucket²) pair
    rows and evaluated an interpreted dot per pair is gone — the exchange
    carries each member row once."""
    v = quantize(F.col("embedding"), scale)
    withb = emb.select(
        "vec_id",
        v.alias("v"),
        _bucket_expr(v, planes).alias("bucket"),
    )
    if max_bucket_size is not None:
        ok = (
            withb.groupBy("bucket")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("bucket")
        )
        withb = withb.join(ok, "bucket", "left_semi")
    t2_100 = int(round(threshold * threshold * 100))
    return (
        _cos2_pairs_within(withb, "bucket", t2_100)
        .select(
            F.col("doc_a").alias("vec_a"),
            F.col("doc_b").alias("vec_b"),
            "cos2_pct",
        )
        .distinct()
    )


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    scale: int = 1000,
    centroids: list | None = None,
) -> DataFrame:
    """IVF BUILD step: assign every vector to its nearest of `n_cells`
    coarse centroids — returns (vec_id, v, cell). Centroids are the first
    `n_cells` stored vectors (a deterministic, SQL-expressible stand-in
    for k-means — a real deployment plugs trained centroids into the same
    plan).

    Zero-shuffle plan: the centroid table is BOUNDED (n_cells rows), so it
    is collected once and inlined as literal arrays — assignment becomes a
    pure projection (argmax over n_cells dot expressions inside codegen),
    no join, no shuffle of the vectors. The bounded collect is the same
    class as the lineage manifest read: driver state = n_cells × dim ints,
    independent of data size. NOTE it makes this function EAGER at
    plan-construction time (one key-pushdown fetch of n_cells rows);
    callers composing plans without executing, or running against a
    source that cannot be queried yet (a stream), pass ``centroids``
    explicitly — a list of Rows/dicts with `vec_id` and quantized `v`,
    exactly what a trained k-means would supply. Tie-free argmax:
    ord = dot·n_cells − cell is unique per (dot, cell), so assignment is
    deterministic in every engine. At write time `cell` becomes the
    partition column, so probes prune to n_probe/n_cells of the files."""
    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    cents = (
        centroids
        if centroids is not None
        else base.filter(F.col("vec_id") < n_cells).collect()
    )
    # the ord = dot·n_cells − cell tie-break is injective ONLY for cell ids
    # in [0, n_cells); an explicit centroid list with ids outside that range
    # could collide ord values and make assignment nondeterministic
    bad = [int(c["vec_id"]) for c in cents if not 0 <= int(c["vec_id"]) < n_cells]
    if bad:
        raise ValueError(
            f"centroid vec_ids {bad} outside [0, {n_cells}): renumber trained "
            "centroids to dense ids 0..n_cells-1 (keeping your own mapping) so "
            "the tie-free argmax stays deterministic"
        )
    # one exact GEMM per Arrow batch (V·Cᵀ, `_dots_exact`) with the same
    # injective ord = dot·n_cells − cell argmax — the interpreted
    # per-centroid dot expressions cost ~µs/element and dominated wall
    # clock at realistic codebook sizes (measured ~250 s for n_cells=357
    # over 128k rows in the 64× rehearsal; the kernel does it in seconds).
    # Fixed-width contract: rows not matching the centroid width assign
    # to NULL cell (the zip_with NULL-pad regime).
    crows = sorted((int(c["vec_id"]), [int(x) for x in c["v"]]) for c in cents)
    nc = int(n_cells)
    sc = int(scale)

    def assign(it):
        import numpy as np
        import pandas as pd

        cell_ids = np.array([c for c, _ in crows], dtype=np.int64)
        C = (
            np.array([cv for _, cv in crows], dtype=np.int64)
            if crows
            else np.zeros((0, 0), dtype=np.int64)
        )
        dims = C.shape[1] if crows else -1
        for pdf in it:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lens = pdf["e"].map(lambda x: -1 if x is None else len(x)).to_numpy()
            v_col = np.empty(n, dtype=object)
            v_col[:] = None
            cell_col = np.empty(n, dtype=object)
            cell_col[:] = None
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                if L < 0:
                    continue
                E = np.stack(
                    [np.asarray(pdf["e"].iat[i], dtype=np.float64) for i in idx]
                )
                V = np.floor(E * sc).astype(np.int64)
                if L == dims and len(cell_ids):
                    D = _dots_exact(V, C)
                    ords = D * nc - cell_ids[None, :]
                    cells = cell_ids[np.argmax(ords, axis=1)]
                    for t, i in enumerate(idx):
                        v_col[i] = V[t]
                        cell_col[i] = int(cells[t])
                else:
                    for t, i in enumerate(idx):
                        v_col[i] = V[t]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "v": v_col, "cell": cell_col}
            )

    return emb.select("vec_id", F.col("embedding").alias("e")).mapInPandas(
        assign, "vec_id bigint, v array<bigint>, cell int"
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    scale: int = 1000,
    assigned: DataFrame | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """IVF-style ANN probe: a query scores only its `n_probe` nearest
    cells. Pass ``assigned`` (a persisted/partitioned ``ivf_assign``
    output) to amortize the build across queries — the production shape;
    without it the index is built inline (one-shot convenience, costlier
    than brute force for a single query by construction).

    ``centroids`` MUST be the same list the assignment was built with
    when ``ivf_assign`` ran with explicit (e.g. trained) centroids —
    probing derives cell ids from it, and probing default cells against
    an assignment built from different ones would silently match
    nothing."""
    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(
            [(int(c["vec_id"]), [int(x) for x in c["v"]]) for c in centroids],
            "cell bigint, cv array<bigint>",
        )
    else:
        cents = base.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
    if assigned is None:
        assigned = ivf_assign(emb, n_cells=n_cells, scale=scale, centroids=centroids)
    qrow = base.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    probe = (
        cents.join(F.broadcast(qrow))
        .select("cell", (dot(F.col("cv"), F.col("qv")) * n_cells - F.col("cell")).alias("qord"))
        .orderBy(F.desc("qord"))
        .limit(n_probe)
        .select("cell")
    )
    cand = assigned.join(F.broadcast(probe), "cell", "left_semi").filter(
        F.col("vec_id") != query_vec_id
    )
    out = cand.join(F.broadcast(qrow)).select(
        "vec_id", dot(F.col("v"), F.col("qv")).alias("dot")
    )
    return out.orderBy(F.desc("dot"), F.asc("vec_id")).limit(k)


def ivf_assign_join(
    emb: DataFrame, centroids: DataFrame, n_cells: int, scale: int = 1000
) -> DataFrame:
    """IVF BUILD, large-codebook path: assignment via broadcast-join +
    ``max_by`` argmax instead of ``ivf_assign``'s inlined literal argmax.

    The inline path generates n_cells dot-product expressions per row —
    ideal whole-stage-codegen up to ~64 cells, but a 4096-cell codebook
    (the realistic 100 TB shape: n_cells ≈ √N) would blow up the generated
    method. Here the centroid table (n_cells rows — KBs to MBs) broadcasts,
    every vector scores its cells in a BroadcastNestedLoopJoin, and a
    map-side-combinable ``max_by`` picks the winner: the only exchange
    carries one (vec_id, v, cell) row per vector. Same tie-free
    ord = dot·n_cells − cell as ``ivf_assign``; a pytest proves the two
    paths produce identical assignments.

    ``centroids``: DataFrame of (cell: bigint in [0, n_cells), cv:
    array<bigint> quantized) — what a distributed k-means emits."""
    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    scored = base.join(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        "cell",
        (dot(F.col("v"), F.col("cv")) * n_cells - F.col("cell")).alias("ord"),
    )
    return scored.groupBy("vec_id").agg(
        F.first("v").alias("v"), F.max_by("cell", "ord").alias("cell")
    )


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.3,
    scale: int = 1000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public algorithm): k-means the
    embedding space, compare pairs ONLY within a cluster (exact
    integer cos² — the same sqrt-free test as `cosine_dup_pairs`), and
    keep one representative per connected near-duplicate group
    (min vec_id canonical, via the shared CC engine). The k-means-cell
    variant of `q_semantic_dedup`'s hyperplane-LSH bucketing — the
    paper's own blocking structure, useful when the corpus has learned
    cluster structure that random hyperplanes split.

    Returns (vec_id, cluster_id, is_canonical) for EVERY input vector.

    Scale shape: within-cell comparison is the paper's deliberate
    trade — cells hold ~N/k vectors, so the pairwise stage is
    O(N²/k) spread across k independent cells; k ≈ √N (the IVF sizing
    rule) makes that O(N^1.5) total and keeps every cell's self-join
    a within-partition job. The join shuffles quantized ints keyed by
    cell; CC shuffles (id, label) pairs only."""
    from .cluster import dedup_cluster_assign
    from .kmeans import _assign, kmeans_fit

    v = quantize(F.col("embedding"), scale)
    # the trained-centroid assignment is a pure literal-argmin expression,
    # so the cluster id is computed IN the same projection as the vector
    # and its norm — the old plan equi-joined two projections of the same
    # scan on vec_id just to attach `cluster` (2 Exchanges removed;
    # identical rows by construction)
    _, cents = kmeans_fit(emb, k=k, iters=iters, scale=scale)
    base = emb.select("vec_id", v.alias("v"))
    assigned = _assign(
        base, [(int(c["vec_id"]), [int(x) for x in c["v"]]) for c in cents], k
    )
    withc = assigned.select(
        "vec_id",
        "v",
        F.col("cell").alias("cluster"),
    )
    t2_100 = int(round(threshold * threshold * 100))
    # within-cell pairs via one exact GEMM per cell (`_cos2_pairs_within`)
    # instead of a self-join shuffling O(cell²) pair rows with an
    # interpreted dot per pair; NULL-cluster rows (ragged vectors) never
    # pair under the old equi-join either, so filtering them from the
    # PAIR stage only (they still reach the CC node list) is identical
    pairs = _cos2_pairs_within(
        withc.filter(F.col("cluster").isNotNull()), "cluster", t2_100
    ).select("doc_a", "doc_b")
    out = dedup_cluster_assign(
        emb.select(F.col("vec_id").alias("doc_id")), pairs
    )
    return out.select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "is_canonical"
    )


def ivf_upsert(
    index: DataFrame,
    new_emb: DataFrame,
    n_cells: int = 16,
    scale: int = 1000,
    centroids: list | None = None,
) -> DataFrame:
    """Append-only IVF index maintenance: assign ONLY the new batch to the
    FROZEN codebook and MERGE the assignments into the standing
    (vec_id, v, cell) index — updated vec_ids take the new assignment,
    fresh ones insert, everything else persists untouched.

    This is the 10^12-vector operating mode: the standing index is never
    re-fit and never re-scanned (the MERGE's anti-join probes it once on
    vec_id); per-batch work is O(batch) — the same incremental contract
    as `ops.dedup.dedup_incremental`. The codebook must be the one the
    standing index was built with (pass ``centroids`` explicitly — the
    default would re-derive them from the BATCH, silently forking the
    cell space); a pytest proves upsert == a from-scratch rebuild over
    the merged corpus under a fixed codebook."""
    if centroids is None:
        raise ValueError(
            "ivf_upsert requires the standing index's codebook via "
            "centroids= — deriving centroids from the new batch would "
            "fork the cell space"
        )
    from .maintenance import merge_upsert

    fresh = ivf_assign(new_emb, n_cells=n_cells, scale=scale, centroids=centroids)
    return merge_upsert(index, fresh, "vec_id")


def knn_join(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    scale: int = 1000,
    assigned: DataFrame | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """Batched ANN: top-k neighbors for EVERY query row against the IVF
    index in ONE plan — the semantic-dedup / retrieval shape (M queries ×
    index), not a per-query loop. Returns (query_id, vec_id, dot, rank)
    with rank 1..k by quantized dot desc, vec_id asc (deterministic).

    Plan, stage by stage:
    1. probe-cell selection is a PURE PROJECTION on the query side: the
       bounded centroid list is inlined as literal arrays and each query
       sorts its n_cells (ord, cell) structs and keeps n_probe — no join,
       no shuffle, same trick as ``ivf_assign``.
    2. probes explode to (query_id, qv, cell) — n_probe rows per query —
       and equi-join the assignment on ``cell``. With ``assigned`` read
       from a cell-partitioned table this is the pruned-scan path; the
       shuffle carries quantized vectors, never floats or text. Join-key
       cardinality is n_cells, so size the codebook to ≥ a few × cluster
       cores at scale (n_cells ≈ √N does this naturally); AQE skew-join
       splits any hot cell.
    3. per-query top-k via ``row_number() <= k`` — Spark's
       WindowGroupLimit pushes a partial top-k below the exchange, so at
       most k rows per query per input partition shuffle.

    A vector lives in exactly one cell, so no (query, vec) pair is scored
    twice and no distinct step is needed. Self-matches (query_id ==
    vec_id, the corpus-vs-itself dedup case) are dropped.

    ``centroids`` follows ``ivf_assign``'s contract (dense ids 0..n_cells-1);
    for codebooks too large to inline, build with ``ivf_assign_join`` and
    pass ``assigned`` + ``centroids`` explicitly."""
    from pyspark.sql import Window

    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    cents = (
        centroids
        if centroids is not None
        else base.filter(F.col("vec_id") < n_cells).collect()
    )
    if assigned is None:
        # pass the centroid rows through: ivf_assign would otherwise run
        # the identical bounded collect a second time (one pushdown job
        # per plan construction)
        assigned = ivf_assign(emb, n_cells=n_cells, scale=scale, centroids=cents)
    # same injectivity requirement as ivf_assign — and it must hold even
    # when a pre-built `assigned` skips that path, because the probe's
    # ord sort uses the identical tie-break
    bad = [int(c["vec_id"]) for c in cents if not 0 <= int(c["vec_id"]) < n_cells]
    if bad:
        raise ValueError(
            f"centroid vec_ids {bad} outside [0, {n_cells}): renumber trained "
            "centroids to dense ids 0..n_cells-1 so probe-cell selection "
            "stays deterministic"
        )
    qdf = (queries if queries is not None else emb).select(
        F.col("vec_id").alias("query_id"),
        quantize(F.col("embedding"), scale).alias("qv"),
    )
    # negated ord: sort_array is ascending, we want best (max ord) first
    # (single literal array-of-arrays + one lambda — see ivf_assign)
    _cells_lit = F.array(*[F.lit(int(c["vec_id"])) for c in cents])
    _cvs_lit = F.array(
        *[F.array(*[F.lit(int(x)) for x in c["v"]]) for c in cents]
    )
    probe_structs = F.zip_with(
        _cvs_lit,
        _cells_lit,
        lambda cv, cell: F.struct(
            (-(dot(F.col("qv"), cv) * n_cells - cell)).alias("negord"),
            cell.alias("cell"),
        ),
    )
    cells = F.transform(
        F.slice(F.sort_array(probe_structs), 1, n_probe), lambda s: s["cell"]
    )
    probes = qdf.select("query_id", "qv", F.explode(cells).alias("cell"))

    # stage 2+3 pair scoring: cogroup probes and the assignment per cell
    # and compute every (query, member) dot of a cell with ONE exact GEMM
    # (`_dots_exact`) instead of an equi-join evaluating an interpreted
    # zip_with/aggregate per pair. The function also applies the per-cell
    # partial top-k (the Python-side twin of the WindowGroupLimit the old
    # plan relied on): only the k best (dot desc, vec_id asc) rows per
    # (query, cell) are emitted — a global-top-k superset by the standard
    # partial top-k argument — so the exchange feeding the final window
    # carries k rows per query per cell, never the c·|queries| pair set.
    # JVM parity: cross-width (ragged) pairs would dot to NULL and rank
    # last in the old window — they are likewise never emitted here
    # (per-length GEMM), assuming the fixed-width stored-table contract.
    kk = int(k)

    def cell_topk(probe_pdf, member_pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"query_id": [], "vec_id": [], "dot": []}
        ).astype({"query_id": "int64", "vec_id": "int64", "dot": "int64"})
        if len(probe_pdf) == 0 or len(member_pdf) == 0:
            return empty
        out = [empty]
        qids_all = probe_pdf["query_id"].to_numpy()
        mids_all = member_pdf["vec_id"].to_numpy()
        qlens = probe_pdf["qv"].map(len).to_numpy()
        mlens = member_pdf["v"].map(len).to_numpy()
        for L in np.unique(qlens):
            qi = np.nonzero(qlens == L)[0]
            mi = np.nonzero(mlens == L)[0]
            if L == 0 or len(qi) == 0 or len(mi) == 0:
                continue
            Q = np.stack(
                [np.asarray(probe_pdf["qv"].iat[i], dtype=np.int64) for i in qi]
            )
            M = np.stack(
                [np.asarray(member_pdf["v"].iat[i], dtype=np.int64) for i in mi]
            )
            mids = mids_all[mi]
            morder = np.argsort(mids)  # vec_id asc for deterministic ties
            mids = mids[morder]
            D = _dots_exact(Q, M[morder])
            for row, qid in enumerate(qids_all[qi]):
                d = D[row]
                keep = mids != qid  # self-match excluded before top-k
                dk, mk = d[keep], mids[keep]
                if len(dk) > kk:
                    # top-k by (dot desc, vec_id asc): mids are ascending,
                    # so a STABLE sort on -dot breaks ties on vec_id asc
                    sel = np.argsort(-dk, kind="stable")[:kk]
                else:
                    sel = np.arange(len(dk))
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": mk[sel], "dot": dk[sel]}
                    )
                )
        return pd.concat(out, ignore_index=True)

    scored = (
        probes.groupBy("cell")
        .cogroup(assigned.select("cell", "vec_id", "v").groupBy("cell"))
        .applyInPandas(cell_topk, "query_id bigint, vec_id bigint, dot bigint")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", F.col("rank").cast("bigint").alias("rank"))
    )


def mean_pool(
    emb: DataFrame,
    group: Column | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Pool chunk/turn embeddings into document embeddings by elementwise
    mean — the bridge from ``ops.corpus.chunk_documents`` (docs → chunks →
    embeddings) back to one vector per document for the ANN index.

    Returns LONG format (group_id, pos, pooled_val): one row per dimension,
    pooled_val = floor(Σ quantized / n). The shuffle carries each quantized
    vector ONCE (one row per input vector, 64 ints); the elementwise sum
    runs as a zip_with reduction over the grouped arrays — integer
    addition, so the result is identical under any aggregation order
    (float mean would drift with partitioning). Floor division is spelled
    sign-safely ((s − ((s%n + n)%n)) div n) because Spark's `div`
    truncates toward zero while the mean of negative quantized entries
    must floor — the same expression is exact in any engine.

    ``group``: grouping expression (default: vec_id div 4 — four chunks
    per parent doc, the synthetic layout; pass e.g. F.col("doc_id") when
    chunks carry their parent id). Embedding width is fixed at 64 (the
    synthetic schema; the zip_with reduction itself is width-agnostic)."""
    g = group if group is not None else (F.col("vec_id") - F.col("vec_id") % 4) / 4
    q = quantize(F.col("embedding"), scale)
    grouped = (
        emb.select(g.cast("bigint").alias("group_id"), q.alias("v"))
        .groupBy("group_id")
        .agg(F.collect_list("v").alias("vs"), F.count(F.lit(1)).alias("n"))
    )
    summed = F.aggregate(
        F.col("vs"),
        F.array_repeat(F.lit(0).cast("bigint"), 64),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    # (s - floor-mod) is exactly divisible by n and far below 2^53, so the
    # double division is exact; cast back to bigint
    pooled = F.transform(
        summed,
        lambda s: (
            (s - ((s % F.col("n") + F.col("n")) % F.col("n"))) / F.col("n")
        ).cast("bigint"),
    )
    return grouped.select(
        "group_id", F.posexplode(pooled).alias("pos", "pooled_val")
    ).select(
        "group_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("pooled_val").cast("bigint").alias("pooled_val"),
    )


def lsh_assign(emb: DataFrame, planes: int = 8, scale: int = 1000) -> DataFrame:
    """LSH BUILD step: (vec_id, v, bucket) — sign of the dot with `planes`
    deterministic pseudo-random hyperplanes forms the bucket id. A pure
    zero-shuffle projection (planes are literals); write `partitionBy
    (bucket)` once and probes prune to one bucket's files. Uses the SAME
    `_hyperplane`/`_bucket_expr` helpers as cosine_dup_pairs, so build
    buckets and near-dup buckets can never desynchronize."""
    qv = quantize(F.col("embedding"), scale)
    return emb.select(
        "vec_id", qv.alias("v"), _bucket_expr(qv, planes).alias("bucket")
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    planes: int = 8,
    scale: int = 1000,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucketed ANN probe: search only the query's bucket. Pass
    ``assigned`` (a bucket-partitioned ``lsh_assign`` output) to skip
    recomputing signatures and prune the scan to one bucket's files."""
    with_bucket = (
        assigned if assigned is not None else lsh_assign(emb, planes=planes, scale=scale)
    )
    qrow = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = with_bucket.filter(F.col("vec_id") != query_vec_id)
    scored = (
        cand.join(F.broadcast(qrow), cand.bucket == F.col("qbucket"))
        .select("vec_id", dot(F.col("v"), F.col("qv")).alias("dot"))
    )
    return scored.orderBy(F.desc("dot"), F.asc("vec_id")).limit(k)


def sq8_rerank_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_candidates: int = 50,
    scale: int = 1000,
) -> DataFrame:
    """Scalar-quantized (SQ8) two-stage ANN: score ALL vectors with cheap
    int8-grid dot products (floor(x·127) clamped to [-127,127] — 8 bits of
    the mantissa, the memory/bandwidth trick every SQ index uses), keep the
    top `n_candidates`, then rerank ONLY those with the full-precision
    quantized dot. At 100 TB the first pass reads an int8 column an eighth
    the size of the float column; the exact rerank touches `n_candidates`
    rows. Fully integer arithmetic — value-verified against SQL."""
    def sq8(col: Column) -> Column:
        return F.transform(
            col,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x.cast("double") * 127)),
            ).cast("bigint"),
        )

    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        sq8(F.col("embedding")).alias("q8"),
        quantize(F.col("embedding"), scale).alias("qv"),
    )
    cand = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id",
        sq8(F.col("embedding")).alias("v8"),
        quantize(F.col("embedding"), scale).alias("v"),
    )
    coarse = (
        cand.join(F.broadcast(q))
        .select("vec_id", "v", "qv", dot(F.col("v8"), F.col("q8")).alias("approx"))
        .orderBy(F.desc("approx"), F.asc("vec_id"))
        .limit(n_candidates)
    )
    return (
        coarse.select("vec_id", dot(F.col("v"), F.col("qv")).alias("dot"))
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction (Johnson–Lindenstrauss index)
# ---------------------------------------------------------------------------


def random_project(
    emb: DataFrame, out_dims: int = 16, scale: int = 1000, dims: int = 64
) -> DataFrame:
    """(vec_id, rv): project every embedding from `dims` to `out_dims`
    integer coordinates — rv[j] = <quantized v, plane_j> with the same
    deterministic integer hyperplanes as the LSH path (`_hyperplane`;
    production swaps in seeded ±1 Rademacher or Gaussian rows through the
    identical contract). JL: pairwise dot products are approximately
    preserved, so the 4×-smaller projected table IS the stored ANN index;
    full vectors are only fetched for rerank survivors.

    Zero shuffle: the projection is one exact GEMM per Arrow batch
    (V·Pᵀ over the deterministic integer plane matrix, `_dots_exact` —
    identical BIGINTs to the per-plane dot expressions it replaces, which
    ran as interpreted higher-order functions). At 100 TB the projected
    index is what you persist, bucket, and probe — scans read
    out_dims·8 bytes per row instead of the raw embedding column.
    Fixed-width contract: rows whose embedding is not `dims` wide project
    to NULL rv (the JVM zip_with NULL-pad produced NULL entries there)."""
    P = [
        [((j * 1315423911 + i * 2654435761) % 2001) - 1000 for i in range(dims)]
        for j in range(out_dims)
    ]
    sc = int(scale)

    def project(it):
        import numpy as np
        import pandas as pd

        Pm = np.array(P, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            lens = pdf["embedding"].map(len).to_numpy()
            ok = np.nonzero(lens == dims)[0]
            rv = np.empty(len(pdf), dtype=object)
            rv[:] = None
            if len(ok):
                E = np.stack(
                    [np.asarray(pdf["embedding"].iat[i], dtype=np.float64) for i in ok]
                )
                V = np.floor(E.astype(np.float64) * sc).astype(np.int64)
                R = _dots_exact(V, Pm)
                for t, i in enumerate(ok):
                    rv[i] = R[t]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "rv": rv})

    return emb.select("vec_id", "embedding").mapInPandas(
        project, "vec_id bigint, rv array<bigint>"
    )


def rp_rerank_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_candidates: int = 40,
    out_dims: int = 16,
    scale: int = 1000,
    projected: DataFrame | None = None,
) -> DataFrame:
    """Top-k by exact quantized dot, shortlisted in projected space:
    rank ALL rows by the 16-int projected dot against the projected query
    (TakeOrdered(n_candidates), no global sort), then fetch ONLY the
    shortlist's full vectors (bounded broadcast semi-join back to the
    embedding table) and rerank by the exact 64-dim dot.

    The build/probe split mirrors `ivf_assign`/`ivf_topk`: pass a persisted
    ``projected`` index to skip the projection scan. Unlike `sq8_rerank_topk`
    (which carries both the coarse and exact vectors through one scan),
    the coarse pass here never touches the full embedding column — the
    100 TB shape where the raw vectors live in cold storage and only
    n_candidates of them are ever fetched.

    Returns (vec_id, approx_dot, dot) — shortlist score kept for recall
    audits. Deterministic ties: (score desc, vec_id asc) at both stages."""
    if projected is not None:
        proj = projected
        qp = proj.filter(F.col("vec_id") == query_vec_id).select(
            F.col("rv").alias("qrv")
        )
    else:
        proj = random_project(emb, out_dims, scale)
        # project the 1-row query from a pre-filtered scan: a filter on the
        # mapInPandas output cannot push below the opaque Python node, so
        # filtering first keeps the query-side projection a 1-row job
        # instead of a second full pass (identical values — the projection
        # is row-local)
        qp = random_project(
            emb.filter(F.col("vec_id") == query_vec_id), out_dims, scale
        ).select(F.col("rv").alias("qrv"))
    shortlist = (
        proj.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qp))
        .select("vec_id", dot(F.col("rv"), F.col("qrv")).alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), F.asc("vec_id"))
        .limit(n_candidates)
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize(F.col("embedding"), scale).alias("qv")
    )
    full = emb.select("vec_id", quantize(F.col("embedding"), scale).alias("v"))
    return (
        # bounded (n_candidates rows) build side: broadcast so the fetch is
        # a broadcast hash join over the embedding scan, never a shuffle
        F.broadcast(shortlist).join(full, "vec_id")
        .join(F.broadcast(q))
        .select("vec_id", "approx_dot", dot(F.col("v"), F.col("qv")).alias("dot"))
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(k)
    )


def knn_recall_eval(
    emb: DataFrame,
    max_query_id: int = 50,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    scale: int = 1000,
) -> DataFrame:
    """ANN quality harness: recall@k of the IVF `knn_join` against exact
    brute-force ground truth, per query — the eval every ANN deployment
    runs when tuning n_cells/n_probe. Returns (query_id, n_hits,
    recall_bps) with recall_bps = 10000 * |approx ∩ exact| div k.

    Scale shape: ground truth is computed ONLY for the bounded query
    sample (the standard recall protocol — never corpus × corpus): the
    sample broadcasts against one scan of the corpus, per-query top-k via
    WindowGroupLimit (k rows per query per partition cross the exchange).
    The approx side is the production `knn_join` plan unchanged, so the
    harness measures exactly what serving runs. Intersection is a
    digest-width (query_id, vec_id) semi-join."""
    from pyspark.sql import Window

    queries = emb.filter(F.col("vec_id") < max_query_id)
    approx = knn_join(
        emb, queries=queries, k=k, n_cells=n_cells, n_probe=n_probe, scale=scale
    ).select("query_id", "vec_id")
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        quantize(F.col("embedding"), scale).alias("qq"),
    )
    # the bounded query sample is collected once (max_query_id rows — the
    # same driver-state class as ivf_assign's centroid fetch) and every
    # corpus batch scores ALL queries with one exact GEMM in mapInPandas,
    # emitting only its per-batch top-k per query (a superset of the
    # global top-k, the partial top-k argument) — the old plan broadcast
    # the sample and evaluated |queries| interpreted dots per corpus row,
    # shipping every pair into the rank window. Fixed-width contract as
    # in knn_join: ragged rows never enter the ground truth.
    qrows = sorted(
        ((int(r["query_id"]), [int(x) for x in r["qq"]]) for r in qv.collect())
    )
    kk = int(k)
    base = emb.select("vec_id", quantize(F.col("embedding"), scale).alias("v"))

    def exact_topk(it):
        import numpy as np
        import pandas as pd

        qids = np.array([q for q, _ in qrows], dtype=np.int64)
        by_len: dict = {}
        for q, vec in qrows:
            by_len.setdefault(len(vec), []).append((q, vec))
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids_all = pdf["vec_id"].to_numpy()
            lens = pdf["v"].map(len).to_numpy()
            for L, qs in by_len.items():
                if L == 0:
                    continue
                mi = np.nonzero(lens == L)[0]
                if len(mi) == 0:
                    continue
                ids = ids_all[mi]
                order = np.argsort(ids)
                ids = ids[order]
                V = np.stack(
                    [np.asarray(pdf["v"].iat[i], dtype=np.int64) for i in mi[order]]
                )
                Q = np.array([vec for _, vec in qs], dtype=np.int64)
                D = _dots_exact(Q, V)
                for row, (qid, _) in enumerate(qs):
                    d = D[row]
                    keep = ids != qid
                    dk, mk = d[keep], ids[keep]
                    if len(dk) > kk:
                        sel = np.argsort(-dk, kind="stable")[:kk]
                    else:
                        sel = np.arange(len(dk))
                    yield pd.DataFrame({"query_id": qid, "vec_id": mk[sel], "dot": dk[sel]})

    scored = base.mapInPandas(
        exact_topk, "query_id bigint, vec_id bigint, dot bigint"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr(f"(10000L * coalesce(n_hits, 0L)) div {k}L").cast("bigint").alias(
                "recall_bps"
            ),
        )
    )


def knn_outlier_scores(
    emb: DataFrame, k: int = 5, n_cells: int = 16, scale: int = 1000
) -> DataFrame:
    """Cell-blocked k-NN outlier scores: every vector is scored by the
    quantized dot product of its k-th most-similar neighbor WITHIN its
    IVF cell — a low kth_dot means nothing near it even in its own
    region of space (the distance-to-kth-neighbor outlier definition,
    computed the SemDeDup way: pairs only inside Lloyd/IVF cells,
    O(N²/cells), never all-pairs). Vectors with fewer than k cell-mates
    are scored by their weakest available neighbor; vectors alone in a
    cell get n_neighbors = 0 and NULL kth_dot — counted, not dropped.

    Returns (vec_id, cell, n_neighbors, kth_dot).

    Scale shape: assignment is the zero-shuffle literal-centroid
    projection (`ivf_assign`); each cell's k-th-neighbor scores come from
    ONE exact GEMM over the cell's members inside `applyInPandas`
    (`_dots_exact`, 1024-row blocks bound the scratch matrix) — the old
    plan shuffled the O(c²) pair rows of every cell into a rank window
    and equi-joined the scores back on vec_id; this shuffles each member
    row ONCE and emits one scored row per member directly (pair exchange,
    two windows and the attach join all gone). JVM parity: a pair of
    mismatched widths dotted to NULL and ranked last — here the k-th rank
    falling past the same-width neighbor count likewise yields NULL
    kth_dot; n_neighbors counts every cell-mate, matching the old
    count window."""

    assigned = ivf_assign(emb, n_cells=n_cells, scale=scale)
    kk = int(k)

    def cell_scores(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        ids = pdf["vec_id"].to_numpy()
        nb = n - 1
        kth = np.empty(n, dtype=object)
        kth[:] = None
        lens = pdf["v"].map(len).to_numpy()
        for L in np.unique(lens):
            idx = np.nonzero(lens == L)[0]
            if L == 0 or len(idx) < 2:
                continue
            V = np.stack([np.asarray(pdf["v"].iat[i], dtype=np.int64) for i in idx])
            m = len(idx)
            n_fin = m - 1  # finite (same-width) neighbors per member
            take = min(kk, nb)
            if take > n_fin:
                continue  # rank falls into the NULL-dot tail → NULL kth_dot
            for s in range(0, m, 1024):
                e = min(m, s + 1024)
                D = _dots_exact(V[s:e], V).astype(np.float64)
                D[np.arange(e - s), np.arange(s, e)] = -np.inf  # self out
                vals = np.partition(D, m - take, axis=1)[:, m - take]
                for t in range(s, e):
                    kth[idx[t]] = int(vals[t - s])
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "n_neighbors": np.full(n, nb, dtype=np.int64),
                "kth_dot": kth,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        cell_scores, "vec_id bigint, cell int, n_neighbors bigint, kth_dot bigint"
    )


def mmr_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    pool: int = 20,
    lam_num: int = 7,
    lam_den: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998 — public): greedily pick k results maximizing
    λ·sim(query, d) − (1−λ)·max sim(d, already-selected), with λ as the
    integer ratio lam_num/lam_den so scores stay exact BIGINTs
    (mmr = lam_num·dot_q − (lam_den−lam_num)·max_sel_dot). Ties break
    on vec_id ascending; round 1 is plain top-1 by relevance.

    Returns (rank, vec_id, mmr) — rank 1..k in selection order.

    Scale shape: one TakeOrdered pass builds the `pool`-row candidate
    shortlist (the only stage touching data volume); the k greedy
    rounds run over that bounded pool with one 1-row collect per round
    — the same bounded-driver-state class as the BPE merge loop
    (documented there), k·pool ≤ a few hundred rows total."""
    if not (0 < lam_num < lam_den):
        raise ValueError(f"need 0 < lam_num < lam_den, got {lam_num}/{lam_den}")
    if k < 1 or pool < k:
        raise ValueError(f"need 1 <= k <= pool, got k={k} pool={pool}")
    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    qrow = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    cand = (
        base.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qrow))
        .select("vec_id", "v", dot(F.col("v"), F.col("qv")).alias("dq"))
        .orderBy(F.desc("dq"), F.asc("vec_id"))
        .limit(pool)
        .cache()
    )
    mu = lam_den - lam_num
    picked: list[tuple[int, int, int]] = []  # (rank, vec_id, mmr)
    sel_vecs: list[list[int]] = []
    for r in range(1, k + 1):
        if not sel_vecs:
            scored = cand.select(
                "vec_id", "v", (F.lit(lam_num) * F.col("dq")).alias("mmr")
            )
        else:
            max_sel = F.greatest(
                *[
                    dot(F.col("v"), F.array(*[F.lit(int(x)) for x in sv]))
                    for sv in sel_vecs
                ]
            ) if len(sel_vecs) > 1 else dot(
                F.col("v"), F.array(*[F.lit(int(x)) for x in sel_vecs[0]])
            )
            scored = cand.filter(
                ~F.col("vec_id").isin([p[1] for p in picked])
            ).select(
                "vec_id",
                "v",
                (F.lit(lam_num) * F.col("dq") - F.lit(mu) * max_sel).alias("mmr"),
            )
        top = scored.orderBy(F.desc("mmr"), F.asc("vec_id")).first()
        picked.append((r, int(top["vec_id"]), int(top["mmr"])))
        sel_vecs.append([int(x) for x in top["v"]])
    cand.unpersist()
    return emb.sparkSession.createDataFrame(
        picked, "rank int, vec_id bigint, mmr bigint"
    )


def hard_negatives_topk(
    emb: DataFrame,
    n_queries: int = 50,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    scale: int = 1000,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the top-k most
    similar vectors with a DIFFERENT label — the batch that makes a
    contrastive/embedding trainer sweat (easy negatives are far; hard
    ones sit just across the boundary). The label-filtered variant of
    ``knn_join``: same probe arithmetic and tie-free ord, but the
    different-label predicate lands BEFORE the per-anchor top-k window,
    so an anchor surrounded by same-label vectors still surfaces k true
    negatives from its probed cells rather than an empty page.

    Returns (query_id, vec_id, dot, neg_rank) with neg_rank 1..k by
    quantized dot desc, vec_id asc.

    Scale shape: identical to knn_join (projection-only probe-cell
    selection over inlined literal centroids, one equi-join on the
    n_cells-cardinality cell key, WindowGroupLimit top-k) — the label
    rides the assignment rows as one extra integer; no added
    shuffle."""
    from pyspark.sql import Window

    assigned = ivf_assign(emb, n_cells=n_cells, scale=scale).join(
        emb.select("vec_id", F.col("label").alias("v_label")), "vec_id"
    )
    v = quantize(F.col("embedding"), scale)
    base = emb.select("vec_id", v.alias("v"))
    cents = base.filter(F.col("vec_id") < n_cells).collect()
    qdf = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        quantize(F.col("embedding"), scale).alias("qv"),
        F.col("label").alias("q_label"),
    )
    # single literal array-of-arrays + one lambda — see ivf_assign
    _cells_lit = F.array(*[F.lit(int(c["vec_id"])) for c in cents])
    _cvs_lit = F.array(
        *[F.array(*[F.lit(int(x)) for x in c["v"]]) for c in cents]
    )
    probe_structs = F.zip_with(
        _cvs_lit,
        _cells_lit,
        lambda cv, cell: F.struct(
            (-(dot(F.col("qv"), cv) * n_cells - cell)).alias("negord"),
            cell.alias("cell"),
        ),
    )
    cells = F.transform(
        F.slice(F.sort_array(probe_structs), 1, n_probe), lambda s: s["cell"]
    )
    probes = qdf.select("query_id", "qv", "q_label", F.explode(cells).alias("cell"))
    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(~F.col("v_label").eqNullSafe(F.col("q_label")))
        .select("query_id", "vec_id", dot(F.col("v"), F.col("qv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "dot",
            F.col("neg_rank").cast("bigint").alias("neg_rank"),
        )
    )
