"""Product quantization (PQ) over the embeddings table — the vector
compression that makes billion-scale ANN storable: split each dims-dim
vector into ``m`` subspaces, k-means each subspace independently
(``pq_fit``), store each vector as m small code ids (``pq_encode`` —
64 floats become 4 bytes at m=4/k=16), and answer queries with an
asymmetric-distance (ADC) scan: one m×k distance table per query, then a
table lookup + sum per stored code (``pq_adc_topk``). Completes the
quantization family next to SQ8 (`similarity.sq8_rerank_topk`) and the
JL projection index (`similarity.random_project`).

Spark-first shapes:
- **fit**: one FUSED Lloyd loop for all m subspaces — per round a single
  pass assigns every subspace's cell and aggregates per (subspace, cell)
  under one exchange (bounded driver state: m·k×subdims ints per round),
  instead of m independent scans. At 100 TB codebooks are trained on a
  sample (this module is agnostic: pass any `emb` you like), then the
  full corpus is encoded in one pass.
- **encode**: nearest-centroid argmin per subspace with codebooks inlined
  as literals — a pure whole-stage-codegen projection, ZERO shuffle, one
  pass (the `kmeans._assign` / `ivf_assign` pattern; m·k·subdims = dims·k
  literals, a bounded plan-compile cost that is constant in data size).
- **ADC scan**: the query's m×k distance table is a tiny DataFrame
  (codebook ⨯ 1-row query, broadcast); stored codes posexplode to
  (vec_id, sub, code) and probe it with a broadcast hash join; the
  per-vector sum is a map-side-combinable groupBy(vec_id) and the top-k
  is TakeOrdered — no global sort, nothing row-scaled on the driver.

Determinism (oracle-exact): integer-grid quantization, exact BIGINT
distances, argmin ties to the LOWEST code id via (dist², code) struct
min, floor-quantized centroid means — all inherited from ops/kmeans.py,
so the full fit→encode→scan pipeline value-matches an unrolled DuckDB
twin.

No reference analog (logzoom has no vector surface); extends the
training-data operator set mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_fit, lloyd_partial_sums
from .similarity import quantize

Codebooks = list[list[dict]]


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
    init: list[tuple[int, list[int]]] | None = None,
) -> Codebooks:
    """Train m per-subspace codebooks; returns
    ``codebooks[j] = [{"code": id, "v": [subdims ints]}, ...]``.
    Subspace j covers embedding dims [j·dims/m, (j+1)·dims/m). Init
    centroids per subspace are the vec_id < k rows' subvectors (the
    deterministic seeding documented in ops/kmeans.py).

    All m subspace Lloyd loops run as ONE fused loop: a single init
    collect (sliced driver-side), and per round a single pass of the
    Arrow/numpy partial-sum kernel (`kmeans.lloyd_partial_sums`, one
    slice-job per subspace — exact GEMM assignment, ≤ m·k partial rows
    per batch into a tiny groupBy) instead of m independent scans with
    interpreted argmin projections. Centroids are bit-identical to the
    per-subspace loops: each subspace's arithmetic is untouched, only
    co-scheduled."""
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    sub = dims // m
    if init is None:
        # ``init``: pre-supplied (vec_id, quantized full-width vector)
        # seeds, for inputs behind an opaque Python stage where this
        # key-pushdown fetch would otherwise be a full pass (the residual
        # build derives its seeds driver-side instead)
        base = emb.select(
            "vec_id", quantize(F.col("embedding"), scale).alias("v")
        )
        init = sorted(
            (int(r["vec_id"]), [int(x) for x in r["v"]])
            for r in base.filter(F.col("vec_id") < k).collect()
        )
    if not init:
        raise ValueError(f"no init centroids: no vec_id in [0, {k})")
    # per-subspace centroid lists [(cell, [sub ints]), ...]; slicing after
    # quantize == quantizing the slice (elementwise), matching the old
    # per-subspace kmeans_fit(emb_j) exactly
    cents: list[list[tuple[int, list[int]]]] = []
    for j in range(m):
        cj = [(vid, v[j * sub : (j + 1) * sub]) for vid, v in init]
        for _, cv in cj:
            if len(cv) != sub:
                raise ValueError(
                    f"dims={sub} but embeddings have {len(cv)} dimensions"
                )
        cents.append(cj)

    raw = emb.select("vec_id", F.col("embedding").alias("e"))
    if iters > 1:
        raw = raw.persist()
    try:
        for _ in range(iters - 1):
            part = lloyd_partial_sums(
                raw,
                [(j, j * sub, False, cents[j]) for j in range(m)],
                sub,
                scale,
            )
            sums = part.groupBy("subj", "cell").agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(sub)],
            )
            rows = sums.collect()
            cents = [
                sorted(
                    (
                        int(r["cell"]),
                        [int(r[f"s{i}"]) // int(r["n"]) for i in range(sub)],
                    )
                    for r in rows
                    if int(r["subj"]) == j
                )
                for j in range(m)
            ]
    finally:
        if iters > 1:
            raw.unpersist()
    return [[{"code": c, "v": cv} for c, cv in cents[j]] for j in range(m)]


def _encode_kernel(
    codebooks: Codebooks,
    scale: int,
    coarse: list | None = None,
    residual: bool = False,
):
    """Arrow-batch encode kernel shared by `pq_encode` and the index
    builds: quantize (floor(float64·scale) — bit-identical to the JVM
    `quantize`), per subspace one exact-GEMM argmin against the codebook
    (`_dots_exact`; ties to the LOWEST code id — books are code-sorted so
    argmin's first minimum is the lowest id), NULL code for subspaces the
    row is too short to fill (the zip_with NULL-pad semantics). With
    ``coarse`` the kernel also assigns the coarse cell (full-width argmin,
    NULL unless the row width matches exactly) and, with ``residual``,
    encodes v − coarse_centroid[cell] instead of v (rows without a cell
    get all-NULL codes, like the NULL-propagating map lookup they
    replace)."""
    m = len(codebooks)
    sub = len(codebooks[0][0]["v"])
    books = [
        sorted((int(e["code"]), [int(x) for x in e["v"]]) for e in book)
        for book in codebooks
    ]
    cents = (
        sorted((int(c["vec_id"]), [int(x) for x in c["v"]]) for c in coarse)
        if coarse is not None
        else None
    )
    sc = int(scale)

    def enc(it):
        import numpy as np
        import pandas as pd

        from logzoom_spark.ops.similarity import _dots_exact

        B = [
            (np.array([c for c, _ in bk], dtype=np.int64),
             np.array([cv for _, cv in bk], dtype=np.int64))
            for bk in books
        ]
        if cents is not None:
            cell_ids = np.array([c for c, _ in cents], dtype=np.int64)
            CC = np.array([cv for _, cv in cents], dtype=np.int64)
            dims = CC.shape[1]

        def argmin_codes(S, j):
            codes_j, CV = B[j]
            G = _dots_exact(S, CV)
            D2 = (S * S).sum(1)[:, None] - 2 * G + (CV * CV).sum(1)[None, :]
            return codes_j[np.argmin(D2, axis=1)]

        for pdf in it:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lens = pdf["e"].map(lambda x: -1 if x is None else len(x)).to_numpy()
            codes_col = np.empty(n, dtype=object)
            cell_col = np.empty(n, dtype=object)
            cell_col[:] = None
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                if L < 0:
                    for i in idx:
                        codes_col[i] = [None] * m
                    continue
                E = np.stack(
                    [np.asarray(pdf["e"].iat[i], dtype=np.float64) for i in idx]
                )
                V = np.floor(E * sc).astype(np.int64)
                mat = np.empty((len(idx), m), dtype=object)
                mat[:] = None
                if cents is not None and L == dims:
                    G = _dots_exact(V, CC)
                    D2 = (V * V).sum(1)[:, None] - 2 * G + (CC * CC).sum(1)[None, :]
                    cells = cell_ids[np.argmin(D2, axis=1)]
                    for t, i in enumerate(idx):
                        cell_col[i] = int(cells[t])
                    if residual:
                        V = V - CC[np.searchsorted(cell_ids, cells)]
                if residual and (cents is None or L != dims):
                    # no cell → NULL residual → every subspace code NULL
                    for i in idx:
                        codes_col[i] = [None] * m
                    continue
                for j in range(m):
                    if (j + 1) * sub <= L:
                        got = argmin_codes(V[:, j * sub : (j + 1) * sub], j)
                        mat[:, j] = got.astype(object)
                for t, i in enumerate(idx):
                    codes_col[i] = list(mat[t])
            out = {"vec_id": pdf["vec_id"], "codes": codes_col}
            if cents is not None:
                out["cell"] = cell_col
            yield pd.DataFrame(out)

    return enc


def pq_encode(
    emb: DataFrame, codebooks: Codebooks, scale: int = 1000
) -> DataFrame:
    """(vec_id, codes array<int>): per subspace, the id of the nearest
    codebook centroid — ties to the lowest code id, ragged/short rows get
    NULL code for the affected subspace (the kmeans NULL-guard). One
    Arrow-batch pass (`_encode_kernel`): zero shuffle, exact-GEMM argmin
    per subspace instead of interpreted per-code distance expressions."""
    if len(codebooks) == 0:
        raise ValueError("codebooks must be non-empty")
    return emb.select("vec_id", F.col("embedding").alias("e")).mapInPandas(
        _encode_kernel(codebooks, scale), "vec_id bigint, codes array<int>"
    )


def _adc_dist_table(
    emb: DataFrame, codebooks: Codebooks, query_vec_id: int, scale: int
) -> DataFrame:
    """(sub, code, d): the query's asymmetric distance table — exact
    BIGINT squared distance from the query's j-th subvector to every
    codebook centroid. m·k tiny rows (codebook ⨯ broadcast 1-row query);
    always broadcast at the probe join."""
    spark = emb.sparkSession
    sub = len(codebooks[0][0]["v"])
    cb = spark.createDataFrame(
        [
            (j, int(e["code"]), [int(x) for x in e["v"]])
            for j, book in enumerate(codebooks)
            for e in book
        ],
        "sub int, code int, cv array<bigint>",
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize(F.col("embedding"), scale).alias("qv")
    )
    return cb.crossJoin(F.broadcast(q)).select(
        "sub",
        "code",
        F.aggregate(
            F.zip_with(
                F.expr(f"slice(qv, sub * {sub} + 1, {sub})"),
                F.col("cv"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("d"),
    )


def _adc_scan(
    codes: DataFrame,
    dtable: DataFrame,
    m: int,
    query_vec_id: int,
    k_top: int,
) -> DataFrame:
    """Score a codes table against a broadcast distance table: posexplode
    to (vec_id, sub, code), broadcast-hash-join the m·k lookup rows, sum
    per vector (map-side combinable), TakeOrdered(k_top). Vectors with
    any NULL subspace code are excluded — a partial ADC sum would
    under-count distance and fake proximity."""
    probe = codes.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        probe.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("vec_id")
        .agg(
            F.sum("d").alias("adc_dist2"),
            F.count(F.lit(1)).alias("n_subs"),
        )
    )
    return (
        scored.filter(F.col("n_subs") == m)
        .select("vec_id", "adc_dist2")
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(k_top)
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: Codebooks,
    query_vec_id: int = 0,
    k_top: int = 10,
    scale: int = 1000,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k for one query: (vec_id, adc_dist2) — the k stored
    vectors whose PQ-approximated squared distance to the query is
    smallest (ascending, ties to lowest vec_id; the query row itself is
    excluded). Pass a persisted ``codes`` table (the pq_encode output —
    the thing a deployment stores INSTEAD of raw vectors) to skip
    re-encoding.

    Plan: distance table = codebook rows ⨯ broadcast 1-row query (m·k
    tiny rows, exact BIGINT); stored codes posexplode and probe it with
    a broadcast hash join; groupBy(vec_id) sums m lookups (map-side
    combinable); TakeOrdered(k) finishes. Rows with any NULL subspace
    code (ragged vectors) are excluded — a partial ADC sum would
    under-count distance and fake proximity."""
    if codes is None:
        codes = pq_encode(emb, codebooks, scale)
    dtable = _adc_dist_table(emb, codebooks, query_vec_id, scale)
    return _adc_scan(codes, dtable, len(codebooks), query_vec_id, k_top)


def ivfpq_index(
    emb: DataFrame,
    codebooks: Codebooks,
    n_cells: int = 4,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
) -> tuple[DataFrame, list[dict]]:
    """IVF-PQ BUILD: (index, coarse_centroids) where index is
    (vec_id, cell, codes) — the stored table of a billion-scale ANN
    deployment. Coarse cell (trained-centroid argmin) and PQ codes come
    from ONE Arrow-batch pass over the embedding scan (`_encode_kernel`):
    no build-time shuffle at all (the original plan equi-joined two
    projections of the same source on vec_id just to zip them). At deploy
    scale the index is then written ``partitionBy(cell)`` so probes
    prune to nprobe/n_cells of the files and never shuffle.

    This is the flat-quantizer IVFADC variant (codes encode the vector,
    not its residual against the coarse centroid): the probe/scan plan is
    identical for the residual variant — training ``pq_fit`` on
    ``v − centroid[cell]`` and building one distance table per probed
    cell slots into the same shapes — but flat coding keeps the oracle a
    single unrolled SQL twin."""
    _, cents = kmeans_fit(
        emb, k=n_cells, iters=iters, dims=dims, scale=scale
    )
    index = emb.select("vec_id", F.col("embedding").alias("e")).mapInPandas(
        _encode_kernel(codebooks, scale, coarse=cents),
        "vec_id bigint, codes array<int>, cell int",
    )
    return index, cents


def ivfpq_topk(
    emb: DataFrame,
    codebooks: Codebooks,
    query_vec_id: int = 0,
    k_top: int = 10,
    n_cells: int = 4,
    nprobe: int = 2,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
    index: DataFrame | None = None,
    coarse_cents: list[dict] | None = None,
) -> DataFrame:
    """IVF-PQ probe: ADC top-k scanned over ONLY the ``nprobe`` coarse
    cells nearest the query — (vec_id, adc_dist2) ascending, ties to
    lowest vec_id, query excluded. Pass a persisted (index, coarse_cents)
    pair from ``ivfpq_index`` to amortize the build across queries (the
    production shape; both MUST come from the same build).

    Probe plan: query→cell distances are n_cells tiny rows (centroid
    literals ⨯ broadcast 1-row query, exact BIGINT L2, ties to lowest
    cell); the nprobe winners broadcast-semi-join the index on ``cell``
    (partition pruning on a cell-partitioned table); the surviving codes
    run the same broadcast ADC scan as ``pq_adc_topk``. Nothing
    row-scaled reaches the driver and no exchange carries raw vectors."""
    spark = emb.sparkSession
    if (index is None) != (coarse_cents is None):
        raise ValueError(
            "pass index and coarse_cents together (same ivfpq_index build) "
            "or neither"
        )
    if index is None:
        index, coarse_cents = ivfpq_index(
            emb, codebooks, n_cells=n_cells, iters=iters, dims=dims, scale=scale
        )
    cent_df = spark.createDataFrame(
        [
            (int(c["vec_id"]), [int(x) for x in c["v"]])
            for c in coarse_cents
        ],
        "cell int, cv array<bigint>",
    )
    qrow = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize(F.col("embedding"), scale).alias("qv")
    )
    qdist = F.aggregate(
        F.zip_with(F.col("cv"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    probe_cells = (
        cent_df.crossJoin(F.broadcast(qrow))
        .select("cell", qdist.alias("d"))
        .orderBy(F.asc("d"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = index.join(F.broadcast(probe_cells), "cell", "left_semi")
    dtable = _adc_dist_table(emb, codebooks, query_vec_id, scale)
    return _adc_scan(
        cand.select("vec_id", "codes"), dtable, len(codebooks), query_vec_id, k_top
    )


def residualize(
    emb: DataFrame,
    assignment: DataFrame,
    coarse_cents: list[dict],
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, cell, embedding): each vector's integer residual against
    its assigned coarse centroid — the PQ training/encoding input of
    textbook IVFADC. The centroid table is bounded, so it is inlined as
    a map literal and the subtraction is a pure projection; the only
    exchange is the vec_id equi-join with the assignment (at deploy
    scale the assignment rides the same build that writes the index)."""
    cmap = F.create_map(
        *[
            x
            for c in coarse_cents
            for x in (
                F.lit(int(c["vec_id"])).cast("int"),
                F.array(*[F.lit(int(v)) for v in c["v"]]),
            )
        ]
    )
    base = emb.select("vec_id", quantize(F.col("embedding"), scale).alias("v"))
    a = assignment.select(
        "vec_id", F.col("cluster").cast("int").alias("cell")
    )
    res = F.zip_with(
        F.col("v"), F.element_at(cmap, F.col("cell")), lambda x, y: x - y
    )
    return base.join(a, "vec_id").select(
        "vec_id", "cell", res.alias("embedding")
    )


def ivfpq_residual_index(
    emb: DataFrame,
    n_cells: int = 4,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
) -> tuple[DataFrame, Codebooks, list[dict]]:
    """Residual-IVFPQ BUILD: (index, residual_codebooks, coarse_cents)
    where index is (vec_id, cell, codes) with codes over residuals —
    persist all three and pass them to ``ivfpq_residual_topk`` to
    amortize the build across queries (they MUST come from one build).

    Like ``ivfpq_index``, the build is shuffle-free: the residual table
    (one Arrow-batch pass — coarse argmin + centroid subtraction) exists
    only to train the residual codebooks, and the final index is a
    second single pass over the raw embeddings that assigns the cell,
    residualizes and encodes in one kernel (`_encode_kernel` with
    ``residual=True``). The original plan paid two vec_id equi-joins
    (assignment⋈vectors, then codes⋈cells) for identical rows."""
    _, cents = kmeans_fit(
        emb, k=n_cells, iters=iters, dims=dims, scale=scale
    )
    scents = sorted(
        (int(c["vec_id"]), [int(x) for x in c["v"]]) for c in cents
    )
    sc = int(scale)

    def resid(it):
        import numpy as np
        import pandas as pd

        from logzoom_spark.ops.similarity import _dots_exact

        cell_ids = np.array([c for c, _ in scents], dtype=np.int64)
        CC = np.array([cv for _, cv in scents], dtype=np.int64)
        d_full = CC.shape[1]
        for pdf in it:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lens = pdf["e"].map(lambda x: -1 if x is None else len(x)).to_numpy()
            cell_col = np.empty(n, dtype=object)
            cell_col[:] = None
            emb_col = np.empty(n, dtype=object)
            emb_col[:] = None
            idx = np.nonzero(lens == d_full)[0]
            if len(idx):
                E = np.stack(
                    [np.asarray(pdf["e"].iat[i], dtype=np.float64) for i in idx]
                )
                V = np.floor(E * sc).astype(np.int64)
                G = _dots_exact(V, CC)
                D2 = (V * V).sum(1)[:, None] - 2 * G + (CC * CC).sum(1)[None, :]
                a = np.argmin(D2, axis=1)
                R = V - CC[a]
                for t, i in enumerate(idx):
                    cell_col[i] = int(cell_ids[a[t]])
                    emb_col[i] = R[t]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cell_col, "embedding": emb_col}
            )

    res = emb.select("vec_id", F.col("embedding").alias("e")).mapInPandas(
        resid, "vec_id bigint, cell int, embedding array<bigint>"
    )
    # residual-fit seeds computed driver-side from the k pushdown-fetched
    # raw rows (a vec_id filter cannot push below the residual kernel, so
    # letting pq_fit collect its own init would full-scan the corpus)
    import numpy as np

    cell_ids = np.array([c for c, _ in scents], dtype=np.int64)
    CC = np.array([cv for _, cv in scents], dtype=np.int64)
    qrows = sorted(
        (int(r["vec_id"]), [int(x) for x in r["v"]])
        for r in emb.filter(F.col("vec_id") < k)
        .select("vec_id", quantize(F.col("embedding"), scale).alias("v"))
        .collect()
        if len(r["v"]) == CC.shape[1]
    )
    init = []
    for vid, v in qrows:
        V = np.array(v, dtype=np.int64)
        D2 = ((V[None, :] - CC) ** 2).sum(1)
        init.append((vid, [int(x) for x in V - CC[int(np.argmin(D2))]]))
    books = pq_fit(res, m=m, k=k, iters=iters, dims=dims, scale=1, init=init)
    index = emb.select("vec_id", F.col("embedding").alias("e")).mapInPandas(
        _encode_kernel(books, scale, coarse=cents, residual=True),
        "vec_id bigint, codes array<int>, cell int",
    )
    return index, books, cents


def ivfpq_residual_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k_top: int = 10,
    n_cells: int = 4,
    nprobe: int = 2,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
    index: DataFrame | None = None,
    books: Codebooks | None = None,
    coarse_cents: list[dict] | None = None,
) -> DataFrame:
    """Textbook IVFADC (residual coding): PQ codebooks are trained on
    v − coarse_centroid[cell], so each cell's codes describe its LOCAL
    geometry — the accuracy upgrade over ``ivfpq_topk``'s flat coding.
    Output contract matches it: (vec_id, adc_dist2) ascending, ties to
    lowest vec_id, query excluded, partial-code rows dropped.

    Plan deltas vs the flat variant: residuals are a map-literal
    subtraction (pure projection; residuals pass through the same
    fit/encode at scale=1, integer-exact); the distance table is built
    PER PROBED CELL from the query's per-cell residual (nprobe·m·k tiny
    rows, still broadcast); candidates join it on (their own cell, sub,
    code). Pass a persisted (index, books, coarse_cents) triple from
    ``ivfpq_residual_index`` to amortize the build across queries (the
    production shape); without it the index is built inline."""
    spark = emb.sparkSession
    given = (index is not None, books is not None, coarse_cents is not None)
    if any(given) and not all(given):
        raise ValueError(
            "pass index, books and coarse_cents together (one "
            "ivfpq_residual_index build) or none of them"
        )
    if index is None:
        index, books, coarse_cents = ivfpq_residual_index(
            emb, n_cells=n_cells, m=m, k=k, iters=iters, dims=dims, scale=scale
        )
    codes, cents = index, coarse_cents
    sub = dims // m
    cent_df = spark.createDataFrame(
        [(int(c["vec_id"]), [int(x) for x in c["v"]]) for c in cents],
        "cell int, cv array<bigint>",
    )
    qrow = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize(F.col("embedding"), scale).alias("qv")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("cv"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    probe = (
        cent_df.crossJoin(F.broadcast(qrow))
        .select("cell", "cv", l2.alias("d"))
        .orderBy(F.asc("d"), F.asc("cell"))
        .limit(nprobe)
    )
    cb = spark.createDataFrame(
        [
            (j, int(e["code"]), [int(x) for x in e["v"]])
            for j, book in enumerate(books)
            for e in book
        ],
        "sub int, code int, bcv array<bigint>",
    )
    qres = probe.crossJoin(F.broadcast(qrow)).select(
        "cell",
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a - b).alias("qr"),
    )
    dt = qres.crossJoin(F.broadcast(cb)).select(
        "cell",
        "sub",
        "code",
        F.aggregate(
            F.zip_with(
                F.expr(f"slice(qr, sub * {sub} + 1, {sub})"),
                F.col("bcv"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    cand = codes.join(
        F.broadcast(probe.select("cell")), "cell", "left_semi"
    ).filter(F.col("vec_id") != query_vec_id)
    probe_rows = cand.select(
        "vec_id", "cell", F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        probe_rows.join(F.broadcast(dt), ["cell", "sub", "code"])
        .groupBy("vec_id")
        .agg(
            F.sum("d").alias("adc_dist2"),
            F.count(F.lit(1)).alias("n_subs"),
        )
    )
    return (
        scored.filter(F.col("n_subs") == m)
        .select("vec_id", "adc_dist2")
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(k_top)
    )
