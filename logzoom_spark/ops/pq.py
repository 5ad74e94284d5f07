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
- **fit**: ``kmeans.kmeans_fit`` per subspace on the SLICED embedding —
  the same bounded-driver-state Lloyd loop (k×subdims ints per round);
  m independent codebooks. At 100 TB codebooks are trained on a sample
  (this module is agnostic: pass any `emb` you like), then the full
  corpus is encoded in one pass.
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

from .kmeans import kmeans_fit
from .similarity import quantize

Codebooks = list[list[dict]]


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    scale: int = 1000,
) -> Codebooks:
    """Train m per-subspace codebooks; returns
    ``codebooks[j] = [{"code": id, "v": [subdims ints]}, ...]``.
    Subspace j covers embedding dims [j·dims/m, (j+1)·dims/m). Init
    centroids per subspace are the vec_id < k rows' subvectors (the
    deterministic seeding documented in ops/kmeans.py)."""
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    sub = dims // m
    books: Codebooks = []
    for j in range(m):
        emb_j = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), j * sub + 1, sub).alias("embedding"),
        )
        _, cents = kmeans_fit(emb_j, k=k, iters=iters, dims=sub, scale=scale)
        books.append([{"code": c["vec_id"], "v": c["v"]} for c in cents])
    return books


def pq_encode(
    emb: DataFrame, codebooks: Codebooks, scale: int = 1000
) -> DataFrame:
    """(vec_id, codes array<int>): per subspace, the id of the nearest
    codebook centroid — ties to the lowest code id, ragged/short rows get
    NULL code for the affected subspace (the kmeans NULL-guard). Pure
    codegen projection over inlined codebook literals: zero shuffle, one
    pass, m·k exact BIGINT sub-distances per row."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("codebooks must be non-empty")
    sub = len(codebooks[0][0]["v"])
    base = emb.select("vec_id", quantize(F.col("embedding"), scale).alias("v"))
    code_cols = []
    for j, book in enumerate(codebooks):
        sv = F.slice(F.col("v"), j * sub + 1, sub)
        pairs = []
        for ent in book:
            diff2 = F.aggregate(
                F.zip_with(
                    sv,
                    F.array(*[F.lit(int(x)) for x in ent["v"]]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
            pairs.append(
                F.struct(diff2.alias("d"), F.lit(int(ent["code"])).alias("c"))
            )
        best = F.array_min(F.array(*pairs))
        # NULL-padded zip_with (short row) sorts NULL d first — null the
        # code out rather than silently assigning the lowest id
        code_cols.append(F.when(best["d"].isNotNull(), best["c"]).cast("int"))
    return base.select("vec_id", F.array(*code_cols).alias("codes"))


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
    spark = emb.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0]["v"])
    if codes is None:
        codes = pq_encode(emb, codebooks, scale)
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
    dtable = cb.crossJoin(F.broadcast(q)).select(
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
