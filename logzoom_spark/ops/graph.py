"""Graph analytics over corpus-derived graphs: integer-exact PageRank.

The reference has no graph operators; this extends the engine with the
iterative-graph class a training-data pipeline needs (domain/link
authority weighting a la Common Crawl curation, token-graph centrality
for keyword extraction). Public algorithm: Page et al. 1999; the
power-iteration-as-repeated-join formulation is the standard
Spark/Pregel mapping.

House rules applied:

- **Integer fixed-point arithmetic.** Ranks are BIGINTs at ``scale``
  (default 1e12); the damping update is ``base + (d_pct * s) // 100``
  with per-edge integer contributions ``(r * w) // W_out``. Every
  operation is order-independent (integer sums), so the result is
  bit-identical across engines and across partitionings — float
  PageRank cannot make that guarantee under distributed summation.
- **Bounded driver state.** The node set is the top-N tokens by
  frequency (vocabulary-bounded, corpus-independent), so ranks live as
  an N-row literal frame that broadcast-joins the edge table each
  iteration — the same literal-centroid pattern as ops/kmeans.py. For
  web-scale graphs (nodes >> driver memory) the co-partitioned variant
  applies: partition edges by src once, keep ranks partitioned on node
  id, and checkpoint every few iterations; the update formula is
  unchanged.

Overflow bound: ``r * w`` must stay < 2^63. With scale=1e12 that allows
per-edge weights up to ~9e6; for corpora beyond that, lower ``scale``
or move the contribution expression to DECIMAL(38,0) (exactness is
preserved either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12


def _token_pairs(docs: DataFrame, col: str) -> DataFrame:
    """Directed adjacent-token pairs (a -> b), PMI tokenization
    (lower, whitespace split, empties removed) — identical to
    ops/text.pmi_collocations so the two share oracle tokenization."""
    toks_expr = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    base = docs.select(F.array_remove(toks_expr, "").alias("_toks"))
    toks = F.col("_toks")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return base.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("a"),
                    F.element_at(toks, i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")


def token_graph(docs: DataFrame, col: str = "text", top_n: int = 200) -> DataFrame:
    """Weighted directed token-adjacency graph restricted to the top_n
    tokens by unigram frequency (count desc, token asc — deterministic
    boundary). Returns (a, b, w).

    Scale shape: pair extraction is row-local; the pair aggregate is
    map-side combined on a vocabulary²-bounded key; the node cut is a
    TakeOrdered over the vocabulary, never the corpus."""
    pairs = _token_pairs(docs, col)
    uni = (
        pairs.select(F.col("a").alias("w"))
        .unionAll(pairs.select(F.col("b").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nodes = (
        uni.orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_n)
        .select("w")
    )
    return (
        pairs.join(F.broadcast(nodes.withColumnRenamed("w", "a")), "a")
        .join(F.broadcast(nodes.withColumnRenamed("w", "b")), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def token_pagerank(
    docs: DataFrame,
    col: str = "text",
    top_n: int = 200,
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over the token-adjacency graph.

    r_0(v) = scale // n;  each round:
        s(v)   = sum over in-edges (u,v):  (r(u) * w_uv) // W_out(u)
        r'(v)  = ((100 - damping_pct) * (scale // n)) // 100
                 + (damping_pct * s(v)) // 100
    Dangling-node mass is dropped (the standard simplification); with a
    fixed iteration count the result is fully deterministic, so the
    DuckDB oracle unrolls the same rounds as chained CTEs (the
    ops/bpe.py precedent for iterative algorithms).

    Returns (token, rank_fp) for all n nodes.

    Scale shape: the edge table is built once and persisted (one
    vocabulary-bounded shuffle); each iteration is a broadcast join of
    the N-row literal rank frame against it plus a map-side-combined
    groupBy on dst — the corpus is never rescanned and lineage stays
    flat because ranks re-enter as literals (bounded driver state,
    <= top_n rows per collect)."""
    spark = docs.sparkSession
    graph = token_graph(docs, col=col, top_n=top_n)
    ow = graph.groupBy("a").agg(F.sum("w").alias("outw"))
    edges = graph.join(ow, "a").persist()
    try:
        node_rows = sorted(
            {r["a"] for r in edges.select("a").distinct().collect()}
            | {r["b"] for r in edges.select("b").distinct().collect()}
        )
        n = len(node_rows)
        if n == 0:
            return spark.createDataFrame([], "token string, rank_fp long")
        r0 = scale // n
        base = ((100 - damping_pct) * r0) // 100
        ranks = {t: r0 for t in node_rows}
        for _ in range(iters):
            rdf = spark.createDataFrame(
                sorted(ranks.items()), "token string, r long"
            )
            s_rows = (
                edges.join(F.broadcast(rdf), edges["a"] == rdf["token"])
                .select(
                    F.col("b"),
                    F.expr("(r * w) div outw").alias("c"),
                )
                .groupBy("b")
                .agg(F.sum("c").alias("s"))
                .collect()
            )
            smap = {row["b"]: row["s"] for row in s_rows}
            ranks = {
                t: base + (damping_pct * smap.get(t, 0)) // 100
                for t in node_rows
            }
        return spark.createDataFrame(
            sorted(ranks.items()), "token string, rank_fp long"
        )
    finally:
        edges.unpersist()


def undirected_token_graph(
    docs: DataFrame, col: str = "text", top_n: int = 200
) -> DataFrame:
    """Symmetrized token graph: directed adjacency weights folded into
    undirected (a, b, w) with both orientations present (w(a,b) ==
    w(b,a)) — the neighbor view label propagation and degree analytics
    consume. Same vocabulary-bounded scale shape as token_graph."""
    g = token_graph(docs, col=col, top_n=top_n)
    return (
        g.unionAll(
            g.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def label_propagation(
    docs: DataFrame,
    col: str = "text",
    top_n: int = 200,
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected token graph, made fully deterministic: every node starts
    as its own community; each round every node adopts the label with
    the greatest incident edge weight among its neighbors, ties broken
    (weight desc, label asc); a fixed ``iters`` rounds replace the
    usual convergence test so the oracle can unroll the rounds as
    chained CTEs (the ops/bpe.py precedent).

    Returns (token, community) for every node.

    Scale shape: identical to token_pagerank — per round one broadcast
    join of the node-bounded literal label frame against the persisted
    edge table, a map-side-combined (dst, label) weight aggregate, and
    an argmax via a single struct-min aggregate (no window over
    unbounded data); lineage stays flat via bounded (<= top_n rows)
    driver collects."""
    spark = docs.sparkSession
    edges = undirected_token_graph(docs, col=col, top_n=top_n).persist()
    try:
        nodes = sorted(r["a"] for r in edges.select("a").distinct().collect())
        if not nodes:
            return spark.createDataFrame([], "token string, community string")
        labels = {t: t for t in nodes}
        for _ in range(iters):
            ldf = spark.createDataFrame(
                sorted(labels.items()), "token string, label string"
            )
            rows = (
                edges.join(F.broadcast(ldf), edges["a"] == ldf["token"])
                .groupBy(F.col("b"), F.col("label"))
                .agg(F.sum("w").alias("ws"))
                .groupBy("b")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("ws")).alias("nw"),
                            F.col("label").alias("label"),
                        )
                    ).alias("s")
                )
                .select("b", "s.label")
                .collect()
            )
            labels = {row["b"]: row["label"] for row in rows}
        return spark.createDataFrame(
            sorted(labels.items()), "token string, community string"
        )
    finally:
        edges.unpersist()


def khop_reach(
    docs: DataFrame,
    col: str = "text",
    seed: str | None = None,
    k: int = 3,
    top_n: int = 200,
) -> DataFrame:
    """Minimum-hop BFS reachability from a seed node over the directed
    token graph, k relaxation rounds (paths of length <= k) — the
    bounded graph-traversal primitive (lineage walk, expansion set for
    contamination / link spam). ``seed`` defaults to the most frequent
    token (count desc, token asc — deterministic).

    Returns (token, hops) for every node reached within k hops.

    Scale shape: per round one broadcast join of the reached-set
    literal (bounded by the node set) against the persisted edge table
    and a min-hop aggregate; k is fixed, so the oracle unrolls the
    rounds as chained CTEs."""
    spark = docs.sparkSession
    edges = token_graph(docs, col=col, top_n=top_n).persist()
    try:
        if seed is None:
            pairs = _token_pairs(docs, col)
            uni = (
                pairs.select(F.col("a").alias("w"))
                .unionAll(pairs.select(F.col("b").alias("w")))
                .groupBy("w")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            top = uni.orderBy(F.col("cnt").desc(), F.col("w").asc()).limit(1).collect()
            if not top:
                return spark.createDataFrame([], "token string, hops int")
            seed = top[0]["w"]
        reach = {seed: 0}
        for i in range(1, k + 1):
            rdf = spark.createDataFrame(
                sorted(reach.items()), "token string, hops int"
            )
            rows = (
                edges.join(F.broadcast(rdf), edges["a"] == rdf["token"])
                .select("b")
                .distinct()
                .collect()
            )
            for row in rows:
                reach.setdefault(row["b"], i)
        return spark.createDataFrame(
            sorted(reach.items()), "token string, hops int"
        )
    finally:
        edges.unpersist()
