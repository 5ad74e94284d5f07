"""Sparse text retrieval over the `documents` table: inverted-index build
and BM25 top-k — the lexical-retrieval half of a training-data pipeline
(quality filtering by query, contamination triage, dedup assist; the
sparse complement of ops/similarity's dense ANN).

No reference analog (logzoom is a log router); part of the training-data
operator surface mandated by the build brief.

Spark-first shape: the "index" is RELATIONAL postings — (token, doc_id,
tf) rows — not serialized posting-list blobs. Equi-joins, groupBys and
Parquet bucketing by `token` then give co-located probes, predicate
pushdown, and AQE skew handling for free; a blob index would forfeit all
three and need custom readers.

Determinism (oracle-hashable): BM25 is computed in BIGINT fixed-point.
With k1 = 1.2 and b = 0.75,

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dlen/avg))

becomes, after quantizing idf to 1e-4 (idf10k = floor(1e4·ln((2N+2)/(2df+1)),
the BM25+ style idf ln((N+1)/(df+0.5)) over integer inputs) and avg doc
length to 0.1 tokens (A = (10·T) div N), the pure-integer per-term term

    contrib = (idf10k · tf · 22 · A) div (10·tf·A + 3·A + 90·dlen)

— every operand bounded by per-document magnitudes (A ≤ 10·max dlen), so
no corpus-size overflow; `div` is floor division on positives in both
engines. The one float op is ln() over small rationals, floor-quantized
at 1e-4 where a cross-engine ulp flip is ~1e-11 likely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col: str = "text"):
    return F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")


def build_postings(docs: DataFrame, col: str = "text") -> DataFrame:
    """Inverted index build: (token, doc_id, tf) — one explode + one
    groupBy on (token, doc_id) with map-side partial counts. Persist
    partitioned/bucketed by `token`: query probes then prune to the query
    terms' buckets and BM25's join is co-located."""
    return (
        docs.select("doc_id", F.explode(_tokens(col)).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, dlen) — zero-shuffle projection; at scale a column of the
    corpus stats table maintained alongside the postings."""
    return docs.select("doc_id", F.size(_tokens(col)).cast("bigint").alias("dlen"))


def unigram_surprisal(
    docs: DataFrame,
    col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Perplexity-style quality score from a unigram language model fit on
    the corpus itself: per doc, the mean token surprisal
    −log p(token) with add-one smoothing, p(t) = (ct+1)/(T+V). High mean
    surprisal = text unlike the corpus (gibberish, wrong language,
    boilerplate-free noise); low = template/repetitive text. The standard
    cheap LM filter of training-data pipelines, here from the corpus's own
    statistics — no external model.

    Returns (doc_id, n_tokens, surprisal_milli_sum, mean_surprisal_milli)
    — total and mean per-token surprisal in millinats, BIGINT. Each
    token's surprisal is floor-quantized at 1e-3 BEFORE the per-doc sum
    (one ln per DISTINCT corpus token, not per occurrence), so results
    are order-independent and engine-exact like the BM25 idf.

    Plan: corpus token counts (the ``build_postings`` aggregate re-keyed
    to token totals) join the per-doc token multiset on token — the join
    carries (token, count) ints; per-doc sums are map-side combinable.
    Empty docs surface with 0 tokens and NULL mean (counted, not
    dropped)."""
    if postings is None:
        postings = build_postings(docs, col)
    totals = postings.groupBy("token").agg(F.sum("tf").alias("ct"))
    corpus = totals.agg(
        F.sum("ct").alias("t_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    per_token = totals.crossJoin(F.broadcast(corpus)).select(
        "token",
        "ct",
        F.floor(
            -F.log((F.col("ct") + 1) / (F.col("t_tokens") + F.col("vocab"))) * 1000
        ).cast("bigint").alias("surprisal_milli"),
    )
    doc_tokens = postings.join(per_token.select("token", "surprisal_milli"), "token")
    sums = doc_tokens.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("surprisal_milli")).alias("surprisal_milli_sum"),
    )
    # left join back so zero-token docs appear (split('') yields [''] — a
    # real token — so "empty" here means docs the tokenizer yields none
    # for; keep the join anyway as the counted-not-dropped guard)
    base = docs.select("doc_id")
    return base.join(sums, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("surprisal_milli_sum", F.lit(0)).alias("surprisal_milli_sum"),
        F.expr(
            "CASE WHEN n_tokens > 0 THEN surprisal_milli_sum div n_tokens END"
        ).alias("mean_surprisal_milli"),
    )


def _bm25_contribs(hits: DataFrame, lens: DataFrame) -> DataFrame:
    """The ONE fixed-point BM25 scoring core (derivation in the module
    docstring), shared by the single-query and batched paths so the two
    can never drift: (token, doc_id, tf) hits already pruned to the probed
    terms → (token, doc_id, contrib). df aggregates over the pruned slice;
    doc lengths join one integer per doc; corpus totals broadcast."""
    totals = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dlen").alias("total_tokens")
    ).select(
        "n_docs",
        F.expr("(10 * total_tokens) div n_docs").alias("avg10"),
    )
    stats = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf10k = F.floor(
        F.log((2 * F.col("n_docs") + 2) / (2 * F.col("df") + 1)) * 10000
    ).cast("bigint")
    return (
        hits.join(F.broadcast(stats), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn("idf10k", idf10k)
        .select(
            "token",
            "doc_id",
            F.expr(
                "(idf10k * tf * 22 * avg10) div (10 * tf * avg10 + 3 * avg10 + 90 * dlen)"
            ).alias("contrib"),
        )
    )


def bigram_surprisal(docs: DataFrame, col: str = "text") -> DataFrame:
    """Conditional (bigram) LM quality score — the KenLM-style perplexity
    filter one rung above ``unigram_surprisal``: per doc, the mean
    surprisal −ln p(v|u) over adjacent token pairs, with add-one
    smoothing p(v|u) = (c(uv)+1)/(c(u)+V) fit on the corpus itself
    (c(u) = plain unigram count — the standard context approximation —
    V = unigram vocabulary). High mean = token order unlike the corpus
    (shuffled/gibberish text a unigram model cannot flag); low =
    boilerplate n-gram loops.

    Returns (doc_id, n_bigrams, surprisal_milli_sum,
    mean_surprisal_milli), BIGINT millinats, floor-quantized per DISTINCT
    corpus bigram before the per-doc sum (order-independent,
    engine-exact — the unigram_surprisal discipline). Docs with < 2
    tokens surface with 0 bigrams and NULL mean (counted, not dropped).

    Plan: bigram extraction is row-local (transform over an index
    sequence — zero shuffle); corpus bigram/unigram totals are map-side
    combined groupBys bounded by the n-gram vocabulary, never the
    corpus; the scoring join carries (u, v, tf) ints and the per-doc sum
    is map-side combinable.

    The token array is MATERIALIZED as a column before the transform:
    element_at over a non-attribute expression inside a lambda
    re-evaluates the whole split per element (O(n²·len) per doc —
    measured 16 s vs 0.4 s on 500 docs); over a bound column it is an
    O(1) array read."""
    base = docs.select("doc_id", _tokens(col).alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.struct(
                F.element_at(toks, i).alias("u"),
                F.element_at(toks, i + F.lit(1)).alias("v"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
    pbt = (
        base.select("doc_id", F.explode(bi).alias("p"))
        .select("doc_id", F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .groupBy("doc_id", "u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    btot = pbt.groupBy("u", "v").agg(F.sum("tf").alias("cuv"))
    utot = (
        base.select(F.explode(toks).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    corpus = utot.agg(F.count(F.lit(1)).alias("vocab"))
    per_bg = (
        btot.join(utot, "u")
        .crossJoin(F.broadcast(corpus))
        .select(
            "u",
            "v",
            F.floor(
                -F.log((F.col("cuv") + 1) / (F.col("cu") + F.col("vocab")))
                * 1000
            ).cast("bigint").alias("sm"),
        )
    )
    sums = (
        pbt.join(per_bg, ["u", "v"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("sm")).alias("surprisal_milli_sum"),
        )
    )
    return docs.select("doc_id").join(sums, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("surprisal_milli_sum", F.lit(0)).alias("surprisal_milli_sum"),
        F.expr(
            "CASE WHEN n_bigrams > 0 THEN surprisal_milli_sum div n_bigrams END"
        ).alias("mean_surprisal_milli"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k docs for one bag-of-terms query. Returns
    (doc_id, bm25_scaled, n_terms_hit), ordered by score desc, doc_id asc.

    Plan: the tiny query-term table broadcasts against the postings (the
    FIRST join — everything downstream sees only matching docs' rows);
    the shared ``_bm25_contribs`` core scores the pruned slice; the
    integer contributions sum in a map-side-combinable groupBy;
    TakeOrdered(k) finishes — no global sort (the single-query case keeps
    TakeOrdered rather than delegating to ``bm25_query_join``, whose
    constant-key window would drag every candidate into one partition).
    Pass a persisted ``postings`` (bucketed by token) to skip the index
    build and prune the scan to the query terms' buckets."""
    spark = docs.sparkSession
    # normalize through the same fold the index applies (_tokens lowercases)
    # and DEDUPE: a duplicate query term would double its cand rows, so df
    # would count 2× the true document frequency — deflating (even negating)
    # the idf and double-counting n_terms_hit
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one non-empty term")
    if postings is None:
        postings = build_postings(docs)
    qdf = spark.createDataFrame([(t,) for t in terms], "token string")
    hits = postings.join(F.broadcast(qdf), "token")
    scored = _bm25_contribs(hits, doc_lengths(docs))
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("bm25_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
    )
    return agg.orderBy(F.desc("bm25_scaled"), F.asc("doc_id")).limit(k)


def bm25_query_join(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Batched BM25: top-k docs for EVERY query in one plan — the lexical
    twin of ``ops.similarity.knn_join`` (single-probe ``bm25_topk`` is the
    interactive shape; a curation pipeline scores thousands of benchmark /
    filter queries against the corpus at once, and running them one
    Spark job each would pay the scan per query).

    ``queries``: (query_id BIGINT, token STRING) rows — a bag of terms per
    query (tokens are folded through the same lower() as the index and
    deduped per query; a duplicate term would double-count df and
    n_terms_hit exactly as documented on ``bm25_topk``).

    Returns (query_id, doc_id, bm25_scaled, n_terms_hit, rank) with
    rank = row_number per query by (score desc, doc_id asc), rank ≤ k.

    Plan shape, in corpus-scan counts: ONE postings⋈terms equi-join on
    `token` prunes to the union of all queries' terms (distinct-token df
    stats are computed once on that slice, NOT per query — a term shared
    by 500 queries aggregates its df a single time); the per-(query, doc)
    sum is map-side combinable; the final top-k is a window row_number
    per query_id that Spark pushes below the exchange as WindowGroupLimit,
    so at most k rows per (query, input-partition) shuffle. Token-key skew
    (a stopword in many queries) is AQE's skew-join case; the postings
    build itself is the place to drop df-dominant terms if needed."""
    from pyspark.sql import Window

    qdf = (
        queries.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.lower(F.trim(F.col("token"))).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    if postings is None:
        postings = build_postings(docs)
    # corpus df + contrib per DISTINCT probed (token, doc) — scored ONCE
    # via the shared _bm25_contribs core, then fanned out to queries (a
    # term shared by 500 queries is scored a single time)
    tokens = qdf.select("token").distinct()
    hits = postings.join(F.broadcast(tokens), "token")
    scored = _bm25_contribs(hits, doc_lengths(docs)).join(
        F.broadcast(qdf), "token"
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("bm25_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_scaled"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "bm25_scaled",
            "n_terms_hit",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def tfidf_topk_terms(docs: DataFrame, k: int = 3, scale: int = 1000) -> DataFrame:
    """Per-document top-k characteristic terms by integer TF-IDF: score =
    tf * ((N * scale) div df) — fixed-point IDF instead of float log, so
    every engine ranks identically (log is monotone in N/df, so the top-k
    SET matches the float formulation whenever no two terms tie across
    the scale quantum; rank ties break on term asc, deterministic).

    Returns (doc_id, term, tf, df, tfidf, term_rank), term_rank 1..k.

    Scale shape: postings build is the inverted-index exchange
    (`build_postings`); df is a second vocab-sized aggregate joined back
    BROADCAST; N inlines as a 1-row broadcast cross join (no driver
    action). Top-k per doc is row_number ≤ k over (doc_id) — Spark's
    WindowGroupLimit keeps at most k rows per doc per input partition
    below the exchange; no global sort."""
    from pyspark.sql import Window

    postings = build_postings(docs).filter(F.col("token") != "")
    df_tbl = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        postings.join(F.broadcast(df_tbl), "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "tf",
            "df",
            F.expr(f"tf * ((_n * {scale}L) div df)").cast("bigint").alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "bm25_scaled",
    k: int = 10,
    rrf_c: int = 60,
    scale: int = 10**6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N candidate
    rankings — the hybrid-retrieval combiner (lexical BM25 + semantic
    ANN, or multi-query expansion fan-out) and the standard way a
    curation pipeline merges evidence from heterogeneous scorers
    without calibrating their score scales.

    Each input ranking contributes ``scale // (rrf_c + rank)`` per
    item (rank = 1-based position by score desc, id asc); fused score
    = integer sum — scale-free, exact, bit-identical across engines.

    Returns top-k (``id_col``, rrf_score, n_lists) by (score desc, id
    asc); n_lists = how many input rankings contained the item.

    Scale shape: every input ranking is already a bounded top-k' list
    (the expensive corpus work happened inside the upstream retriever),
    so the no-partition rank window runs over <= k' rows per list —
    the same bounded-aggregate exemption as ops/corpus.pack_sequences'
    64-row bucket window; the union + groupBy touch N*k' rows total,
    corpus-independent."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    parts = [
        r.select(
            F.col(id_col),
            F.row_number().over(w).alias("_rk"),
        )
        .select(
            F.col(id_col),
            F.expr(f"{scale}L div ({rrf_c} + _rk)").alias("_contrib"),
        )
        for r in rankings
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return (
        allc.groupBy(id_col)
        .agg(
            F.sum("_contrib").cast("bigint").alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
