"""Corpus-preparation operators for LLM training-data pipelines: document
chunking, stratified (per-language) sampling, and benchmark-contamination
detection. All built-in `pyspark.sql.functions` — JVM-side array/hash ops,
no Python in any hot path.

No reference analog (logzoom is a log router); these extend the
training-data operator surface mandated by the build brief, alongside
ops/dedup.py and ops/text.py.

Scale notes:
- ``chunk_documents`` is a per-row explode — embarrassingly parallel, zero
  shuffles; output rows = ceil(tokens/stride) per doc.
- ``stratified_sample`` is a pure filter on a deterministic hash gate —
  sample membership is stable under any partitioning or cluster size
  (contrast reference server/rand.go wall-clock rand).
- ``contamination_pairs`` shuffles only (fixed-width hash, id) pairs,
  never text; a document-frequency cap drops n-grams shared by too many
  benchmark docs (boilerplate) before the join, the same hot-key guard as
  the LSH bucket cap in ops/dedup.py. Hashers follow the ops/dedup.py
  convention: xxhash64 production path, portable-md5 oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import portable_hash
from .dedup import _hash_fn

#: n-grams appearing in more than this many benchmark docs are boilerplate,
#: not contamination signal — dropped before the join (hot-key guard)
DEFAULT_MAX_GRAM_DF = 100


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    col: str = "text",
) -> DataFrame:
    """Split each document into fixed-token-count chunks with overlap — the
    unit of work for embedding/pre-training pipelines. Chunk k starts at
    token k·stride (stride = chunk_tokens − overlap); the last chunk may be
    short; a doc shorter than one chunk yields exactly one chunk.

    Pure per-row array ops (split → sequence → slice under posexplode-style
    inline): no shuffle, no Python; output is (doc_id, chunk_idx,
    chunk_text, n_chunk_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # coalesce: split(trim(NULL)) is NULL, and sequence/explode over NULL
    # would silently DROP the row — every input doc must appear in the
    # output (counted-not-dropped policy; a NULL-text doc yields one
    # empty chunk, same as an empty-string doc)
    toks = F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(stride)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    out = docs.select("doc_id", toks.alias("_toks"), idx)
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 4,
    mean_tokens: int = 32,
    col: str = "text",
) -> DataFrame:
    """Content-defined chunking (gear/Rabin-style CDC, public algorithm):
    a chunk boundary falls AFTER token i whenever the hash of the
    ``window``-token gram ending at i is ≡ 0 mod ``mean_tokens`` —
    boundaries are a function of local CONTENT, not position, so an
    insertion near the head of a document shifts only the chunk it lands
    in: every later chunk re-aligns byte-identically (the property that
    makes CDC chunks dedup-able across edited near-copies, where
    fixed-stride `chunk_documents` re-frames the whole tail). Expected
    chunk length ≈ ``mean_tokens`` tokens.

    Entirely row-local array HOFs — zero shuffle, like
    `chunk_documents`: tokens → boundary-position array (filter over
    sequence) → slice per consecutive-bound pair under posexplode.
    The token array is materialized ONCE as a bound column (the O(n²)
    HOF re-evaluation trap: slicing the raw split() inside a lambda
    re-splits per chunk). Output (doc_id, chunk_idx, chunk_md5,
    n_chunk_tokens); NULL/empty text yields one empty chunk (counted,
    not dropped). Deterministic via the portable hash, so the boundary
    set is bit-identical in DuckDB."""
    if window < 1 or mean_tokens < 1:
        raise ValueError(f"need window >= 1 and mean_tokens >= 1, got {window}/{mean_tokens}")
    toks = F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")
    base = docs.select("doc_id", toks.alias("_toks"))
    tcol = F.col("_toks")
    n = F.size(tcol)
    gram = lambda i: F.concat_ws(" ", F.slice(tcol, i - window + 1, window))  # noqa: E731
    # boundary after position i for i in [window, n-1]: the last position
    # is excluded so the final chunk is never empty. The candidate range
    # is sequence(1, n) with the window/last bounds in the predicate —
    # sequence(lo, hi) with hi < lo silently generates DESCENDING values,
    # so sequence(window, n-1) on a short doc would emit out-of-order
    # phantom edges
    bounds = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i >= window)
        & (i < n)
        & (F.pmod(portable_hash(gram(i)), F.lit(mean_tokens)) == 0),
    )
    edges = F.concat(F.array(F.lit(0)), bounds, F.array(n))
    with_edges = base.select("doc_id", "_toks", edges.alias("_edges"))
    ecol = F.col("_edges")
    pieces = F.transform(
        F.sequence(F.lit(0), F.size(ecol) - 2),
        lambda k: F.slice(
            F.col("_toks"),
            F.element_at(ecol, k + 1) + 1,
            F.element_at(ecol, k + 2) - F.element_at(ecol, k + 1),
        ),
    )
    out = with_edges.select("doc_id", F.posexplode(pieces).alias("chunk_idx", "_piece"))
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.md5(F.concat_ws(" ", F.col("_piece"))).alias("chunk_md5"),
        F.size("_piece").cast("bigint").alias("n_chunk_tokens"),
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates10k: dict[str, int],
    default10k: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing primitive (keep
    50% of English, 20% of code, ... when composing a training corpus).
    A row survives iff hash(doc_id) mod 10000 < its stratum's rate (×10k).

    Hash-gated, so membership is reproducible across runs, partitionings
    and cluster sizes, and downstream epochs can re-derive exactly which
    rows were in the mix."""
    rate = None
    for value, r10k in rates10k.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, r10k) if rate is None else rate.when(cond, r10k)
    rate = F.lit(default10k) if rate is None else rate.otherwise(F.lit(default10k))
    bucket = F.pmod(portable_hash(F.col("doc_id").cast("string"), seed), F.lit(10000))
    return docs.filter(bucket < rate)


def reservoir_sample(
    docs: DataFrame,
    group_col: str,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-group uniform sample without replacement: rank
    rows inside each group by portable_hash(id, seed) and keep the k
    smallest — the distributed, re-runnable equivalent of per-group
    reservoir sampling (hash order IS a uniform random order, but stable
    across runs, partitionings and cluster sizes, unlike an actual
    reservoir's arrival-order state). Spark's WindowGroupLimit pushes the
    rank<=k below the exchange, so at most k rows per group per input
    partition shuffle."""
    from pyspark.sql import Window

    h = portable_hash(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement, k per group
    (Efraimidis–Spirakis A-ES): each row draws u ∈ (0,1) from the portable
    hash of its id and ranks by key = ln(u)/w — the top-k keys are exactly
    a weight-proportional without-replacement draw (maximising u^(1/w) ⇔
    maximising ln(u)/w since ln is monotone and w > 0). The weighted
    complement of ``reservoir_sample``: "sample documents proportional to
    length/quality score" is the standard corpus-mixing step that uniform
    hash-rank sampling can't express.

    Rows with NULL or non-positive weight are excluded from the draw (a
    zero-weight row must never be selected; A-ES is undefined there).

    Determinism note: u is an exact dyadic rational ((h mod 2^52)+1)/(2^52+1)
    and division is IEEE-exact, so the one cross-engine wobble is ln()'s
    final ulp — rank order could only differ when two keys collide within
    ~1e-16 relative at exactly the k-th boundary, which hash-spread keys
    don't do. Ties (identical key) break by id ascending. The hash input
    is salted with an op tag ('es|' + id), so at default seeds this draw
    is independent of the `reservoir_sample` / `stratified_sample` /
    `split_assign` gates — composing them never reuses one hash stream.

    Scale shape: key computation is per-row projection (no shuffle); the
    top-k per group is a window row_number that Spark pushes below the
    exchange as WindowGroupLimit — at most k rows per (group, input
    partition) shuffle, same as ``reservoir_sample``."""
    from pyspark.sql import Window

    two52 = 1 << 52
    salted = F.concat(F.lit("es|"), F.col(id_col).cast("string"))
    h = F.pmod(portable_hash(salted, seed), F.lit(two52))
    u = (h + 1) / F.lit(float(two52 + 1))
    w_col = F.col(weight_col).cast("double")
    key = F.log(u) / w_col
    ranked = docs.filter(w_col > 0).withColumn("_es_key", key)
    parts = [group_col] if group_col is not None else []
    w = Window.partitionBy(*parts).orderBy(
        F.desc("_es_key"), F.col(id_col).asc()
    )
    return (
        ranked.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumn("sample_rank", F.col("_rk").cast("bigint"))
        .drop("_rk", "_es_key")
    )


def split_assign(
    docs: DataFrame,
    valid_bps: int = 500,
    test_bps: int = 500,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/valid/test split assignment: bucket =
    portable_hash(id) mod 10000; bucket < test_bps → 'test', next
    valid_bps buckets → 'valid', rest → 'train'. The split every training
    run needs pinned: hash-gated membership is disjoint and exhaustive by
    construction, reproducible across runs, partitionings and cluster
    sizes, and stable under corpus APPEND (a new doc lands in a split
    without moving any existing doc — unlike rank- or count-based splits,
    which reshuffle everything whenever N changes).

    The hash input is salted with an op tag ('split|' + id): at default
    seeds the split gate is INDEPENDENT of the sampling gates
    (`stratified_sample`/`reservoir_sample`/`weighted_sample`) — without
    the salt, a 10% stratified sample at seed 0 would select exactly the
    test split, silently contaminating any train/eval separation composed
    from these primitives.

    Returns docs + (split_bucket BIGINT, split STRING). Pure projection —
    zero shuffle; the gate column prunes straight into a parquet filter
    when a run reads only its own split."""
    if valid_bps < 0 or test_bps < 0 or valid_bps + test_bps > 10000:
        raise ValueError("valid_bps/test_bps must be ≥0 and sum ≤ 10000")
    salted = F.concat(F.lit("split|"), F.col(id_col).cast("string"))
    bucket = F.pmod(portable_hash(salted, seed), F.lit(10000))
    split = (
        F.when(bucket < test_bps, "test")
        .when(bucket < test_bps + valid_bps, "valid")
        .otherwise("train")
    )
    return docs.withColumn("split_bucket", bucket.cast("bigint")).withColumn(
        "split", split
    )


def mixture_plan(
    docs: DataFrame,
    weights10k: dict[str, int],
    budget_tokens: int,
    strata_col: str = "lang",
    default10k: int = 0,
) -> DataFrame:
    """Data-mixing recipe: given target mixture weights (×10k) and a total
    token budget, compute each stratum's sampling rate so the sampled
    corpus hits the budget at the requested proportions. Returns one row
    per stratum: (stratum, n_docs, stratum_tokens, target_tokens, rate10k)
    with rate10k = min(10000, budget·w10k div stratum_tokens) — pure
    integer arithmetic, one aggregation over the corpus (token counts are
    map-side partials; output cardinality = #strata)."""
    from .text import token_count

    stats = (
        docs.select(
            F.col(strata_col).alias("stratum"), token_count(F.col("text")).alias("_nt")
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("stratum_tokens"),
        )
    )
    w_of_stratum = None
    for value, w10k in weights10k.items():
        cond = F.col("stratum") == value
        w_of_stratum = (
            F.when(cond, w10k) if w_of_stratum is None else w_of_stratum.when(cond, w10k)
        )
    w_of_stratum = (
        F.lit(default10k)
        if w_of_stratum is None
        else w_of_stratum.otherwise(F.lit(default10k))
    )
    return stats.withColumn("w10k", w_of_stratum.cast("bigint")).select(
        "stratum",
        "n_docs",
        "stratum_tokens",
        F.expr(f"({budget_tokens}L * w10k) div 10000").alias("target_tokens"),
        F.least(
            F.lit(10000).cast("bigint"),
            F.expr(f"({budget_tokens}L * w10k) div greatest(stratum_tokens, 1L)"),
        ).alias("rate10k"),
    )


def mixture_sample(
    docs: DataFrame,
    weights10k: dict[str, int],
    budget_tokens: int,
    strata_col: str = "lang",
    default10k: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Apply a mixture plan in the same lazy DAG: broadcast-join the
    #strata-row plan back onto the corpus and keep rows whose hash gate
    clears their stratum's computed rate — plan + gate with no driver
    round-trip, reproducible under any partitioning (same gate as
    ``stratified_sample``)."""
    plan = mixture_plan(docs, weights10k, budget_tokens, strata_col, default10k)
    rates = plan.select(F.col("stratum").alias("_stratum"), "rate10k")
    bucket = F.pmod(portable_hash(F.col("doc_id").cast("string"), seed), F.lit(10000))
    # eqNullSafe: mixture_plan computes a (default10k-weighted) rate for the
    # NULL stratum too; a plain equi-join would silently drop every
    # NULL-stratum doc, violating the counted-not-dropped policy
    return (
        docs.join(
            F.broadcast(rates), F.col(strata_col).eqNullSafe(F.col("_stratum"))
        )
        .drop("_stratum")
        .filter(bucket < F.col("rate10k"))
    )


def ngram_hashes(
    docs: DataFrame,
    n: int = 8,
    col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xx",
) -> DataFrame:
    """Distinct word n-gram hashes per doc: (id, gram_hash) rows — the
    fixed-width join currency for contamination checks. Lowercased,
    whitespace-tokenized; docs shorter than n yield one whole-text gram.
    ``hasher``: "xx" (xxhash64 JVM intrinsic, production) or "md5" (the
    portable 60-bit hash the DuckDB oracle replicates) — same convention
    as ops/dedup.py."""
    h = _hash_fn(hasher)
    if hasher == "md5":
        from .util import spread_input

        docs = spread_input(docs)  # per-gram md5 digests ride the scan (§2.5)
    # token array materialized before the sliding-window transform —
    # slice() over the raw split() inside the lambda would re-split the
    # doc at every position (the O(n²) HOF re-evaluation trap)
    base = docs.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(col))), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        base.select(F.col(id_col), F.explode(grams).alias("_g"))
        # NULL/blank text collapses to a single '' gram — hashing it would
        # make every empty doc "share a gram" with every other empty doc
        # (contamination_pairs would then cross-join the blanks)
        .filter(F.col("_g") != "")
        .select(id_col, h(F.col("_g")).alias("gram_hash"))
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_gram_df: int | None = DEFAULT_MAX_GRAM_DF,
    hasher: str = "xx",
    max_doc_gram_df: int | None = None,
) -> DataFrame:
    """Benchmark-contamination detection: for each candidate training doc,
    the benchmark docs it shares ≥1 word n-gram with, and how many — the
    standard eval-leakage screen (an 8-gram collision with a test set is
    strong evidence the eval item leaked into training data).

    Plan: distinct n-gram hashes per side, equi-join on the hash, count per
    (doc, benchmark) pair. The shuffle carries (hash, id) pairs only;
    ``max_gram_df`` drops n-grams present in more than that many benchmark
    docs (license headers, prompt boilerplate) before the join — so the
    join's BUILD side holds ≤ cap rows per key. The candidate side is
    deliberately NOT capped by default: a gram in many training docs but
    few benchmark docs is legitimate per-doc contamination signal, and
    probe-side skew on a hot gram is what AQE skew-join splitting handles
    (the build side stays ≤ cap rows per key, so split probe partitions
    are cheap). If a corpus carries pathological boilerplate and dropped
    signal is acceptable, ``max_doc_gram_df`` applies the symmetric cap
    to the candidate side."""
    bench_grams = ngram_hashes(benchmark, n=n, hasher=hasher).withColumnRenamed(
        "doc_id", "bench_id"
    )
    if max_gram_df is not None:
        busy = (
            bench_grams.groupBy("gram_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_gram_df)
            .select("gram_hash")
        )
        bench_grams = bench_grams.join(busy, "gram_hash", "left_anti")
    doc_grams = ngram_hashes(docs, n=n, hasher=hasher)
    if max_doc_gram_df is not None:
        busy_docs = (
            doc_grams.groupBy("gram_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_gram_df)
            .select("gram_hash")
        )
        doc_grams = doc_grams.join(busy_docs, "gram_hash", "left_anti")
    return (
        doc_grams.join(bench_grams, "gram_hash")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared_grams: int = 1,
    max_gram_df: int | None = DEFAULT_MAX_GRAM_DF,
    hasher: str = "xx",
) -> DataFrame:
    """The ACTION step of the contamination screen: annotate every
    candidate doc with its benchmark-overlap evidence and a keep verdict
    (keep = no benchmark doc shares ≥ ``min_shared_grams`` n-grams with
    it). Counted, not dropped — every input doc comes back with
    (n_bench_hits, max_shared_grams, keep), so the pipeline can audit the
    removal set before filtering to ``keep`` (the same verdict-column
    policy as ``gopher_quality_filter``).

    Plan: ``contamination_pairs`` does the gram-hash equi-join (digest
    shuffles, benchmark boilerplate capped); the per-doc verdict is one
    more map-side-combinable groupBy on doc_id; bodies move once, in the
    final doc_id left join."""
    pairs = contamination_pairs(
        docs, benchmark, n=n, max_gram_df=max_gram_df, hasher=hasher
    )
    evidence = (
        pairs.filter(F.col("n_shared_grams") >= min_shared_grams)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bench_hits"),
            F.max("n_shared_grams").cast("bigint").alias("max_shared_grams"),
        )
    )
    return docs.join(evidence, "doc_id", "left").select(
        *docs.columns,
        F.coalesce("n_bench_hits", F.lit(0)).alias("n_bench_hits"),
        F.coalesce("max_shared_grams", F.lit(0)).alias("max_shared_grams"),
        F.col("n_bench_hits").isNull().alias("keep"),
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_buckets: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-split training-sequence packing: lay every document's
    tokens end-to-end in a deterministic hash-shuffled global order, then
    cut the tape into fixed ``budget_tokens`` sequences (documents may
    straddle a cut — the standard GPT-style packing; nothing is padded or
    dropped). Returns each document's placement: (doc_id, n_tokens,
    tok_offset, first_seq, pos_in_first_seq, last_seq, n_seqs).

    The global order is (portable_hash(doc_id, seed), doc_id) — a uniform
    shuffle of the corpus that is reproducible across runs, partitionings
    and cluster sizes, so every epoch and every resumed job cuts identical
    sequences.

    Scale plan — a distributed prefix sum, NOT a global-ORDER-BY window
    (which Spark executes as a single-partition sort, one task holding the
    whole corpus):
    1. bucket = hash div (2^60/n_buckets) — buckets are contiguous ranges
       of the order key, so bucket order extends the global order;
    2. per-bucket token totals (map-side partial agg, n_buckets rows) and
       their exclusive running sum via a window over the n_buckets-row
       aggregate — bounded single-partition work, independent of corpus
       size;
    3. broadcast the bucket offsets back and add each row's within-bucket
       exclusive cumsum (window partitioned by bucket — one shuffle of
       (hash, id, n_tokens), never text).
    Size ``n_buckets`` so one bucket's rows fit an executor (corpus_rows /
    n_buckets ≈ a few million; the default 64 suits test scale)."""
    from pyspark.sql import Window

    from .text import token_count

    if budget_tokens <= 0 or n_buckets <= 0:
        raise ValueError("budget_tokens and n_buckets must be positive")
    # portable_hash is 60-bit; ceil-width keeps bucket < n_buckets while
    # preserving "bucket order == hash-range order"
    width = (1 << 60) // n_buckets + (1 if (1 << 60) % n_buckets else 0)
    h = portable_hash(F.col(id_col).cast("string"), seed)
    # `div`, never `/`: float division of 60-bit hashes / 100-TB-scale
    # token offsets loses bits past 2^53 and misassigns boundary rows
    # n_tokens_col: pack by PRECOMPUTED counts (a learned-tokenizer budget
    # from bpe_encode_counts, or digest-only upstream plans that must not
    # carry document text) instead of the whitespace count of `col`
    nt = (
        F.coalesce(F.col(n_tokens_col).cast("bigint"), F.lit(0))
        if n_tokens_col is not None
        # coalesce: one NULL-text doc must count 0, not poison every
        # downstream offset through the running sum
        else token_count(F.coalesce(F.col(col), F.lit(""))).cast("bigint")
    )
    d = docs.select(
        F.col(id_col),
        h.alias("_h"),
        nt.alias("n_tokens"),
    ).withColumn("_b", F.expr(f"_h div {width}L"))
    btot = d.groupBy("_b").agg(F.sum("n_tokens").alias("_bt"))
    w_buckets = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "_b", F.coalesce(F.sum("_bt").over(w_buckets), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.join(F.broadcast(boff), "_b").withColumn(
        "tok_offset", F.col("_boff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    )
    # a zero-token doc sits AT its offset: first_seq == last_seq, n_seqs 1
    bt = int(budget_tokens)
    return placed.select(
        id_col,
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset div {bt}L").alias("first_seq"),
        F.expr(f"tok_offset % {bt}L").alias("pos_in_first_seq"),
        F.expr(f"(tok_offset + greatest(n_tokens, 1L) - 1) div {bt}L").alias("last_seq"),
        F.expr(
            f"(tok_offset + greatest(n_tokens, 1L) - 1) div {bt}L"
            f" - tok_offset div {bt}L + 1"
        ).alias("n_seqs"),
    )


def write_packed_corpus(
    docs: DataFrame,
    out_dir: str,
    budget_tokens: int = 2048,
    seqs_per_shard: int = 1024,
    n_buckets: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    mode: str = "overwrite",
    tasks_per_shard: int = 1,
) -> DataFrame:
    """Export the packed corpus as deterministic training shards: every doc
    joined with its ``pack_sequences`` placement and written to
    ``shard=K/`` parquet dirs, shard K = first_seq div seqs_per_shard.
    A trainer streams shard dirs in order and rebuilds each sequence by
    concatenating docs sorted on (tok_offset) — placement columns carry
    everything needed to split at sequence boundaries.

    Write layout follows sinks.write_es: cluster by (shard [, salt])
    BEFORE partitionBy, so one shard never collapses into one writer task
    — raise ``tasks_per_shard`` when shards outgrow a task (the 100 TB
    case). Placement is a pure function of (doc_id, seed), so a re-run
    (or a resumed overwrite) produces byte-identical shard assignment.

    Returns the written DataFrame (lazy plan re-read is the caller's
    choice; row count == input row count — nothing padded or dropped)."""
    placed = pack_sequences(
        docs, budget_tokens=budget_tokens, n_buckets=n_buckets,
        col=col, id_col=id_col, seed=seed,
    )
    if seqs_per_shard <= 0:
        raise ValueError("seqs_per_shard must be positive")
    out = (
        docs.join(placed, id_col)
        .withColumn("shard", F.expr(f"first_seq div {int(seqs_per_shard)}L"))
    )
    parts = [F.col("shard")]
    if tasks_per_shard > 1:
        parts.append(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(tasks_per_shard))
        )
    (
        out.repartition(*parts)
        .sortWithinPartitions("tok_offset")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return out


def conv_documents(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, doc, conv_fp): assemble each conversation into
    one training document — 'role: text' lines in stable turn_idx order
    (reference quirk 7: byte equality under stable ordering) — plus an
    UNAMBIGUOUS content fingerprint. One shuffle on conv_id, the table's
    native partition key.

    The fingerprint is md5 over the concatenation of PER-TURN md5s
    (each (role, text) turn contributes exactly one fixed-width 32-hex
    block), NOT md5 of the assembled doc: turn texts can contain literal
    newlines, so two different conversations can assemble to the same
    'role: text\\n…' string — a one-turn conversation quoting
    'hello\\nassistant: hi' must not dedup against the real two-turn
    conversation it quotes.

    Scale bound: unlike `conv_fingerprints` (digest-first, 36 B/turn
    state), here the assembled text IS the output, so turn bodies must
    cross the conv_id exchange once and the per-conversation buffer is
    O(conversation bytes) — the irreducible cost of assembly. Callers
    that only need the fingerprint (dedup verdicts) should use
    `ops.dedup.conv_fingerprints` instead."""
    line = lambda s: F.concat(s["role"], F.lit(": "), s["text"])  # noqa: E731
    # F.concat propagates NULL (the line/turn drops out of concat_ws),
    # matching `role || ': ' || text` + string_agg's NULL-row skip in SQL
    turn_fp = lambda s: F.md5(F.concat(s["role"], F.lit("\x1f"), s["text"]))  # noqa: E731
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text")))
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws("\n", F.transform(ordered, line)).alias("doc"),
        F.md5(F.concat_ws("", F.transform(ordered, turn_fp))).alias("conv_fp"),
    )


def transcript_training_corpus(
    turns: DataFrame,
    budget_tokens: int = 512,
    n_buckets: int = 64,
    seed: int = 0,
) -> DataFrame:
    """End-to-end transcripts → packed training corpus, one lazy plan:
    assemble per-conversation documents, drop exact duplicate
    conversations (per-turn-md5 fingerprint, keep min conv_id —
    digest-only window), then lay the survivors' tokens end-to-end and
    cut fixed ``budget_tokens`` sequences (`pack_sequences`' distributed
    prefix sum — no global-sort window). Returns each kept
    conversation's placement: (conv_id, n_tokens, tok_offset, first_seq,
    pos_in_first_seq, last_seq, n_seqs).

    This is the transcripts twin of `ops/curation.curate`: the
    composition a 100 TB transcript corpus actually runs before
    tokenizer/trainer handoff. Every stage keeps its standalone scale
    shape — conv_id shuffle (native key) → fingerprint-digest window →
    bucketed prefix sum. Conversation text crosses the wire exactly once
    (into the assembly groupBy): the token count is projected off the
    assembled doc BEFORE the dedup window and the packer runs on the
    precomputed counts (``n_tokens_col``), so the window and every later
    exchange carry (conv_id, fp, n_tokens) digest rows only."""
    from pyspark.sql import Window

    from .text import token_count

    docs = conv_documents(turns).select(
        "conv_id",
        F.col("conv_fp").alias("_fp"),
        token_count(F.coalesce(F.col("doc"), F.lit(""))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("_fp")
    canon = docs.withColumn("_keep", F.min("conv_id").over(w)).filter(
        F.col("conv_id") == F.col("_keep")
    )
    placed = pack_sequences(
        canon.select(F.col("conv_id").alias("doc_id"), "n_tokens"),
        budget_tokens=budget_tokens,
        n_buckets=n_buckets,
        seed=seed,
        n_tokens_col="n_tokens",
    )
    return placed.withColumnRenamed("doc_id", "conv_id")


def range_shards(
    df: DataFrame,
    score_col: str,
    n_shards: int = 8,
    bin_width: int = 1,
    boundaries: list[int] | None = None,
) -> DataFrame:
    """Deterministic range sharding: assign every row a shard id in
    [0, n_shards) such that shards are CONTIGUOUS, monotone ranges of
    ``score_col`` with near-equal row counts — the curriculum-export /
    global-order primitive. This is what ``repartitionByRange`` does,
    minus its reservoir-sampled (nondeterministic, run-dependent)
    boundaries: here the cut points come from a bounded histogram, so
    the same input always yields the same sharding in every engine.

    Plan: an integer-bin histogram of the score (state ≤ range/bin_width
    cells regardless of rows, map-side combined), one cumulative window
    over OCCUPIED BINS (bounded by construction — the hist_quantile
    argument, not a per-row window), picking the n_shards-1 bin upper
    edges holding ranks ceil(s·total/n_shards). Assignment is then a
    zero-shuffle row-local comparison against the ≤ n_shards-1 boundary
    literals. The boundary collect is bounded (one row) and mirrors the
    documented `ivf_assign` pattern; pass ``boundaries=`` to skip it for
    plan-only/stream composition. Balance is exact up to bin granularity
    (ties inside one bin cannot be split — shrink bin_width for finer
    cuts).

    Requires an integral score column (exact integer bins; floats would
    round past 2^53 — see hist_quantile_sketch). Returns df plus a
    ``shard`` column; NULL scores shard NULL (counted, not dropped).
    Export layout: ``.repartition('shard').sortWithinPartitions(score)``
    writes each shard as one score-ordered partition — a total order
    across files without a single-task global sort."""
    from pyspark.sql import Window
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if n_shards < 2:
        raise ValueError(f"need n_shards >= 2, got {n_shards}")
    if bin_width < 1:
        raise ValueError(f"need bin_width >= 1, got {bin_width}")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — range_shards would "
            "silently overwrite it; rename or drop it first"
        )
    if not isinstance(
        df.schema[score_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise ValueError(f"{score_col} must be integral for exact binning")
    v = F.col(score_col)
    if boundaries is None:
        w = int(bin_width)
        hist = (
            df.filter(v.isNotNull())
            .select(F.expr(f"({score_col} - pmod({score_col}, {w}L)) div {w}L").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ranked = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
            "n", F.sum("cnt").over(Window.partitionBy())
        )
        # rank_s = ceil(s*n / n_shards), integer-exact; ub = exclusive
        # upper bin edge, like hist_quantile_estimate
        aggs = []
        for s in range(1, n_shards):
            r = F.expr(f"({s}L * n + {n_shards - 1}L) div {n_shards}L")
            hit = (r > F.col("cum") - F.col("cnt")) & (r <= F.col("cum"))
            aggs.append(
                F.max(F.when(hit, (F.col("bin") + 1) * bin_width)).alias(f"b{s}")
            )
        row = ranked.groupBy().agg(*aggs).collect()
        bs = [row[0][f"b{s}"] for s in range(1, n_shards)] if row else []
        boundaries = [int(b) for b in bs if b is not None]
    ub_arr = F.array(*[F.lit(int(b)).cast("bigint") for b in boundaries]) if boundaries else F.expr("array()")
    shard = F.when(
        v.isNotNull(),
        F.size(F.filter(ub_arr, lambda b: b <= v.cast("bigint"))).cast("int"),
    )
    return df.withColumn("shard", shard)


def write_range_sharded(
    df: DataFrame,
    out_dir: str,
    score_col: str,
    n_shards: int = 8,
    bin_width: int = 1,
    boundaries: list[int] | None = None,
) -> None:
    """Materialize the `range_shards` layout: one ``shard=<s>`` directory
    per shard, rows sorted by (score, every remaining column) WITHIN each
    shard's files — reading shard directories in order is a total score
    order over the corpus, produced with no single-task global sort (the
    only exchange is the shard repartition; the sort is within-partition).
    NULL scores land in a ``shard=__HIVE_DEFAULT_PARTITION__`` directory,
    Spark's counted-not-dropped convention for NULL partition values.

    The deterministic twin of ``df.repartitionByRange(...).write`` —
    same file-level contract, but identical boundaries on every run
    (see `range_shards`)."""
    sharded = range_shards(
        df, score_col, n_shards=n_shards, bin_width=bin_width, boundaries=boundaries
    )
    sort_cols = [score_col] + [
        c for c in df.columns if c not in (score_col, "shard")
    ]
    # the sort LEADS with the partition column: FileFormatWriter requires
    # partition-column ordering and silently ADDS its own (non-stable)
    # sort when the incoming order doesn't start with it — which would
    # scramble the score order inside every file. Leading with shard
    # satisfies the requirement, so the writer adds nothing and the
    # within-shard (score, ...) order survives into the files.
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", *sort_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def context_truncation_plan(
    turns: DataFrame, budget_tokens: int = 256
) -> DataFrame:
    """Context-window truncation plan for multi-turn transcripts: keep
    the LATEST turns of each conversation whose cumulative whitespace
    token count fits ``budget_tokens`` (the chat-context rule — newest
    context survives, oldest is dropped first). Every turn is emitted
    with its verdict (counted, not dropped); a turn that individually
    exceeds the whole budget is cut like any other overflow.

    Returns (conv_id, turn_idx, n_tokens, cum_from_end, kept).

    Scale shape: one reverse prefix sum per conversation (window on the
    native conv key, frame bounded by conversation length); token
    counting is a row-local size(split())."""
    from pyspark.sql import Window

    ntok = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("bigint")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = turns.filter(F.col("text").isNotNull()).select(
        "conv_id", "turn_idx", ntok.alias("n_tokens")
    )
    return base.withColumn(
        "cum_from_end", F.sum("n_tokens").over(w).cast("bigint")
    ).withColumn(
        "kept", (F.col("cum_from_end") <= budget_tokens).cast("int")
    )


def neyman_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    measure_col: str = "n_chars",
    budget: int = 100,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Neyman-allocated stratified sample (Neyman 1934): per-stratum
    sample sizes proportional to N_h * S_h — spend the budget where the
    stratum is big AND internally variable, the minimum-variance
    allocation for estimating a population mean under a fixed total n.
    The upgrade over proportional `stratified_sample` when strata differ
    wildly in spread (e.g. short chat turns vs long documents).

    Allocation is integer-exact and engine-portable: the weight is
    w_h = floor(sqrt(N_h*sum(x^2) - sum(x)^2)) = floor(N_h * sd_pop(x)),
    computed from exact BIGINT moments (IEEE sqrt is correctly rounded,
    so floor(sqrt(exact_int)) is bit-identical in any engine);
    alloc_h = budget * w_h div sum(w) (floor allocation — the rounding
    remainder is intentionally left unspent, documented, deterministic).
    Selection inside each stratum keeps the alloc_h smallest by
    (portable_hash(id, seed), id) — a uniform, re-derivable order.

    Returns the picked rows (strata_col, id_col, alloc_n) sorted within
    each stratum by id.

    Scale shape: one map-side-combined moment rollup per stratum (3
    BIGINTs per stratum; at 100 TB cast the moments to DECIMAL(38,0) —
    n_chars^2 sums overflow BIGINT past ~10^9 long docs), the allocation
    arithmetic on the strata-count-sized aggregate, a broadcast join of
    the alloc table, and a WindowGroupLimit rank (at most alloc_h rows
    per stratum survive each input partition's shuffle write)."""
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"need budget >= 1, got {budget}")
    x = F.col(measure_col).cast("bigint")
    # count(x), not count(*): NULL measures must be absent from ALL three
    # moments or the variance numerator N*sum(x^2) - sum(x)^2 is inflated
    st = docs.groupBy(strata_col).agg(
        F.count(x).cast("bigint").alias("_n"),
        F.sum(x).cast("bigint").alias("_s1"),
        F.sum(x * x).cast("bigint").alias("_s2"),
    )
    wtot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    alloc = (
        st.withColumn(
            "_w",
            F.floor(F.sqrt((F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast("double"))).cast("bigint"),
        )
        .withColumn("_wsum", F.sum("_w").over(wtot))
        .select(
            strata_col,
            F.expr(f"CASE WHEN _wsum > 0 THEN CAST(({budget} * _w) DIV _wsum AS BIGINT) ELSE 0 END").alias("alloc_n"),
        )
    )
    h = portable_hash(F.col(id_col).cast("string"), seed)
    rk = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    # two-phase pick: rank-filter against the LITERAL budget first (alloc_h
    # <= budget always), which Spark's WindowGroupLimit pushes below the
    # exchange — each map task ships at most `budget` rows per stratum
    # instead of the whole table (measured: 41 MB -> bounded at 512x);
    # the per-stratum alloc_n column filter then trims the survivors
    pruned = (
        docs.select(strata_col, id_col)
        .withColumn("_rn", F.row_number().over(rk))
        .filter(F.col("_rn") <= F.lit(int(budget)))
    )
    return (
        pruned.join(F.broadcast(alloc), strata_col)
        .filter(F.col("_rn") <= F.col("alloc_n"))
        .select(strata_col, id_col, "alloc_n")
    )
