"""Text analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic. All built-in `pyspark.sql.functions`
— JVM-side, whole-stage-codegen'd; no Python in the hot path.

Ratios are emitted as floor(ratio*10000) BIGINTs so results are
hash-identical across engines (no float formatting drift in oracles).
"""

from __future__ import annotations

import pandas as pd  # driver-side: only for pandas_udf type-hint resolution

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "and", "of", "to", "in", "is", "it", "that"]


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored proxy: word pieces + standalone punctuation/digits
    (`\\w+` runs and single non-space symbols each count as one token)."""
    trimmed = F.trim(col)
    pieces = F.regexp_count(trimmed, F.lit(r"\w+|[^\w\s]"))
    return pieces.cast("bigint")


def _ratio10k(num: Column, den: Column) -> Column:
    return F.when(den == 0, F.lit(0)).otherwise(
        F.floor(num.cast("double") / den.cast("double") * 10000)
    ).cast("bigint")


def _stopword_hits(t: Column) -> Column:
    """Count of DISTINCT stopwords present (space-delimited match) — the
    one stopword signal, shared by quality_features / lang_id /
    gopher_quality_filter so the matching rule cannot drift between
    them."""
    lower_t = F.lower(t)
    hits = None
    for w in STOPWORDS:
        hit = F.when(lower_t.like(f"% {w} %"), 1).otherwise(0)
        hits = hit if hits is None else hits + hit
    return hits


def quality_features(docs: DataFrame, col: str = "text") -> DataFrame:
    """Per-document quality features: char/token/punctuation counts,
    punctuation / digit / whitespace ratios (×10k), and the stopword hit
    count — the standard pre-training quality-filter signals. (Mean token
    length and case ratios live in `gopher_quality_filter`, which turns
    them into verdicts.)"""
    t = F.col(col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = F.length(t) - F.length(F.regexp_replace(t, r" ", ""))
    stop_hits = _stopword_hits(t)
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        punct.cast("bigint").alias("n_punct"),
        _ratio10k(punct, n_chars).alias("punct_ratio10k"),
        _ratio10k(digits, n_chars).alias("digit_ratio10k"),
        _ratio10k(spaces, n_chars).alias("space_ratio10k"),
        stop_hits.cast("bigint").alias("stopword_hits"),
    )


def lang_id(docs: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: ≥2 distinct English stopword hits ⇒
    'en'; any CJK character ⇒ 'cjk'; else 'unk'. (A real system swaps in a
    fastText model via pandas UDF; the routing/aggregation plumbing is
    identical.)"""
    t = F.col(col)
    stop_hits = _stopword_hits(t)
    has_cjk = F.regexp_count(t, F.lit(r"[一-鿿]")) > 0
    lang = (
        F.when(has_cjk, F.lit("cjk"))
        .when(stop_hits >= 2, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return docs.select("doc_id", stop_hits.cast("bigint").alias("stopword_hits"), lang.alias("pred_lang"))


def doc_fingerprint(docs: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace/case-normalized md5 content fingerprint per doc — the
    SAME normalization as dedup.fingerprint (imported, not re-written, so
    fingerprints always agree with dedup_exact groups)."""
    from .dedup import fingerprint

    return docs.select("doc_id", fingerprint(col).alias("fingerprint"))


def heavy_hitter_tokens(docs: DataFrame, k: int = 50, col: str = "text") -> DataFrame:
    """Top-k most frequent whitespace tokens corpus-wide (the vocabulary /
    boilerplate-detection primitive). Deterministic tie-break: (count desc,
    token asc).

    Plan at scale: explode → hash-agg with map-side partial counting (the
    per-partition combine collapses each partition's token stream to its
    distinct tokens before the shuffle), then TakeOrdered(k) — no global
    sort of the full vocabulary."""
    toks = F.explode(F.split(F.lower(F.trim(F.col(col))), r"\s+")).alias("token")
    return (
        docs.select(toks)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


def vocab_stats(
    docs: DataFrame, group_col: str = "lang", col: str = "text"
) -> DataFrame:
    """Per-group corpus vocabulary statistics — the profile a mixing /
    pruning decision reads before touching any document: token volume,
    vocabulary size, type-token ratio, and hapax share (fraction of the
    vocabulary occurring exactly once — high hapax = noisy/OCR-ish text,
    low = templated text; the classic corpus-linguistics diversity pair).

    Returns (group, n_docs, n_tokens, vocab, ttr_bps, hapax, hapax_bps):
    ttr_bps = floor(10000·vocab/n_tokens), hapax_bps = floor(10000·hapax/
    vocab) — integer-exact. Groups whose docs are all empty surface with
    zeros/NULL ratios (counted, not dropped).

    Plan: one explode → (group, token) hash-agg with map-side partial
    counts (each partition collapses its token stream to per-partition
    distinct (group, token) rows before the shuffle — the shuffle is
    vocabulary-sized, never corpus-sized), then a per-group rollup of
    those counts. n_docs aggregates separately on the same group key and
    broadcast-joins in (group cardinality = languages, tiny)."""
    toks = F.explode(F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+"))
    per_token = (
        docs.select(F.col(group_col).alias("grp"), toks.alias("token"))
        .filter(F.col("token") != "")
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    per_group = per_token.groupBy("grp").agg(
        F.sum("ct").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("ct") == 1, 1).otherwise(0)).cast("bigint").alias("hapax"),
    )
    n_docs = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # eqNullSafe: a NULL group must pair with its own token stats, not
    # fall to the zero row
    return (
        n_docs.join(
            F.broadcast(per_group.withColumnRenamed("grp", "pgrp")),
            F.col("grp").eqNullSafe(F.col("pgrp")),
            "left",
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("vocab", F.lit(0)).alias("vocab"),
            F.expr(
                "CASE WHEN coalesce(n_tokens, 0) > 0"
                " THEN (10000 * vocab) div n_tokens END"
            ).cast("bigint").alias("ttr_bps"),
            F.coalesce("hapax", F.lit(0)).alias("hapax"),
            F.expr(
                "CASE WHEN coalesce(vocab, 0) > 0"
                " THEN (10000 * hapax) div vocab END"
            ).cast("bigint").alias("hapax_bps"),
        )
    )


def bpe_pair_counts(docs: DataFrame, top_n: int = 30, col: str = "text") -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts — the counting step of BPE
    tokenizer training (one merge round over the character alphabet; the
    merge loop re-runs this op on re-segmented symbols). Deterministic
    tie-break: (count desc, pair asc).

    Scale shape: pair counting runs over the DISTINCT-WORD table weighted
    by word frequency, not over the raw corpus — the standard BPE-training
    trick. Stage 1 (word counts) shuffles one (word, partial-count) row
    per distinct word per partition (map-side combine); stage 2 explodes
    each vocab word into its ≤len-1 pairs and hash-aggregates again.
    Both exchanges carry the vocabulary, not the corpus. Final top-n is a
    TakeOrdered, not a global sort. All built-ins — split, substr,
    sequence — inside whole-stage codegen; per-position multiplicity
    ('aaa' contains 'aa' twice) is counted exactly."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(col))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # sequence(1, len-1) only for len >= 2: Spark's sequence DESCENDS when
    # start > stop, so an unguarded length-1 word would emit bogus indices
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
            "word",
        )
        .select(F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"), "cnt")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top_n)
    )


def quality_prune_per_group(
    docs: DataFrame, keep_pct: int = 30, group_col: str = "lang", col: str = "text"
) -> DataFrame:
    """Relative quality calibration: keep the top ``keep_pct`` percent of
    documents PER GROUP (language/domain) by quality score — the
    FineWeb-style alternative to one global absolute threshold, which
    over-prunes low-resource domains. Emits every doc with its rank-derived
    verdict so the caller can filter or audit.

    Score here = stopword_hits·10⁶ + token count (integer-exact,
    deterministic; a production pass swaps in a model-scored column through
    the same contract). Ranking ties break by doc_id. Per-group kept count
    = floor(n_group · keep_pct / 100).

    Scale shape: one shuffle on the group key; within-group window sort is
    per-domain, not global. Domains are few and fat — AQE skew-split
    handles an oversized one, and a per-domain sort is the operation's
    intrinsic cost (a quantile-sketch cutoff trades exactness for a
    sort-free plan; this op is the exact variant)."""
    from pyspark.sql import Window

    t = F.col(col)
    score = (
        _stopword_hits(t).cast("bigint") * 1_000_000 + token_count(t).cast("bigint")
    )
    ranked = docs.select(
        "doc_id", F.col(group_col).alias("grp"), score.alias("score")
    ).select(
        "doc_id",
        "grp",
        "score",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
        ).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n_grp"),
    )
    return ranked.select(
        "doc_id",
        F.col("grp").alias(group_col),
        "score",
        (
            F.col("rn") <= F.floor(F.col("n_grp") * keep_pct / 100)
        ).cast("int").alias("kept"),
    )


#: redaction patterns (applied in dict order): public PII-shaped tokens
REDACTIONS: dict[str, str] = {
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}": "<EMAIL>",
    r"https?://[^\s]+": "<URL>",
    r"\b(?:\d{1,3}\.){3}\d{1,3}\b": "<IP>",
    r"\b\d{3}-\d{2}-\d{4}\b": "<SSN>",
    r"\b(?:\d[ -]?){13,16}\b": "<CARD>",
}


def redact_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """Training-data PII scrub: replace email/URL/IP/SSN/card-shaped spans
    with typed placeholders, count replacements per doc. Chained
    `regexp_replace` — all JVM regex, one codegen'd projection, no Python.
    Patterns are deliberately simple/public (regex PII scrubbing is a
    recall floor, not a guarantee — a production pass layers an NER model
    behind the same column contract)."""
    red = F.col(col)
    n_redacted = F.lit(0)
    for pat, tag in REDACTIONS.items():
        # count matches in the text state BEFORE this stage's replacement:
        # the exact number of replacements performed. Counting placeholder
        # occurrences in the final text (the old formulation) counted
        # pre-existing literal '<URL>'-style strings in the input as
        # redactions and missed chained replacements (an email swallowed
        # by a later URL replacement).
        n_redacted = n_redacted + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, tag)
    return docs.select(
        "doc_id",
        red.alias("clean_text"),
        n_redacted.cast("bigint").alias("n_redacted"),
    )


def repetition_ratio(docs: DataFrame, col: str = "text") -> DataFrame:
    """Duplicate-line fraction per document (boilerplate/repetition signal,
    one of the Gopher repetition rules): 10k-scaled share of lines that are
    repeats of an earlier line. Array ops only — split, distinct, sizes."""
    lines = F.split(F.col(col), r"\n")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    return docs.select(
        "doc_id",
        n_lines.cast("bigint").alias("n_lines"),
        _ratio10k(n_lines - n_distinct, n_lines).alias("dup_line_ratio10k"),
    )


#: Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shapes, simplified to
#: integer-exact arithmetic): each failure sets a bit in `flags`
GOPHER_MIN_TOKENS = 5
GOPHER_MAX_TOKENS = 100_000
GOPHER_MEAN_WORD_LEN_MIN10K = 20_000  # mean token length in [2.0, 12.0]
GOPHER_MEAN_WORD_LEN_MAX10K = 120_000
GOPHER_MAX_SYMBOL_RATIO10K = 1_000  # >10% #/… symbols ⇒ reject
GOPHER_MIN_STOPWORD_HITS = 1


def gopher_quality_filter(docs: DataFrame, col: str = "text") -> DataFrame:
    """Rule-based pre-training quality verdict per document, Gopher-style:
    token-count bounds, mean-word-length band, symbol ratio, stopword
    presence. Emits a `flags` bitmask (bit set = rule failed) and
    `keep` = all rules passed — integer-exact so any engine agrees.

    bit 0: token count out of [GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS]
    bit 1: mean word length (×10k) out of [2.0, 12.0]
    bit 2: symbol ratio (×10k) over threshold ('#' and ellipsis)
    bit 3: fewer than GOPHER_MIN_STOPWORD_HITS distinct stopword hits
    """
    t = F.col(col)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    # mean word length ×10k = total non-space chars / tokens
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl10k = F.when(n_tokens == 0, F.lit(0)).otherwise(
        (non_space.cast("bigint") * 10000) / n_tokens
    ).cast("bigint")
    symbols = F.length(t) - F.length(F.regexp_replace(t, r"[#…]", ""))
    symbol_ratio10k = _ratio10k(symbols, n_chars)
    stop_hits = _stopword_hits(t)
    f0 = ((n_tokens < GOPHER_MIN_TOKENS) | (n_tokens > GOPHER_MAX_TOKENS)).cast("bigint")
    f1 = (
        (mean_wl10k < GOPHER_MEAN_WORD_LEN_MIN10K)
        | (mean_wl10k > GOPHER_MEAN_WORD_LEN_MAX10K)
    ).cast("bigint")
    f2 = (symbol_ratio10k > GOPHER_MAX_SYMBOL_RATIO10K).cast("bigint")
    f3 = (stop_hits < GOPHER_MIN_STOPWORD_HITS).cast("bigint")
    flags = f0 + f1 * 2 + f2 * 4 + f3 * 8
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        mean_wl10k.alias("mean_word_len10k"),
        symbol_ratio10k.alias("symbol_ratio10k"),
        flags.alias("flags"),
        (flags == 0).cast("int").alias("keep"),
    )


def boilerplate_lines(
    docs: DataFrame,
    df_threshold: int = 3,
    domain_col: str = "source",
    col: str = "text",
) -> DataFrame:
    """CCNet/FineWeb-style per-domain boilerplate line removal: a line is
    boilerplate when it appears (byte-identical, trimmed) in at least
    ``df_threshold`` DISTINCT documents of the SAME domain — nav bars,
    cookie banners, license footers stamped across a site. Every
    occurrence is removed, including the first (frequency-threshold
    semantics — contrast `paragraph_dedup`, which keeps the first
    occurrence of a duplicate corpus-wide). Returns (doc_id, text_md5,
    n_kept, n_removed) with text_md5 = md5 of the doc rebuilt from its
    surviving lines ('' when everything was boilerplate; the doc still
    appears — counted, not dropped).

    Shuffle discipline mirrors `paragraph_dedup`: line BODIES never enter
    the frequency decision — the document-frequency groupBy shuffles
    (domain, md5(line)) digests with map-side-combined distinct doc
    counts, and the flagged set comes back to each doc through one
    (domain, digest) equi-join carrying integer indices. At 100 TB the
    boilerplate side is tiny (only digests with df ≥ threshold survive
    the HAVING), so AQE broadcast-joins it; bodies move at most once, in
    the doc_id join that pairs each original row with its keep-set.
    NULL text yields one empty line (counted, not dropped); NULL domains
    group together (a site-less bucket)."""
    if df_threshold < 2:
        raise ValueError(f"need df_threshold >= 2, got {df_threshold}")
    text = F.coalesce(F.col(col), F.lit(""))
    ls = F.split(text, r"\n")
    dom = F.coalesce(F.col(domain_col), F.lit("\x00nodomain"))
    lines = docs.select(
        "doc_id",
        dom.alias("_dom"),
        F.posexplode(ls).alias("line_idx", "line"),
    ).select("doc_id", "_dom", "line_idx", F.md5(F.trim("line")).alias("fp"))
    flagged = (
        lines.groupBy("_dom", "fp")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= df_threshold)
        .select("_dom", "fp")
    )
    kept_sets = (
        lines.join(flagged, ["_dom", "fp"], "left_anti")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("line_idx")).alias("keep_idx"))
    )
    out = docs.select("doc_id", ls.alias("_ls")).join(kept_sets, "doc_id", "left")
    lcol = F.col("_ls")
    keep_idx = F.coalesce(F.col("keep_idx"), F.expr("array()"))
    rebuilt = F.concat_ws(
        "\n", F.transform(keep_idx, lambda i: F.element_at(lcol, i + 1))
    )
    return out.select(
        "doc_id",
        F.md5(rebuilt).alias("text_md5"),
        F.size(keep_idx).cast("bigint").alias("n_kept"),
        (F.size(lcol) - F.size(keep_idx)).cast("bigint").alias("n_removed"),
    )


def dsir_importance(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, Data Selection via
    Importance Resampling — public algorithm): score every document by how
    much its hashed-unigram distribution resembles a TARGET slice of the
    corpus relative to the RAW distribution. Integer-exact variant: each
    word's weight is (target_cnt * scale) div raw_cnt — a fixed-point
    likelihood ratio instead of float log-probabilities, so Spark and any
    SQL engine agree bit-for-bit — and a doc's score is the sum of its
    token occurrences' weights, normalized per token (`avg_weight`).
    Downstream selection keeps the top quantile by avg_weight (compose
    with `range_shards`/`quality_prune_per_group`).

    Returns (doc_id, n_tokens, dsir_score, avg_weight); docs with no
    tokens are absent (nothing to score — the SQL GROUP BY convention).

    Scale shape: two vocabulary aggregations (map-side combined,
    vocab-sized exchanges), ONE broadcast join of the weight table onto
    the exploded corpus, one doc_id agg. The corpus crosses the wire as
    (doc_id, word) pairs exactly once; weights are vocabulary-sized and
    broadcastable at any corpus size (hash-bucket the vocab to cap it,
    as DSIR's 10^4-bucket hashing does)."""
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    words = docs.select(
        "doc_id",
        F.col(target_col).alias("_tgt"),
        F.explode(toks).alias("word"),
    ).filter(F.col("word") != "")
    weights = (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("raw_cnt"),
            F.sum((F.col("_tgt") == target_value).cast("bigint")).alias("tgt_cnt"),
        )
        .select(
            "word",
            F.expr(f"(tgt_cnt * {scale}L) div raw_cnt").alias("w"),
        )
    )
    return (
        words.join(F.broadcast(weights), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").cast("bigint").alias("dsir_score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dsir_score",
            F.expr("dsir_score div n_tokens").cast("bigint").alias("avg_weight"),
        )
    )


def token_length_histogram(
    docs: DataFrame,
    group_col: str = "lang",
    col: str = "text",
    bin_width: int = 16,
    max_bin: int = 512,
) -> DataFrame:
    """Per-group token-length histogram — the length-filter design input
    every corpus pipeline computes before choosing min/max-length cuts:
    (group, bucket_lo, n_docs, sum_tokens) where bucket_lo = the doc's
    token count floored to ``bin_width`` and capped at ``max_bin`` (one
    overflow bucket keeps state bounded regardless of the longest doc).

    Zero-joins: one projection computes the count row-locally, one
    map-side-combined groupBy over (group, bucket) — at most
    n_groups * (max_bin/bin_width + 1) cells of state at any scale."""
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    nt = F.size(F.filter(toks, lambda t: t != "")).cast("bigint")
    bucket = F.least(
        F.expr(f"(_nt div {bin_width}L) * {bin_width}L"), F.lit(max_bin).cast("bigint")
    )
    return (
        docs.select(F.col(group_col).alias("grp"), nt.alias("_nt"))
        .select("grp", bucket.alias("bucket_lo"), "_nt")
        .groupBy("grp", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("sum_tokens"),
        )
    )


def pmi_collocations(
    docs: DataFrame, col: str = "text", min_pair: int = 5, top_n: int = 100
) -> DataFrame:
    """Top-N adjacent-word collocations by fixed-point PMI — the phrase /
    multi-word-expression miner (Mikolov et al. 2013 phrase scoring,
    public algorithm): score1k = (pair_cnt * N_pairs * 1000) div
    (cnt_a * cnt_b), the integer-exact monotone twin of
    log p(ab)/(p(a)p(b)) — rank-identical to float PMI up to the fixed
    quantum, bit-identical across engines. ``min_pair`` drops
    singleton-pair noise (classic PMI failure mode: a 1-occurrence pair
    of two rare words maxes the score).

    Returns (a, b, pair_cnt, score1k) — the top_n by (score desc, a, b).

    Scale shape: bigram extraction is row-local (transform over the
    bound token array); the pair aggregate is map-side combined on the
    distinct-bigram key (vocabulary²-bounded, corpus-independent);
    unigram counts and the 1-row total join in BROADCAST; final top-N is
    orderBy+limit = TakeOrdered, never a global sort."""
    toks_expr = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    base = docs.select(F.array_remove(toks_expr, "").alias("_toks"))
    toks = F.col("_toks")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    pairs = base.select(
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
    pair_cnt = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_cnt"))
    uni = (
        pairs.select(F.col("a").alias("w"))
        .unionAll(pairs.select(F.col("b").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = pair_cnt.agg(F.sum("pair_cnt").alias("_n"))
    return (
        pair_cnt.filter(F.col("pair_cnt") >= min_pair)
        .join(F.broadcast(uni.selectExpr("w AS a", "cnt AS cnt_a")), "a")
        .join(F.broadcast(uni.selectExpr("w AS b", "cnt AS cnt_b")), "b")
        .join(F.broadcast(total))
        .select(
            "a",
            "b",
            "pair_cnt",
            F.expr("(pair_cnt * _n * 1000) div (cnt_a * cnt_b)")
            .cast("bigint")
            .alias("score1k"),
        )
        .orderBy(F.desc("score1k"), F.asc("a"), F.asc("b"))
        .limit(top_n)
    )


def rank_calibrated_quality(
    docs: DataFrame,
    score_col: str = "n_chars",
    group_col: str = "lang",
    keep_bps: int = 2000,
) -> DataFrame:
    """Per-group rank calibration of a quality score — the FineWeb-style
    fix for cross-domain score drift: a raw threshold keeps wildly
    different fractions of each language, so instead each doc gets its
    integer percent-rank IN-GROUP (pr_bps = (rank-1)*10000 div (n-1),
    rank() so ties share a rank deterministically) and the keep verdict
    compares pr_bps >= keep_bps — every group sheds the same bottom
    fraction. Counted, not dropped.

    Scale shape: one shuffle on the group key; the rank window runs
    per-group (AQE skew-split for a fat language); no joins."""
    from pyspark.sql import Window

    base = docs.select(
        "doc_id", F.col(group_col).alias("grp"), F.col(score_col).alias("score")
    )
    wg = Window.partitionBy("grp")
    r = F.rank().over(wg.orderBy(F.col("score").asc()))
    n = F.count(F.lit(1)).over(wg)
    return (
        base.withColumn("_r", (r - 1).cast("bigint"))
        .withColumn("_n1", (n - 1).cast("bigint"))
        .select(
            "doc_id",
            "grp",
            "score",
            F.expr("(_r * 10000) div greatest(_n1, 1L)").cast("bigint").alias("pr_bps"),
        )
        .withColumn("keep", (F.col("pr_bps") >= keep_bps).cast("int"))
    )


def nfc_normalize_docs(docs: DataFrame, col: str = "text") -> DataFrame:
    """Unicode NFC normalization audit — the canonicalization pass run
    before any exact/near dedup of multilingual text (a decomposed
    'é' (e + U+0301) and the precomposed U+00E9 are byte-different but
    the SAME text; skipping this step silently splits duplicates).
    Spark has no normalization builtin, so this is the documented
    Arrow-batched slow path: one `pandas_udf` applying stdlib
    `unicodedata.normalize("NFC", ...)` per batch — never per-row
    Python.

    Returns (doc_id, changed, n_before, n_after, norm_md5): whether NFC
    rewrote the doc, code-point lengths before/after, and the digest of
    the normalized form (the key a downstream exact-dedup would group
    on). Counted, not dropped.

    Scale shape: row-local — one Arrow round-trip per batch, no
    shuffle; length/digest/compare stay JVM-side codegen on the UDF
    output."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t or ""))

    raw = F.coalesce(F.col(col), F.lit(""))
    return (
        docs.select("doc_id", raw.alias("_raw"), _nfc(raw).alias("_nfc"))
        .select(
            "doc_id",
            (F.col("_raw") != F.col("_nfc")).cast("int").alias("changed"),
            F.length("_raw").cast("bigint").alias("n_before"),
            F.length("_nfc").cast("bigint").alias("n_after"),
            F.md5(F.col("_nfc").cast("binary")).alias("norm_md5"),
        )
    )


def spell_candidate_pairs(
    docs: DataFrame,
    col: str = "text",
    min_len: int = 4,
    min_cnt: int = 1,
) -> DataFrame:
    """SymSpell-style misspelling candidate pairs over the corpus
    vocabulary: block by 1-deletion neighborhoods, verify with exact
    Levenshtein — the short-string record-linkage pattern where
    shingle/LSH banding fails (a 4-char token has no useful shingles).
    Public algorithm: Garbe's SymSpell; distance-1 completeness holds
    because any substitution/insertion/deletion pair shares a deletion
    variant (a word is its own 0-deletion variant).

    Returns (w1, w2, cnt1, cnt2) with w1 < w2 and levenshtein(w1,w2)=1
    — typo-correction candidates ranked by the caller (typically
    cnt ratio).

    Scale shape: the corpus collapses to the distinct-word vocabulary
    first (map-side combined, vocabulary-bounded); variants multiply
    the VOCAB by ~(len+1), never the corpus; the blocking equi-join
    shuffles short variant strings with bucket sizes bounded by
    neighborhood density; Levenshtein runs on candidates only (JVM
    builtin), never all pairs."""
    toks_expr = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    vocab = (
        docs.select(F.explode(F.array_remove(toks_expr, "")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.length("w") >= min_len) & (F.col("cnt") >= min_cnt))
    )
    variants = vocab.select(
        "w",
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(0, length(w)), "
                "i -> if(i = 0, w, concat(substr(w, 1, i - 1), substr(w, i + 1))))"
            )
        ).alias("v"),
    ).distinct()
    left = variants.select(
        F.col("w").alias("w1"), F.col("cnt").alias("cnt1"), "v"
    )
    right = variants.select(
        F.col("w").alias("w2"), F.col("cnt").alias("cnt2"), "v"
    )
    return (
        left.join(right, "v")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2", "cnt1", "cnt2")
        .distinct()
        .filter(F.levenshtein("w1", "w2") == 1)
    )


def vocab_drift(
    base: DataFrame,
    cand: DataFrame,
    col: str = "text",
    min_cnt: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Token-distribution drift monitor between a baseline corpus and a
    candidate corpus — the data-drift gate a recurring training-data
    pipeline runs before admitting a new crawl/dump (vocabulary shift =
    upstream format change, spam influx, or language drift).

    Integer statistic per token (monotone twin of the rate-ratio test,
    same fixed-point discipline as pmi_collocations): with per-side
    totals N_b / N_c,

        drift_ppm = |cnt_c * N_b - cnt_b * N_c| * 1_000_000
                    // ((cnt_b + 1) * N_c)

    i.e. the relative deviation of the candidate rate from the baseline
    rate in parts-per-million, +1-smoothed so unseen-in-baseline tokens
    rank by their candidate mass instead of dividing by zero. Exact
    integers end-to-end — bit-identical across engines.

    Returns the top_n drifted tokens (token, cnt_base, cnt_cand,
    drift_ppm) among tokens with cnt_base + cnt_cand >= min_cnt,
    ordered (drift_ppm desc, token asc).

    Scale shape: each corpus collapses to its vocabulary count
    (map-side combined); the outer join runs on the vocabulary, never
    the corpus; totals join in BROADCAST (1 row each); final cut is
    TakeOrdered."""
    toks_expr = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(F.array_remove(toks_expr, "")).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias(name))
        )

    cb = counts(base, "cnt_base")
    cc = counts(cand, "cnt_cand")
    nb = cb.agg(F.sum("cnt_base").alias("_nb"))
    nc = cc.agg(F.sum("cnt_cand").alias("_nc"))
    joined = (
        cb.join(cc, "w", "full_outer")
        .select(
            "w",
            F.coalesce("cnt_base", F.lit(0)).alias("cnt_base"),
            F.coalesce("cnt_cand", F.lit(0)).alias("cnt_cand"),
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
    )
    drift = F.expr(
        "abs(cnt_cand * _nb - cnt_base * _nc) * 1000000L"
        " div ((cnt_base + 1) * _nc)"
    )
    return (
        joined.filter(F.col("cnt_base") + F.col("cnt_cand") >= min_cnt)
        .select(
            F.col("w").alias("token"),
            F.col("cnt_base").cast("bigint").alias("cnt_base"),
            F.col("cnt_cand").cast("bigint").alias("cnt_cand"),
            drift.cast("bigint").alias("drift_ppm"),
        )
        .orderBy(F.col("drift_ppm").desc(), F.col("token").asc())
        .limit(top_n)
    )


def lang_id_agreement(docs: DataFrame) -> DataFrame:
    """Evaluation matrix for the `lang_id` heuristic against the labeled
    `lang` column: one row per (lang, pred_lang) cell with count and the
    cell's share of its LABEL row in basis points — precision/recall
    read straight off the matrix. The eval-the-filter step every
    model-based curation stage needs (fastText-style lang filters are
    tuned exactly this way).

    Scale shape: the prediction is a row-local projection; one
    map-side-combined aggregate on the bounded (lang, pred) key; the
    label-total window runs over the bounded cell aggregate."""
    from pyspark.sql import Window

    pred = lang_id(docs)
    j = docs.select("doc_id", "lang").join(pred.select("doc_id", "pred_lang"), "doc_id")
    cells = j.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang")
    return cells.withColumn("_tot", F.sum("n").over(w)).select(
        "lang",
        "pred_lang",
        "n",
        F.expr("(n * 10000) div _tot").cast("bigint").alias("share_bp"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    col: str = "text",
    k: int = 4,
    window: int = 5,
    seed: int = 7,
    n_partitions: int | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm, public): hash every k-token gram,
    slide a `window`-wide frame over the hash sequence, and select each
    frame's minimum (rightmost on ties). The selection guarantees any
    shared run of k+window−1 tokens between two documents shares a
    fingerprint — the overlap detector `winnow_overlap_pairs` builds on.
    Documents with fewer than k+window−1 tokens yield no fingerprints
    (no full frame exists; the paper's guarantee needs one).

    Returns distinct (doc_id, pos, gh) — pos is the 1-based gram
    position, gh the portable 60-bit gram hash.

    Scale shape: grams and frame membership explode ROW-LOCALLY (factor
    k-gram × window on token count); the repartition on doc_id up front
    means the frame-min aggregate, the rightmost-tie join, and the
    dedup all reuse that one exchange (their keys all lead with
    doc_id), so the token blow-up never crosses the wire twice.
    ``n_partitions`` sizes that one exchange: the post-explode member
    set is ~window × tokens rows, so size partitions to volume
    (rows_in × tokens × window / ~5M per task) — the 512x rehearsal
    showed 32 partitions OOM a 24 GB JVM where 256 sail through."""
    from ..hashing import portable_hash

    if k < 1 or window < 1:
        raise ValueError(f"need k >= 1 and window >= 1, got {k}/{window}")
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    base = (
        docs.filter(F.col(col).isNotNull() & (F.length(F.trim(F.col(col))) > 0))
        .select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") >= k + window - 1)
    )
    base = (
        base.repartition(n_partitions, "doc_id")
        if n_partitions
        else base.repartition("doc_id")
    )
    grams = (
        base.select(
            "doc_id",
            (F.size("_t") - k + 1).alias("n_grams"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(_t) - {k} + 1),"
                    f" i -> concat_ws(' ', slice(_t, i, {k})))"
                )
            ).alias("_p0", "gram"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_p0") + 1).alias("pos"),
            portable_hash(F.col("gram"), seed).alias("gh"),
        )
    )
    members = grams.select(
        "doc_id",
        "pos",
        "gh",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("pos") - window + 1),
                F.least(F.col("pos"), F.col("n_grams") - window + 1),
            )
        ).alias("j"),
    )
    mins = members.groupBy("doc_id", "j").agg(F.min("gh").alias("m"))
    # mins is gram-cardinality (scales with volume): forbid the planner
    # from ever electing to broadcast it — post-aggregate size estimates
    # under-count and a runtime BroadcastExchange on it OOMs at scale
    # (observed at 512x input replication). Both sides already hash on
    # doc_id from the repartition above, so shuffle_hash adds no exchange.
    sel = (
        members.join(mins.hint("shuffle_hash"), ["doc_id", "j"])
        .filter(F.col("gh") == F.col("m"))
        .groupBy("doc_id", "j", "m")
        .agg(F.max("pos").alias("pos"))
    )
    return sel.select("doc_id", "pos", F.col("m").alias("gh")).distinct()


def winnow_summary(
    docs: DataFrame,
    col: str = "text",
    k: int = 4,
    window: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Per-document winnowing digest: fingerprint count plus an
    order-independent checksum (sum of gh mod 1000003 — bounded, no
    64-bit overflow) and the min/max hash. Pins the ENTIRE selection
    set cross-engine without shipping every fingerprint row.

    Returns (doc_id, n_fp, fp_checksum, min_gh, max_gh)."""
    fps = winnow_fingerprints(docs, col=col, k=k, window=window, seed=seed)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp"),
        F.sum(F.col("gh") % 1000003).cast("bigint").alias("fp_checksum"),
        F.min("gh").alias("min_gh"),
        F.max("gh").alias("max_gh"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    col: str = "text",
    k: int = 4,
    window: int = 5,
    seed: int = 7,
    min_shared: int = 2,
    max_bucket: int = 200,
) -> DataFrame:
    """Document pairs sharing >= min_shared distinct winnowed
    fingerprints — MOSS-style overlap detection. By the winnowing
    guarantee a shared token run of length >= k+window−1 surfaces at
    least one shared fingerprint, so real plagiarism-scale overlap
    clears min_shared easily while isolated hash collisions don't.

    Returns (doc_id_a, doc_id_b, n_shared), doc_id_a < doc_id_b.

    Scale shape: the pair join is bucketed by fingerprint hash — the
    same discipline as LSH banding: buckets hotter than `max_bucket`
    docs (boilerplate grams every doc shares) are dropped BEFORE the
    self-join, so the blow-up is sum over buckets of c², never N²."""
    fps = (
        winnow_fingerprints(docs, col=col, k=k, window=window, seed=seed)
        .select("doc_id", "gh")
        .distinct()
        # lazy checkpoint: the fingerprint table feeds the hot-bucket
        # count AND both sides of the pair join — without it the whole
        # gram-explode/frame-min subtree recomputes three times per
        # action (the digest table is the small end of the op: one row
        # per selected fingerprint, far below the member explosion it
        # derives from)
        .localCheckpoint(eager=False)
    )
    ok = (
        fps.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter((F.col("_c") >= 2) & (F.col("_c") <= max_bucket))
        .select("gh")
    )
    d = fps.join(ok, "gh", "semi")
    a = d.select(F.col("gh"), F.col("doc_id").alias("doc_id_a"))
    b = d.select(F.col("gh"), F.col("doc_id").alias("doc_id_b"))
    return (
        a.join(b, "gh")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def conv_winnow_overlap(
    turns: DataFrame, min_shared: int = 2, max_bucket: int = 200
) -> DataFrame:
    """Conversation-level MOSS overlap: assemble each conversation into
    its training document (corpus.conv_documents — byte-stable 'role:
    text' lines) and run the winnowed-fingerprint pair detector over
    the assembled docs. Catches conversations that share long verbatim
    passages WITHOUT being duplicates (quoted replies, copy-pasted
    stack traces) — the overlap class exact conv dedup by definition
    misses. Pure composition: assembly + winnowing, each already
    verified; the pair join keeps the hot-bucket cap.

    Returns (doc_id_a, doc_id_b, n_shared) with conv_id keys."""
    from .corpus import conv_documents

    docs = conv_documents(turns).select(
        F.col("conv_id").alias("doc_id"), F.col("doc").alias("text")
    )
    return winnow_overlap_pairs(
        docs, min_shared=min_shared, max_bucket=max_bucket
    )


def heaps_vocab_growth(
    docs: DataFrame, n_buckets: int = 20, col: str = "text"
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: sweep the corpus in doc_id
    order, split into `n_buckets` equal-width doc_id buckets, and report
    per bucket the cumulative token count vs the cumulative DISTINCT
    vocabulary — the standard diagnostic for "is more data still buying
    new vocabulary" when sizing a tokenizer or dedup budget (Heaps 1978,
    V(n) ~ K*n^beta). `newness_bp` (new types per 10k bucket tokens)
    falling toward 0 is the saturation signal.

    Returns (bucket, docs_n, bucket_tokens, new_vocab, cum_tokens,
    cum_vocab, newness_bp), all BIGINT, ordered by bucket.

    Scale shape: bucket token totals are a row-local `size(split(...))`
    projection + an n_buckets-row rollup (map-side combined, no body
    shuffle); first occurrences shuffle DISTINCT (token, min doc_id)
    pairs — the vocabulary, sublinear in corpus size, the same exchange
    class as BPE pair counting — and the cumulative window runs over the
    n_buckets-row aggregate only. The corpus text crosses the wire
    never."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    # equal-width doc_id buckets: W from the 1-row max aggregate
    # (broadcast, stays in-plan — no driver collect)
    # integral DIV (not a double round-trip): exact at any doc_id
    # magnitude, matching the oracle's integer `//`
    wdf = docs.agg(
        (F.expr(f"max(doc_id) DIV {int(n_buckets)}") + 1)
        .cast("bigint")
        .alias("_w")
    )
    base = docs.crossJoin(F.broadcast(wdf)).select(
        F.expr("doc_id DIV _w").cast("bigint").alias("bucket"),
        F.col("doc_id"),
        toks.alias("_toks"),
    )
    per_bucket = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_n"),
        F.sum(F.size("_toks")).cast("bigint").alias("bucket_tokens"),
    )
    # vocabulary first occurrences: distinct tokens per doc first (cuts
    # the exchange to per-doc types), min doc over the corpus, bucket of
    # that first doc
    firsts = (
        base.select("bucket", "doc_id", F.explode(F.array_distinct("_toks")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_vocab"))
    )
    from pyspark.sql import Window

    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(firsts, "bucket", "left")
        .select(
            "bucket",
            "docs_n",
            "bucket_tokens",
            F.coalesce("new_vocab", F.lit(0)).cast("bigint").alias("new_vocab"),
        )
        .withColumn("cum_tokens", F.sum("bucket_tokens").over(cum).cast("bigint"))
        .withColumn("cum_vocab", F.sum("new_vocab").over(cum).cast("bigint"))
        .withColumn(
            "newness_bp",
            F.when(
                F.col("bucket_tokens") > 0,
                F.expr("(new_vocab * 10000) div bucket_tokens"),
            ).cast("bigint"),
        )
        .orderBy("bucket")
    )


def char_entropy(
    docs: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-0 character entropy per document, in floor-quantized
    milli-nats — the compressibility quality proxy (CCNet/RedPajama-style
    pipelines drop the extreme tails: near-zero entropy is padding/
    repetition, abnormally high is encrypted/binary junk). H = ln(n) -
    (1/n)*sum(c*ln(c)) over the per-doc character histogram.

    Returns (id_col, n_chars_used, n_distinct_chars, entropy_mnat);
    entropy_mnat is NULL for empty/NULL text (nothing to measure),
    clamped at >= 0 so the ln(n) vs sum identity for single-symbol docs
    cannot float-round to -1.

    Scale shape: ENTIRELY row-local built-ins — sort the char array,
    derive run starts/lengths with higher-order functions, fold
    c*ln(c) in sorted order. Zero exchange, zero Python, whole-stage
    codegen; the one float op is ln() over small integer counts,
    floor-quantized to 1e-3 (same discipline as unigram_surprisal)."""
    t = F.coalesce(F.col(col), F.lit(""))
    expr = """
    CASE WHEN size(_cs) = 0 THEN
      named_struct('n', 0L, 'k', 0L, 'mnat', CAST(NULL AS BIGINT))
    ELSE
      named_struct(
        'n', CAST(size(_cs) AS BIGINT),
        'k', CAST(size(_starts) AS BIGINT),
        'mnat', CAST(floor(1000.0d * greatest(0.0d,
           ln(CAST(size(_cs) AS DOUBLE)) -
           aggregate(
             zip_with(
               _starts,
               concat(slice(_starts, 2, size(_starts) - 1),
                      array(size(_cs) + 1)),
               (a, b) -> b - a),
             CAST(0.0 AS DOUBLE),
             (acc, c) -> acc + CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
           / CAST(size(_cs) AS DOUBLE))) AS BIGINT))
    END
    """
    return (
        docs.select(
            F.col(id_col),
            F.array_sort(F.filter(F.split(t, ""), lambda c: c != "")).alias("_cs"),
        )
        .withColumn(
            "_starts",
            # sequence(1, 0) would count DOWN ([1, 0]) and element_at(_, 0)
            # throws, so empty docs short-circuit to an empty array
            F.expr(
                "CASE WHEN size(_cs) = 0 THEN array() "
                "ELSE filter(sequence(1, size(_cs)), "
                "i -> i = 1 OR element_at(_cs, i) != element_at(_cs, i - 1)) END"
            ),
        )
        .withColumn("_e", F.expr(expr))
        .select(
            id_col,
            F.col("_e.n").alias("n_chars_used"),
            F.col("_e.k").alias("n_distinct_chars"),
            F.col("_e.mnat").alias("entropy_mnat"),
        )
    )
