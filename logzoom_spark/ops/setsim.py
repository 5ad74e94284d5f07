"""Exact set-similarity join via prefix filtering (PPJoin-lite).

The reference dedups at the whole-line level only (its filters are
equality rules, route/route.go:3-7); a training-data pipeline needs the
EXACT near-duplicate pair set at a tunable Jaccard threshold. MinHash/LSH
(`ops.dedup`) is the probabilistic path; this module is the exact one:
the prefix-filtering principle of PPJoin (Xiao, Wang, Lin, Yu, WWW 2008)
— under any global total order on tokens, two sets with overlap >= a
must each contain one of the other's first (|d| - a + 1) tokens, so
candidate pairs only need to collide on the short rare-token prefix,
never on the full posting lists.

Scale shape: one token-key exchange to attach document frequencies (the
global order is df-ascending, so the prefix holds each document's
RAREST tokens — the join fan-out per token is smallest exactly where
prefixes select), a candidate equi-join on prefix tokens with the
Jaccard length filter AND the paper's positional filter applied BEFORE
the distinct, and an array-intersect verify that touches only candidate
pairs. No all-pairs stage anywhere; the
expensive frequent tokens are excluded from every prefix by
construction. All arithmetic is integer basis points — bit-identical to
the DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tok_sets(docs: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, token) DISTINCT — whitespace words, lowercased, '' dropped.

    (Measured: a spread_input repartition here costs more than it buys —
    the split+explode is cheap and the distinct's exchange immediately
    re-spreads anyway.)"""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def _setsim_bitmask(
    toks: DataFrame, vocab_rows: list, threshold_bp: int
) -> DataFrame | None:
    """Small-universe exact set-similarity join (see `setsim_join`): the
    ≤ 63-token vocabulary maps each document's token set to one int64
    bitmask; identical masks group; the pair join runs over distinct
    (mask, sz) rows under a broadcast with exact bit_count arithmetic and
    expands to member pairs. Returns None when the distinct-mask head
    exceeds 65536 (the O(M²) mask join bound) — caller falls through to
    the prefix-filter plan."""
    spark = toks.sparkSession
    bits = {
        r["token"]: i
        for i, r in enumerate(
            sorted(vocab_rows, key=lambda r: (int(r["dfq"]), r["token"]))
        )
    }
    bit_df = spark.createDataFrame(
        [(t, b) for t, b in bits.items()], "token string, bit int"
    )
    dm = (
        toks.join(F.broadcast(bit_df), "token")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sz"),
            F.expr("bit_or(shiftleft(1L, bit))").alias("mask"),
        )
        # feeds the distinct-mask table AND both expansion joins
        .localCheckpoint(eager=False)
    )
    masks = dm.groupBy("mask", "sz").agg(F.count(F.lit(1)).alias("n"))
    mhead = masks.head(65537)
    if len(mhead) > 65536:
        return None
    mrows = spark.createDataFrame(mhead, "mask bigint, sz bigint, n bigint")
    a, b = mrows.alias("a"), mrows.alias("b")
    inter = F.expr("bit_count(a.mask & b.mask)").cast("bigint")
    t = int(threshold_bp)
    cross = (
        a.join(
            F.broadcast(b),
            F.col("a.mask") < F.col("b.mask"),
        )
        .select(
            F.col("a.mask").alias("mask_a"),
            F.col("b.mask").alias("mask_b"),
            inter.alias("inter_tokens"),
            (F.col("a.sz") + F.col("b.sz") - inter).alias("union_tokens"),
        )
        .filter(
            F.lit(10000) * F.col("inter_tokens")
            >= F.lit(t) * F.col("union_tokens")
        )
    )
    ma = dm.select(F.col("mask").alias("mask_a"), F.col("id").alias("_ia"))
    mb = dm.select(F.col("mask").alias("mask_b"), F.col("id").alias("_ib"))
    cross_pairs = (
        cross.join(ma, "mask_a")
        .join(mb, "mask_b")
        .select(
            F.least("_ia", "_ib").alias("doc_a"),
            F.greatest("_ia", "_ib").alias("doc_b"),
            "inter_tokens",
            "union_tokens",
        )
    )
    # identical sets: every member pair qualifies at any threshold ≤ 10000
    # (J = 1); sz doubles as popcount(mask) because tokens are distinct
    within = (
        dm.alias("x")
        .join(
            dm.alias("y"),
            (F.col("x.mask") == F.col("y.mask"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("doc_a"),
            F.col("y.id").alias("doc_b"),
            F.col("x.sz").alias("inter_tokens"),
            F.col("x.sz").alias("union_tokens"),
        )
    )
    return cross_pairs.unionByName(within).select(
        "doc_a",
        "doc_b",
        F.col("inter_tokens").cast("bigint").alias("inter_tokens"),
        F.col("union_tokens").cast("bigint").alias("union_tokens"),
        F.floor(
            F.lit(10000) * F.col("inter_tokens") / F.col("union_tokens")
        )
        .cast("bigint")
        .alias("jaccard_bp"),
    )


def setsim_join(
    docs: DataFrame,
    threshold_bp: int = 6000,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs of documents with word-set Jaccard >= threshold_bp/10000.

    Exact (not probabilistic): prefix filtering guarantees no pair is
    missed, the verify stage computes true intersection/union sizes, and
    the threshold test is integer cross-multiplication
    (10000*inter >= threshold_bp*union) — no float anywhere.

    Per document of set size s, the required overlap for any qualifying
    partner is a = ceil(t*s) (Jaccard >= t implies |x∩y| >= t*|x∪y| >=
    t*max(|x|,|y|)), so the prefix is the first s - a + 1 tokens in the
    global (df asc, token asc) order. Pairs must share a prefix token in
    BOTH directions; emitting from each side and letting the equi-join
    intersect gives the standard both-prefixes guarantee. The length
    filter 10000*min >= t*max prunes before dedup.

    Returns (doc_a, doc_b, inter_tokens, union_tokens, jaccard_bp) with
    doc_a < doc_b, jaccard_bp = floor(10000*inter/union).
    """
    if not 0 < threshold_bp <= 10000:
        raise ValueError(f"need 0 < threshold_bp <= 10000, got {threshold_bp}")
    toks = _tok_sets(docs, col, id_col)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("dfq"))
    # ---- vocabulary-bounded fast path -----------------------------------
    # Log corpora are template-dense: when the whole vocabulary fits one
    # int64 bitmask (≤ 63 tokens), prefix filtering degenerates (every
    # prefix collides on a handful of tokens — measured 22.4M candidate
    # rows for a 965k-pair answer at bench sf) while exact set algebra
    # becomes trivial: each document's token SET is a bitmask, identical
    # sets group together, and the join runs over DISTINCT masks with
    # codegen bit_count arithmetic (inter = popcount(a&b), union =
    # sz_a + sz_b − inter), then expands back to member pairs. The probe
    # is data-adaptive (vocabulary head, then a distinct-mask head capped
    # at 65536 so the O(M²) mask join stays bounded) and falls through to
    # the prefix-filter plan otherwise; the vocabulary aggregate is
    # lazily checkpointed so both paths reuse it. Identical output by
    # construction: Jaccard depends only on the two sets.
    dfreq = dfreq.localCheckpoint(eager=False)
    vhead = dfreq.head(64)
    if len(vhead) <= 63:
        out = _setsim_bitmask(toks, vhead, threshold_bp)
        if out is not None:
            return out
    # ONE tokenize pass: per-doc token array in the global (dfq asc, token
    # asc) order — rarest-first; (dfq, token) is total because token is
    # unique per document. Everything downstream (sizes, prefixes, verify)
    # derives from this table, so the old plan's five independent
    # tokenize+distinct subtrees (42 Exchanges) collapse to one whose
    # groupBy(id) exchange the verify joins then reuse outright.
    dt = (
        toks.join(dfreq, "token")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sz"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("dfq", "token"))),
                lambda s: s["token"],
            ).alias("arr"),
        )
        # lazy checkpoint: the table feeds both prefix sides AND both
        # verify joins; broadcast wrappers around those consumers defeat
        # Spark's exchange reuse, so without this the tokenize+collect
        # subtree executes four times per action (measured: ~2.8 s each at
        # bench sf). Lazy, so plan construction stays free; blocks are
        # released by the ContextCleaner when the plan is dropped.
        .localCheckpoint(eager=False)
    )
    # prefix length = sz - ceil(t*sz) + 1;  ceil(t*sz) = (t*sz + 9999) DIV
    # 10000 (integral DIV — exact at any magnitude, no double round-trip)
    pref = dt.select(
        "id",
        "sz",
        F.posexplode(
            F.expr(
                f"slice(arr, 1, cast(sz - (({threshold_bp} * sz + 9999) DIV 10000) + 1 as int))"
            )
        ).alias("pos0", "token"),
    ).select("token", "id", "sz", (F.col("pos0") + 1).alias("rnk"))
    a, b = pref.alias("a"), pref.alias("b")
    # PPJoin positional filter: the matched token sits at rank rnk_a/rnk_b
    # of the SAME global order in both docs, so common tokens before it
    # number <= least(rnk_a, rnk_b) and after it <= least(sz_a - rnk_a,
    # sz_b - rnk_b); a qualifying pair needs overlap >= minoverlap =
    # ceil(t*(sz_a+sz_b)/(10000+t)) (from 10000*inter >= t*(sz_a+sz_b-inter)),
    # and the bound holds for EVERY shared occurrence of a qualifying pair,
    # so the row-level filter can never drop one.
    eq = 10000 + threshold_bp
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            # Jaccard >= t forces 10000*min(sz) >= t*max(sz); with the
            # least/greatest form the filter is symmetric in a/b
            & (
                F.lit(10000) * F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.lit(threshold_bp) * F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            & F.expr(
                "least(a.rnk, b.rnk) + least(a.sz - a.rnk, b.sz - b.rnk) >= "
                f"({threshold_bp} * (a.sz + b.sz) + {eq - 1}) DIV {eq}"
            )
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
            F.col("a.rnk").alias("_ra"),
            F.col("b.rnk").alias("_rb"),
        )
        # dedup to one row per pair (the old .distinct()) and apply the
        # paper's EXACT positional bound at the pair's MINIMAL shared
        # prefix token (min (rnk_a, rnk_b) struct — the global order makes
        # both ranks minimal at the same token): any common token smaller
        # would itself be a shared prefix token, so common-before = 1
        # exactly and overlap <= 1 + min(sz_a - pa0, sz_b - pb0). Strictly
        # tighter than the row-level min(pa,pb) form, same shuffle as the
        # distinct it replaces, and provably lossless for qualifying pairs.
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.min(F.struct("_ra", "_rb")).alias("_m"))
        .filter(
            F.lit(1)
            + F.least(
                F.col("sz_a") - F.col("_m._ra"), F.col("sz_b") - F.col("_m._rb")
            )
            >= F.expr(
                f"({threshold_bp} * (sz_a + sz_b) + {eq - 1}) DIV {eq}"
            )
        )
        .drop("_m")
    )
    # verify on the ordered arrays: tokens are distinct per doc, so
    # |array_intersect| IS the exact intersection size — no pair×tokens
    # explode join, candidates only ever carry two bounded arrays
    inter = (
        cand.join(dt.select(F.col("id").alias("doc_a"), F.col("arr").alias("_aa")), "doc_a")
        .join(dt.select(F.col("id").alias("doc_b"), F.col("arr").alias("_ab")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "sz_a",
            "sz_b",
            F.size(F.array_intersect("_aa", "_ab")).cast("bigint").alias("inter_tokens"),
        )
    )
    return (
        inter.withColumn(
            "union_tokens", F.col("sz_a") + F.col("sz_b") - F.col("inter_tokens")
        )
        .filter(
            F.lit(10000) * F.col("inter_tokens")
            >= F.lit(threshold_bp) * F.col("union_tokens")
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_tokens",
            "union_tokens",
            F.floor(F.lit(10000) * F.col("inter_tokens") / F.col("union_tokens"))
            .cast("bigint")
            .alias("jaccard_bp"),
        )
    )
