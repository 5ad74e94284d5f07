"""Deduplication operators over the `documents` table.

Exact dedup is a hash-groupBy (one shuffle on the fingerprint — at 100 TB
this is the canonical "shuffle on a high-cardinality key" job, and the
group key is a fixed-width digest rather than the document body, so shuffle
bytes stay tiny). Near-dup (MinHash/LSH, SimHash) builds on the same
shingle → hash → band primitives.

Hash primitives are pluggable (``hasher=``):

- ``"xx"``   — ``xxhash64``: the fast production default (one JVM intrinsic
  per shingle, no intermediate strings).
- ``"md5"``  — a *portable* hash: ``conv(substr(md5(s || '#' || seed),1,15),
  16,10)`` → the same positive 60-bit BIGINT in Spark and in DuckDB
  (``cast('0x' || substr(md5(...),1,15) AS BIGINT)``). This is what the
  oracle queries use, so the full minhash→band→pair pipeline is
  value-verified against an independent engine; a pytest asserts both
  hashers find the same planted near-duplicates.

Scale guards: ``lsh_candidate_pairs`` caps bucket width before the
self-join (a degenerate band shared by k docs would otherwise emit k²/2
pairs in one task — the "stop words of dedup"; true exact duplicates are
caught upstream by ``dedup_exact`` anyway, so dropping an over-wide LSH
bucket loses nothing but redundant candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import portable_hash

#: widest LSH bucket allowed into the candidate self-join (pairs per bucket
#: are then ≤ cap²/2 regardless of input skew)
DEFAULT_MAX_BUCKET = 200


def _hash_fn(hasher: str):
    if hasher == "md5":
        return portable_hash
    if hasher == "xx":
        return lambda col, seed=0: F.xxhash64(col, F.lit(seed))
    raise ValueError(f"unknown hasher {hasher!r} (expected 'xx' or 'md5')")


def fingerprint(col: str = "text") -> "F.Column":
    """Normalized content fingerprint: lower, collapse whitespace, md5.
    A rolling-hash-style doc fingerprint that is whitespace/case robust."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))
    return F.md5(normalized)


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per normalized fingerprint; report group size.

    groupBy on the digest — shuffles (digest, doc_id) pairs only. The full
    row is recovered by a later semi-join on surviving doc_ids when needed,
    keeping wide document bodies out of the shuffle."""
    return (
        docs.select(fingerprint().alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def dedup_exact_keep(docs: DataFrame) -> DataFrame:
    """The surviving rows themselves (semi-join back on winners)."""
    winners = dedup_exact(docs).select("doc_id")
    return docs.join(winners, "doc_id", "left_semi")


def paragraph_dedup(docs: DataFrame, col: str = "text") -> DataFrame:
    """C4-style corpus-wide paragraph dedup: split each doc on blank lines
    (``\\n\\n``), drop every paragraph whose exact bytes occur earlier in the
    corpus (keep the occurrence with min (doc_id, para_idx)), reassemble
    the doc from its surviving paragraphs. Returns
    (doc_id, text_md5, n_kept, n_removed) — text_md5 is the md5 of the
    reassembled text ('' when every paragraph was removed; the doc still
    appears: counted, not dropped).

    Shuffle discipline: paragraph BODIES never enter the dedup decision —
    the winner window shuffles (md5(para), doc_id, para_idx) digests only,
    and the surviving index sets come back as integer arrays. Bodies move
    at most once, in the doc_id equi-join that pairs each original row
    with its keep-set; reassembly then re-splits the text in place and
    picks the kept indices. At 100 TB that is one digest shuffle + one
    digest groupBy + one body join — never two passes of paragraph text.
    """
    text = F.coalesce(F.col(col), F.lit(""))
    ps = F.split(text, r"\n\n")
    paras = docs.select(
        "doc_id", F.posexplode(ps).alias("para_idx", "para")
    ).select("doc_id", "para_idx", F.md5("para").alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id", "para_idx")
    kept = paras.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    kept_sets = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("para_idx")).alias("keep_idx")
    )
    # materialize the paragraph array before the transform: element_at
    # over the raw split() expression inside the lambda would re-split
    # the whole doc once PER KEPT PARAGRAPH (the O(n²) HOF re-evaluation
    # trap); over a bound column it is an O(1) array read
    out = docs.select("doc_id", ps.alias("_ps")).join(
        kept_sets, "doc_id", "left"
    )
    pcol = F.col("_ps")
    keep_idx = F.coalesce(F.col("keep_idx"), F.expr("array()"))
    reassembled = F.concat_ws(
        "\n\n", F.transform(keep_idx, lambda i: F.element_at(pcol, i + 1))
    )
    return out.select(
        "doc_id",
        F.md5(reassembled).alias("text_md5"),
        F.size(keep_idx).cast("bigint").alias("n_kept"),
        (F.size(pcol) - F.size(keep_idx)).cast("bigint").alias("n_removed"),
    )


def dup_span_grams(
    docs: DataFrame, k: int = 8, col: str = "text", hasher: str = "md5"
) -> DataFrame:
    """Substring-level duplicate detection (the approximation of
    suffix-array training-data dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): fingerprint every
    k-token window of every document, count each fingerprint corpus-wide,
    and flag the positions whose window occurs ≥2 times anywhere in the
    corpus (including intra-doc repeats — the suffix-array criterion is
    total occurrence count, not distinct-doc count). Where doc-level
    (``dedup_exact``) and paragraph-level (``paragraph_dedup``) dedup
    miss boilerplate stitched into otherwise-unique pages, this measures
    exactly the spans a substring-level cut would remove.

    Returns one row PER INPUT DOC (counted, not dropped):
    (doc_id, n_grams, dup_positions, dup_bps) — n_grams = max(0, n_tokens
    − k + 1) sliding windows, dup_positions = windows whose fingerprint is
    corpus-duplicated, dup_bps = floor(10000·dup/total) (NULL when the doc
    is shorter than one window, n_grams = 0).

    Scale shape: gram strings die inside the per-row ``transform`` — only
    60-bit fingerprints are exploded, ONE hash pass feeds one digest-only
    exchange on gh, and the corpus-wide occurrence count is a window over
    that exchange (partitions are individual fingerprints, 1-2 rows each,
    hash-spread — no hot task). No self-join, no pair blowup: cost is
    linear in total token count.
    """
    h = _hash_fn(hasher)
    # token array materialized as a column BEFORE the per-position
    # transform: slice() over the raw split() expression inside the
    # lambda re-splits the whole doc at every gram position (O(n²·len)
    # per doc — the HOF re-evaluation trap); over a bound column each
    # slice is an O(k) array read and the pass is linear
    base = docs.select(
        "doc_id",
        F.split(
            F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+"
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    n_grams = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    # guard: F.sequence(1, 0) would yield a DESCENDING [1, 0], not empty
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    grams = F.transform(idx, lambda i: h(F.concat_ws(" ", F.slice(toks, i, k))))
    per_pos = base.select(
        "doc_id", F.explode_outer(grams).alias("gh")
    )  # explode_outer: short docs keep their row with gh = NULL
    # corpus-wide occurrence count as a window over gh, NOT a separate
    # groupBy + semi-join back: the explode re-hashes every gram, and two
    # consumers of per_pos would each re-run it (column pruning gives the
    # branches different projections, so the optimizer cannot reuse one
    # exchange) — the window keeps a SINGLE hash pass behind a single
    # digest-only exchange. Partitions here are individual fingerprints
    # (1-2 rows each, hash-spread), so no hot-task risk.
    w = Window.partitionBy("gh")
    flagged = (
        per_pos.filter(F.col("gh").isNotNull())
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt") >= 2)
    )
    dup = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_positions")
    )
    totals = base.select("doc_id", n_grams.cast("bigint").alias("n_grams"))
    return totals.join(dup, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("dup_positions", F.lit(0)).cast("bigint").alias("dup_positions"),
        F.expr(
            "CASE WHEN n_grams > 0 THEN (10000 * coalesce(dup_positions, 0))"
            " div n_grams END"
        ).cast("bigint").alias("dup_bps"),
    )


def remove_dup_spans(
    docs: DataFrame, k: int = 8, col: str = "text", hasher: str = "md5"
) -> DataFrame:
    """The ACTION step of substring-level dedup (`dup_span_grams` is the
    measurement): cut every token covered by a NON-CANONICAL duplicated
    k-window and rebuild each document from the survivors. The canonical
    occurrence of a window is the corpus-wide min (doc_id, position) —
    that one copy always survives, so shared boilerplate keeps exactly
    one home (the Lee et al. 2022 ExactSubstr contract: remove the
    duplicated substring from all but one occurrence).

    Returns (doc_id, text_md5, n_kept, n_removed) per input doc
    (counted, not dropped; text_md5 = md5 of the space-joined surviving
    tokens, '' when everything was cut). Lowercased tokens drive the
    MATCH (like dup_span_grams); original token bytes are what survive.

    Scale shape: the duplicate decision shuffles (gh, doc_id, pos)
    digests only — one hash pass, one digest exchange, a window on the
    same key (rn > 1 = non-canonical). Cut positions come back to each
    doc as one integer array through a doc_id groupBy+join; the rebuild
    is a row-local filter over token indices — O(tokens · cut_spans)
    per doc, linear when boilerplate is sparse. Bodies move once, in
    the keep-set join (the paragraph_dedup discipline)."""
    h = _hash_fn(hasher)
    base = docs.select(
        "doc_id",
        F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+").alias("_raw"),
    ).withColumn("_low", F.transform(F.col("_raw"), F.lower))
    toks = F.col("_low")
    n = F.size(toks)
    n_grams = F.greatest(n - (k - 1), F.lit(0))
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.struct(
        i.alias("pos"), h(F.concat_ws(" ", F.slice(toks, i, k))).alias("gh")
    ))
    per_pos = base.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh")
    )
    w = Window.partitionBy("gh").orderBy("doc_id", "pos")
    # rn > 1 already implies the window occurs >= 2 times corpus-wide
    dup_pos = (
        per_pos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("cuts"))
    )
    joined = base.join(dup_pos, "doc_id", "left")
    cuts = F.coalesce(F.col("cuts"), F.expr("array()").cast("array<int>"))
    raw = F.col("_raw")
    kept_idx = F.filter(
        F.sequence(F.lit(1), F.size(raw)),
        lambda j: F.size(
            F.filter(cuts, lambda p: (p <= j) & (j < p + F.lit(k)))
        ) == 0,
    )
    kept = F.transform(kept_idx, lambda j: F.element_at(raw, j))
    return joined.select(
        "doc_id",
        F.md5(F.concat_ws(" ", kept)).alias("text_md5"),
        F.size(kept_idx).cast("bigint").alias("n_kept"),
        (F.size(raw) - F.size(kept_idx)).cast("bigint").alias("n_removed"),
    )


def shingles(
    docs: DataFrame, n: int = 3, col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """word n-gram shingle set per doc (foundation for MinHash/Jaccard).
    Built-in only: split → sliding slices via transform over indices,
    with the token array materialized first (slice over the raw split()
    inside the lambda would re-split per position — the O(n²) HOF trap).
    ``keep``: extra columns carried through the projection unchanged."""
    base = docs.select(
        "doc_id", *keep,
        F.split(F.lower(F.trim(F.col(col))), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return base.select("doc_id", *keep, sh.alias("shingles"))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    hasher: str = "xx",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """MinHash signature per doc: for seed k, min over shingles of
    hash(shingle, k). One explode-free pass: array_min over a transform of
    the shingle array per seed — all JVM-side, whole-stage codegen."""
    h = _hash_fn(hasher)
    if hasher == "md5":
        # the portable-md5 shingle digests are the one genuinely
        # compute-bound projection in this family, and they ride the scan
        # stage: a single-file input runs the whole minhash on one core
        # (guide §2.5 input skew). Measured A/B at bench sf: md5 path
        # 5.2->2.4 s with the spread; the cheap xxhash path is faster
        # WITHOUT the extra exchange, so the spread is hasher-gated.
        from .util import spread_input

        docs = spread_input(docs)
    sh = shingles(docs, n=n, keep=keep)

    def seeded(k: int):
        # one-arg lambda: a two-arg lambda would make transform() pass the
        # array index as the second argument
        return lambda s: h(s, k)

    sig_cols = [
        F.array_min(F.transform(F.col("shingles"), seeded(k))).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return sh.select("doc_id", *keep, *sig_cols)


def band_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hasher: str = "xx",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """LSH band rows per doc: (doc_id[, keep...], band_id, band_hash) —
    `bands` rows per document, one zero-shuffle projection pipeline
    (shingle → minhash → band-hash → explode). The join currency for both
    full-corpus candidate pairs (``lsh_candidate_pairs``) and incremental
    dedup against a standing signature table (``dedup_incremental``)."""
    if bands < 1 or num_hashes % bands != 0:
        # leftover signature rows would be silently ignored (weakening the
        # requested signature), and bands > num_hashes would make empty
        # bands — every doc in ONE bucket per band, which the bucket cap
        # then drops wholesale: an empty result with no error
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes} exactly")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes=num_hashes, n=n, hasher=hasher, keep=keep)

    def band_hash(b: int) -> Column:
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hasher == "md5":
            # portable: md5 over the '|'-joined decimal strings (dual-dialect)
            return portable_hash(F.concat_ws("|", *[c.cast("string") for c in cols]))
        return F.xxhash64(*cols)

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), band_hash(b).alias("band_hash"))
            for b in range(bands)
        ]
    )
    return sigs.select(
        "doc_id", *keep, F.explode(band_structs).alias("band")
    ).select("doc_id", *keep, "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hasher: str = "xx",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Band the signature, bucket-join docs sharing a band hash → candidate
    near-dup pairs (doc_a < doc_b). The self-join shuffles only
    (band_id, band_hash, doc_id) triples.

    ``max_bucket_size`` bounds the worst case: buckets wider than the cap
    (boilerplate / empty docs sharing one signature) are dropped before the
    self-join, so no single key can produce O(k²) pairs — the dedup analog
    of stop-word removal. Exact duplicates inside such a bucket are still
    caught by ``dedup_exact``. Pass ``None`` to disable (small data only).
    """
    banded = band_signatures(docs, num_hashes=num_hashes, bands=bands, n=n, hasher=hasher)
    if max_bucket_size is not None:
        # window count over the SAME key the self-join shuffles on — the
        # exchange is shared, so the cap costs no extra shuffle. Over-wide
        # buckets never reach the join.
        w = Window.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("bw", F.count(F.lit(1)).over(w))
            .filter(F.col("bw") <= max_bucket_size)
            .drop("bw")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def build_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hasher: str = "xx",
) -> DataFrame:
    """The standing dedup-state table: (doc_id, fp, band_id, band_hash) —
    `bands` rows per doc, exact fingerprint + LSH band hashes together.
    One zero-shuffle projection over the corpus; persist it partitioned/
    bucketed by band_hash and maintain it with ops.maintenance.merge_upsert
    as batches arrive. Incremental dedup then never re-reads corpus text."""
    d = docs.select("doc_id", fingerprint().alias("fp"), "text")
    return band_signatures(
        d, num_hashes=num_hashes, bands=bands, n=n, hasher=hasher, keep=("fp",)
    )


def dedup_incremental(
    new_docs: DataFrame,
    standing: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hasher: str = "xx",
    bloom: DataFrame | None = None,
    bloom_m_bits: int = 4096,
    bloom_n_hashes: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Dedup TODAY'S batch against the standing signature table — the
    100 TB operating mode, where re-minhashing the whole corpus per batch
    (what ``dedup_exact``/``lsh_candidate_pairs`` do) is a non-starter.

    ``standing``: (doc_id, fp, band_id, band_hash) from ``build_signatures``
    — signatures only, corpus TEXT is never touched. Returns
    ``(verdicts, survivor_sigs)``:

    - verdicts: one row per new doc — (doc_id, is_exact_dup,
      n_bucket_hits, survives). is_exact_dup covers both a standing-fp
      match and an intra-batch dup (lowest batch doc_id wins);
      n_bucket_hits counts distinct standing docs sharing ≥1 LSH band
      (near-dup evidence); survives = neither.
    - survivor_sigs: the survivors' signature rows, shaped for
      ``ops.maintenance.merge_upsert`` into the standing table — the
      read-check-merge cycle that keeps state size O(corpus), work
      O(batch).

    Plan shape: the batch derives its signatures in one projection; the
    standing side contributes two digest equi-joins (fp; band) and is
    scanned signatures-only — with the standing table bucketed by its join
    key each probe touches ONLY the batch's buckets, and AQE handles a hot
    band. No join ever carries text, and nothing rescans the corpus.

    ``bloom``: optional standing bloom filter over the fp column (from
    `ops.sketch.bloom_build` with the same ``bloom_m_bits`` /
    ``bloom_n_hashes``, OR-maintained per batch via `bloom_merge`). When
    given, the batch's fps probe the ≤ m_bits/31-row BROADCAST sketch
    first, and only sketch-POSITIVES run the standing-fp equi-join;
    negatives are definitely-new (Bloom has false positives, never false
    negatives) and bypass the join entirely with ``_std = NULL`` — so
    verdicts are byte-identical to the ungated path (pytest-proven) while
    the expensive join's probe side shrinks to the positive sliver. This
    is the batch twin of `streaming.streaming_bloom_gate`'s protocol
    (VERDICT r4 #7)."""
    new_sigs = build_signatures(
        new_docs, num_hashes=num_hashes, bands=bands, n=n, hasher=hasher
    )
    new_fp = new_sigs.select("doc_id", "fp").distinct()
    w = Window.partitionBy("fp")
    std_fp = standing.select("fp").distinct().withColumn("_std", F.lit(1))
    base = new_fp.withColumn("min_batch_id", F.min("doc_id").over(w))
    if bloom is None:
        joined = base.join(std_fp, "fp", "left")
    else:
        from .sketch import bloom_probe

        verdict = bloom_probe(
            bloom,
            new_fp.select("fp").distinct(),
            "fp",
            m_bits=bloom_m_bits,
            n_hashes=bloom_n_hashes,
        )
        gated = base.join(verdict, "fp", "left")
        pos = gated.filter(F.col("maybe_present")).drop("maybe_present")
        neg = (
            gated.filter(~F.coalesce(F.col("maybe_present"), F.lit(False)))
            .drop("maybe_present")
            .withColumn("_std", F.lit(None).cast("int"))
        )
        joined = pos.join(std_fp, "fp", "left").unionByName(
            neg.select("fp", "doc_id", "min_batch_id", "_std")
        )
    flagged = joined.select(
        "doc_id",
        (
            F.col("_std").isNotNull() | (F.col("doc_id") > F.col("min_batch_id"))
        ).cast("int").alias("is_exact_dup"),
    )
    hits = (
        new_sigs.select("doc_id", "band_id", "band_hash")
        .join(
            standing.select(
                F.col("doc_id").alias("std_id"), "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("std_id").alias("n_bucket_hits"))
    )
    verdicts = (
        flagged.join(hits, "doc_id", "left")
        .withColumn(
            "n_bucket_hits", F.coalesce("n_bucket_hits", F.lit(0)).cast("bigint")
        )
        .withColumn(
            "survives",
            ((F.col("is_exact_dup") == 0) & (F.col("n_bucket_hits") == 0)).cast("int"),
        )
    )
    survivor_sigs = new_sigs.join(
        verdicts.filter(F.col("survives") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    return verdicts, survivor_sigs


def simhash(docs: DataFrame, bits: int = 64, hasher: str = "xx") -> DataFrame:
    """SimHash over distinct word tokens, single pass: ONE ``aggregate``
    traversal of the token array accumulates all ``bits`` signed counters
    via ``zip_with`` (the per-bit-traversal formulation is O(bits×tokens)
    passes; this is O(tokens) with a bits-wide accumulator row)."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in 1..64")
    if hasher == "md5" and bits > 60:
        # the portable hash is 15 hex digits = 60 bits; bits 60-63 would be
        # constant 0 and every token would vote -1 there, silently skewing
        # hamming distances vs the xxhash64 path
        raise ValueError("hasher='md5' yields 60-bit hashes; bits must be <= 60")
    if hasher == "md5":
        from .util import spread_input

        docs = spread_input(docs)  # bits×tokens md5 digests ride the scan
    h = _hash_fn(hasher)
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def contrib(t: Column) -> Column:
        hv = h(t)
        # call_function: the F.shiftright wrapper only takes a Python int
        # for numBits, but the SQL function accepts a column (the lambda's
        # bit index)
        return F.transform(
            bit_idx,
            lambda i: F.when(
                F.call_function("shiftright", hv, i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)).cast("long"),
        )

    counters = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(acc, contrib(t), lambda a, c: a + c),
    )
    # pack sign bits into one BIGINT (bit 63 is the sign bit)
    powers = F.array(
        *[F.lit(2**i if i < 63 else -(2**63)).cast("long") for i in range(bits)]
    )
    sig = F.aggregate(
        F.zip_with(counters, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    hasher: str = "xx",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (two-stage: cheap LSH cut,
    exact verify on survivors only — the scale path; brute-force all-pairs
    is O(N²) and never runs at 100 TB).

    Jaccard is reported as ``jaccard10k`` = floor(|∩|·10000 / |∪|) — exact
    integer division, identical in any engine and hashable by the driver.
    """
    cand = lsh_candidate_pairs(docs, n=n, hasher=hasher, max_bucket_size=max_bucket_size)
    sh = shingles(docs, n=n)
    j = (
        cand.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"),
            "doc_b",
        )
        .withColumn("jaccard10k", F.expr("(size(array_intersect(sh_a, sh_b)) * 10000L) div size(array_union(sh_a, sh_b))"))
    )
    # round before truncating: int(0.29 * 10000) is 2899 under binary
    # floats, silently admitting pairs one notch below the requested cutoff
    return j.filter(F.col("jaccard10k") >= int(round(threshold * 10000))).select(
        "doc_a", "doc_b", "jaccard10k"
    )


# ---------------------------------------------------------------------------
# Conversation-level dedup (the transcripts analog of document dedup)
# ---------------------------------------------------------------------------


def conv_fingerprints(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, conv_fp): one exact content fingerprint per
    conversation — md5 over the CONCATENATED PER-TURN md5s in stable
    (turn_idx) order (reference semantics: per-turn text byte equality
    under stable ordering, `SURVEY.md §2.1` quirk 7; the unit of dedup
    for transcript corpora is the conversation, not the turn).

    Per-turn hashing, not separator-joined text: each turn contributes
    exactly one fixed-width 32-hex block, so no byte sequence inside a
    turn can fake a turn boundary — a one-turn conversation whose text
    merely CONTAINS another conversation's joined serialization never
    collides with it. NULL-text turns drop out of the chain (concat_ws /
    string_agg both skip NULLs, engine-consistent).

    Scale shape: DIGEST-FIRST — each turn's text is reduced to its 32-hex
    md5 in a narrow projection BEFORE the conv_id groupBy, so the exchange
    and the per-conversation collect_list buffer carry (turn_idx, digest)
    structs (~36 B/turn) regardless of turn size; a pathological
    million-turn / megabyte-turn conversation costs 36 MB of state, not
    gigabytes. The conv_id shuffle is the table's native hash-partition
    key (north rule), so on a conv-bucketed layout the exchange disappears
    entirely; every conversation reduces to a single 32-byte digest row.
    Chain bytes are identical to hashing inside the aggregate: md5(NULL)
    is NULL and concat_ws skips NULLs either way."""
    digests = turns.select(
        "conv_id", "turn_idx", F.md5("text").alias("_t_md5")
    )
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "_t_md5")))
    return digests.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.concat_ws("", F.transform(ordered, lambda s: s["_t_md5"]))
        ).alias("conv_fp"),
    )


def conv_dedup(turns: DataFrame) -> DataFrame:
    """Exact conversation dedup: every conversation labeled with its
    fingerprint group's canonical (lowest) conv_id and an is_canonical
    verdict — counted, not dropped, like every verdict op here; the caller
    filters `is_canonical = 1` to materialize the deduped corpus.

    The canonicalization window partitions by conv_fp over DIGEST rows
    (one row per conversation, three narrow columns) — the same
    digest-only-shuffle discipline as `dedup_exact`. Duplicate groups are
    tiny (a handful of copies of a conversation), so no group-width cap is
    needed; the conv_fp exchange is the only second shuffle.
    """
    w = Window.partitionBy("conv_fp")
    return (
        conv_fingerprints(turns)
        .withColumn("canonical_conv", F.min("conv_id").over(w))
        .withColumn(
            "is_canonical",
            (F.col("conv_id") == F.col("canonical_conv")).cast("int"),
        )
        .select("conv_id", "conv_fp", "n_turns", "canonical_conv", "is_canonical")
    )


def edit_distance_verify(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    col: str = "text",
    hasher: str = "xx",
    max_len: int = 2000,
) -> DataFrame:
    """Exact edit-distance verification of near-dup CANDIDATE pairs — the
    precision stage after LSH recall: each (doc_a, doc_b) candidate gets
    its true Levenshtein distance over lowercased, whitespace-normalized
    text plus a similarity in bps (10000 * (1 - dist/longer_len)). The
    caller thresholds sim_bps; both verdicts stay in the row (counted,
    not dropped).

    ``pairs`` defaults to `lsh_candidate_pairs(docs)` — NEVER all pairs:
    Levenshtein is O(len_a * len_b) per pair, so the candidate set must
    already be banded/bucketed. Texts are truncated to ``max_len`` chars
    before the distance (bounds worst-case cell count per pair at scale;
    set it to your corpus P99).

    Scale shape: candidates carry ids only; each side's normalized text
    joins in by doc_id (two shuffles on the corpus' native key — or zero
    with a doc_id-bucketed layout), then the distance is a row-local
    JVM builtin (`levenshtein`), no Python."""
    if pairs is None:
        pairs = lsh_candidate_pairs(docs, hasher=hasher)
    norm = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(
                F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+", " "
            ),
            1,
            max_len,
        ).alias("_t"),
    )
    joined = (
        pairs.select("doc_a", "doc_b")
        .join(norm.select(F.col("doc_id").alias("doc_a"), F.col("_t").alias("ta")), "doc_a")
        .join(norm.select(F.col("doc_id").alias("doc_b"), F.col("_t").alias("tb")), "doc_b")
    )
    longer = F.greatest(F.length("ta"), F.length("tb")).cast("bigint")
    dist = F.levenshtein("ta", "tb").cast("bigint")
    return joined.select(
        "doc_a",
        "doc_b",
        dist.alias("edit_dist"),
        longer.alias("longer_len"),
    ).withColumn(
        "sim_bps",
        F.when(
            F.col("longer_len") > 0,
            F.expr("10000L - (10000L * edit_dist) div longer_len"),
        ).otherwise(F.lit(10000)).cast("bigint"),
    )


def window_dedup_first(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    granularity: str = "day",
) -> DataFrame:
    """Time-windowed dedup verdicts over an event log: within each
    (key..., calendar bucket) group, the earliest event (ts, then id — 
    deterministic under ties) is the canonical first occurrence; the rest
    are window-duplicates. The daily-dedup / first-seen primitive every
    log pipeline runs before billing or alerting. One row per input event
    (counted, not dropped): (id, key..., bucket, is_first).

    Scale shape: ONE shuffle on (key, bucket) — higher cardinality than
    the raw key, so daily windows also break up hot keys; per-group state
    is a row_number over the group only. With the log laid out
    time-partitioned, partition pruning makes any date range a
    bucket-local scan."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    w = Window.partitionBy(*key_cols, "bucket").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        events.select(id_col, *key_cols, bucket, ts_col)
        .withColumn("is_first", (F.row_number().over(w) == 1).cast("int"))
        .select(id_col, *key_cols, "bucket", "is_first")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    hasher: str = "xx",
    max_df: int = 50,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT — the subset-duplication detector
    symmetric Jaccard misses: a short doc fully embedded in a long one
    (quote farms, boilerplate wrappers, prompt-in-completion leakage)
    has containment |A∩B|/|A| = 1 while Jaccard |A∩B|/|A∪B| is tiny.
    Broder 1997 distinguishes resemblance vs containment.

    Candidate generation CANNOT reuse MinHash/LSH banding here: MinHash
    collision probability tracks JACCARD, so the very pairs containment
    exists to find (low-Jaccard subsets) are exactly the ones banding
    drops. Instead candidates come from a rare-shingle inverted index:
    two docs are candidates iff they share a shingle with document
    frequency in [2, max_df]. An embedded doc shares ALL its shingles
    with its host, so any of its rare shingles recalls the pair; the df
    cap bounds the per-shingle self-join at O(max_df²) and drops
    boilerplate shingles that would explode it (those pairs are
    boilerplate_lines' job, not containment's).

    Returns (doc_a, doc_b, cont_ab10k, cont_ba10k): floor(|∩|·10000 /
    |shingles(X)|) each direction, kept when EITHER meets ``threshold``.
    Integer-exact, engine-identical.

    Scale shape: the inverted index shuffles (gram-digest, doc_id)
    pairs — digest-only, never text; the df filter runs map-side
    combined; the bounded self-join emits ≤ C(max_df,2) pairs per rare
    shingle; exact set ops run on candidates only, never all pairs."""
    hf = _hash_fn(hasher)
    sh = shingles(docs, n=n)
    posts = sh.select(
        "doc_id", F.explode("shingles").alias("_g")
    ).select("doc_id", hf(F.col("_g")).alias("gh")).distinct()
    df_counts = posts.groupBy("gh").agg(F.count(F.lit(1)).alias("_df"))
    rare = df_counts.filter(
        (F.col("_df") >= 2) & (F.col("_df") <= max_df)
    ).select("gh")
    rposts = posts.join(rare, "gh")
    cand = (
        rposts.alias("x")
        .join(rposts.alias("y"), "gh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    j = (
        cand.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "shingles", "sh_a"
            ),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "shingles", "sh_b"
            ),
            "doc_b",
        )
        .withColumn(
            "cont_ab10k",
            F.expr(
                "(size(array_intersect(sh_a, sh_b)) * 10000L) div size(sh_a)"
            ),
        )
        .withColumn(
            "cont_ba10k",
            F.expr(
                "(size(array_intersect(sh_a, sh_b)) * 10000L) div size(sh_b)"
            ),
        )
    )
    cut = int(round(threshold * 10000))
    return j.filter(
        (F.col("cont_ab10k") >= cut) | (F.col("cont_ba10k") >= cut)
    ).select("doc_a", "doc_b", "cont_ab10k", "cont_ba10k")


def daily_dup_rate(turns: DataFrame) -> DataFrame:
    """Pipeline-health duplication curve: per observed day, row count,
    distinct normalized content fingerprints, and the duplication rate
    in floor basis points — the trend a dedup stage is sized (and
    alerted) on: a producer stuck in a retry loop shows up as a dup_bp
    spike long before storage bills do.

    Returns (day_no, n_rows, n_unique, dup_bp).

    Scale shape: the fingerprint is a row-local projection; one
    calendar-bounded aggregate carries (day, digest) — bodies never
    shuffle (same digest-only discipline as dedup_exact)."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint")
    base = turns.filter(F.col("text").isNotNull()).select(
        day.alias("day_no"), fingerprint("text").alias("_fp")
    )
    return (
        base.groupBy("day_no")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct("_fp").cast("bigint").alias("n_unique"),
        )
        .select(
            "day_no",
            "n_rows",
            "n_unique",
            F.expr("((n_rows - n_unique) * 10000) div n_rows")
            .cast("bigint")
            .alias("dup_bp"),
        )
    )
