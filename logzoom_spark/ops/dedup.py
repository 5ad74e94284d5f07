"""Deduplication operators over the `documents` table.

Exact dedup is a hash-groupBy (one shuffle on the fingerprint — at 100 TB
this is the canonical "shuffle on a high-cardinality key" job, and the
group key is a fixed-width digest rather than the document body, so shuffle
bytes stay tiny). Near-dup (MinHash/LSH, SimHash) builds on the same
shingle → hash → band primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def shingles(docs: DataFrame, n: int = 3, col: str = "text") -> DataFrame:
    """word n-gram shingle set per doc (foundation for MinHash/Jaccard).
    Built-in only: split → sliding slices via transform over indices."""
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return docs.select("doc_id", sh.alias("shingles"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3) -> DataFrame:
    """MinHash signature per doc: for seed k, min over shingles of
    xxhash64(shingle, k). One explode-free pass: aggregate over the shingle
    array with transform+array_min per seed — all JVM-side."""
    sh = shingles(docs, n=n)
    sig_cols = [
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(k)))
        ).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return sh.select("doc_id", *sig_cols)


def lsh_candidate_pairs(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """Band the signature, bucket-join docs sharing a band hash → candidate
    near-dup pairs (doc_a < doc_b). The self-join shuffles only
    (band_id, band_hash, doc_id) triples."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes=num_hashes, n=n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
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


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sign of the sum of token
    hash bits. Pure built-ins: explode-free via aggregate over the token
    array."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    bit_cols = []
    for i in range(bits):
        # +1 when token hash has bit i set, else -1; sum sign = simhash bit
        contrib = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(F.when(contrib > 0, F.lit(1).cast("long")).otherwise(0).alias(f"b{i}"))
    with_bits = docs.select("doc_id", *bit_cols)
    sig = None
    for i in range(bits):
        term = F.col(f"b{i}") * F.lit(2**i if i < 63 else -(2**63))
        sig = term if sig is None else sig + term
    return with_bits.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (two-stage: cheap LSH cut,
    exact verify on survivors only — the scale path; brute-force all-pairs
    is O(N²) and never runs at 100 TB)."""
    cand = lsh_candidate_pairs(docs, n=n)
    sh = shingles(docs, n=n)
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")
