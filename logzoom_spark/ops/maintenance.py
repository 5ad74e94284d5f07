"""Lakehouse table-maintenance operators: MERGE-style upsert and a
small-file compaction planner — the operations an Iceberg-backed deployment
of this engine runs nightly (SURVEY §1.2 / iceberg.py carry the table DDL
and snapshot story; these are the data-motion halves).

Both are pure DataFrame plans:

- ``merge_upsert``: MERGE INTO semantics (update matches, insert the rest,
  keep everything else) as anti-join + union — ONE shuffle on the key, no
  window, no full-table rewrite of unmatched rows beyond the join probe.
  This is exactly the copy-on-write MERGE plan Iceberg's Spark extension
  generates, minus the snapshot commit the sandbox lacks.

- ``compaction_plan``: greedy cumulative-sum bin packing of file-sized
  units into target-sized output bins, per partition — the planner half of
  Iceberg's rewrite_data_files/binPack. Window cumsum per partition: the
  shuffle is on the partition key, each partition plans independently
  (embarrassingly parallel at 10^5 partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, key: str, validate: bool = False
) -> DataFrame:
    """MERGE INTO target USING updates ON key: matched rows take the update
    row wholesale, unmatched update rows insert, unmatched target rows
    persist. Schemas must agree by name.

    Contract (standard SQL MERGE semantics): ``updates`` must carry at
    most ONE row per key — real MERGE raises
    MERGE_CARDINALITY_VIOLATION on duplicates, while this lazy plan
    would silently emit both rows. Pass ``validate=True`` to enforce the
    contract eagerly (one extra aggregate job). NULL keys never match
    (NULL = NULL is not true), so a NULL-key update row always inserts
    alongside any NULL-key target row — exactly what MERGE ON t.k = s.k
    does."""
    if validate:
        dups = (
            updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dups:
            raise ValueError(
                f"updates has multiple rows for key {dups[0][0]!r} — MERGE "
                "semantics require at most one source row per key"
            )
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign each file-sized unit to an output bin per partition:
    bin = floor(running_bytes_before / target_bytes) over units ordered by
    (size desc, name) — deterministic, and large units land in their own
    bins first like binPack's offer ordering. Output adds `bin` (bigint).

    Approximation honesty: this is STREAMING cumulative binning, not
    first-fit-decreasing — a bin can overshoot up to (target_bytes +
    largest-file − 1) when a unit straddles a boundary (e.g. target 10
    with sizes [9,9,9] puts the first two in one 18-byte bin where FFD
    would split them). That is the right trade at planning scale: the
    plan is a single window pass with no per-bin state, and output files
    within ~2× target are exactly what Iceberg's binPack tolerates; use a
    smaller target when tighter bounds matter."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.desc(bytes_col), F.asc(file_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(bytes_col)).over(w) - F.col(bytes_col)
    return files.select(
        partition_col,
        file_col,
        F.col(bytes_col).cast("bigint").alias(bytes_col),
        F.floor(run / F.lit(target_bytes)).cast("bigint").alias("bin"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """CDC-style diff of two table snapshots: classify every key as
    added / removed / changed / unchanged — the incremental-pipeline
    primitive (what changed since the last curation run feeds the
    incremental dedup / index-maintenance paths, ops/dedup.py:412 and
    ops/similarity.py:336) and the replica-verification half of a
    cross-region copy.

    Payload equality is by md5 over a canonical 0x1F-joined rendering of
    ``payload_cols`` (NULL -> ''), projected on EACH SIDE BEFORE the
    join — the full-outer join and its exchange move (key, 32-byte
    digest) only, never row bodies, so the diff costs one
    co-partitioned digest shuffle regardless of payload width.

    Returns (``key_col``, status) for every key in either snapshot.
    """
    sep = "\x1f"

    def digest(df: DataFrame, name: str) -> DataFrame:
        rendered = F.concat_ws(
            sep,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in payload_cols
            ],
        )
        return df.select(F.col(key_col), F.md5(rendered).alias(name))

    o = digest(old, "_h_old")
    nw = digest(new, "_h_new")
    joined = o.join(nw, on=key_col, how="full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col(key_col), status.alias("status"))


def partition_checksums(
    df: DataFrame,
    cols: list[str] | None = None,
    n_buckets: int = 256,
    mod_prime: int = 1_000_003,
) -> DataFrame:
    """Order-independent per-bucket table checksums — the integrity
    primitive for verifying a 100 TB copy/migration without moving the
    data twice: run on both sides, diff the (bucket, ...) rows, and a
    mismatch localizes to 1/n_buckets of the table (re-run with a
    bucket predicate to bisect further). Merkle-style but with
    COMMUTATIVE aggregates, so no sort and no collect_list: every
    combinator is exact under any partitioning / arrival order.

    Row digest = portable 60-bit hash of the canonical 0x1F-joined row
    rendering (``cols`` sorted by name when omitted, NULL -> ''); bucket
    = digest mod n_buckets. Per bucket: row count, bit-XOR of digests,
    modular digest sum (mod ``mod_prime``; residues < 2^20 keep the
    intermediate BIGINT sum exact up to ~9e12 rows per bucket — size
    n_buckets so buckets stay under that), min and max digest.

    Returns (bucket, n_rows, xor_h, sum_mod, min_h, max_h).

    Scale shape: hashing is row-local codegen; the single exchange is a
    map-side-combined aggregate on a bounded n_buckets-ary key carrying
    five BIGINTs per partial — bytes shuffled are O(n_buckets x
    partitions), independent of table size.
    """
    from ..hashing import portable_hash

    use_cols = sorted(df.columns) if cols is None else list(cols)
    rendered = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in use_cols],
    )
    h = portable_hash(rendered)
    return (
        df.select(
            F.pmod(h, F.lit(n_buckets)).cast("bigint").alias("bucket"),
            h.alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(_h)").cast("bigint").alias("xor_h"),
            F.pmod(F.sum(F.pmod(F.col("_h"), F.lit(mod_prime))), F.lit(mod_prime))
            .cast("bigint")
            .alias("sum_mod"),
            F.min("_h").alias("min_h"),
            F.max("_h").alias("max_h"),
        )
    )


def erasure_plan(
    events: DataFrame, tombstones: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Right-to-erasure rewrite plan over a day-partitioned event store:
    for each day partition, how many rows a tombstoned-user purge
    touches and the rewrite amplification — rows that must be rewritten
    per row actually deleted (the copy-on-write cost a deletion-vector
    layout avoids; Delta/Iceberg DV docs are the public framing).

    `tombstones` is a 1-column (user_id) frame of erasure requests —
    small by nature, broadcast to flag rows without shuffling the facts.

    Returns (day, n_rows, n_del, del_share_bp, rewrite_amp_bp) —
    rewrite_amp_bp = floor(n_rows·10000/n_del), NULL for untouched
    partitions (nothing to rewrite).

    Scale shape: broadcast left-join flag + one map-side-combined rollup
    onto the bounded day key; the fact table never shuffles."""
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col(ts_col).cast("timestamp")))
        .cast("bigint")
    )
    tomb = tombstones.select(F.col("user_id").alias("_tomb_uid")).distinct()
    flagged = events.select(day.alias("day"), "user_id").join(
        F.broadcast(tomb), F.col("user_id") == F.col("_tomb_uid"), "left"
    )
    cells = flagged.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_tomb_uid").isNotNull().cast("int")).cast("bigint").alias(
            "n_del"
        ),
    )
    return cells.select(
        "day",
        "n_rows",
        "n_del",
        F.expr("(n_del * 10000) div n_rows").cast("bigint").alias("del_share_bp"),
        F.when(
            F.col("n_del") > 0,
            F.expr("(n_rows * 10000) div n_del"),
        )
        .cast("bigint")
        .alias("rewrite_amp_bp"),
    )


def rollup_merge(
    standing: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge a standing
    rollup with a new batch's rollup by RE-AGGREGATING the union of the
    two partial states — the associative-merge pattern (Delta/Iceberg
    MERGE-into-aggregate docs are the public framing), NOT a full-outer
    join (which goes quadratic in key fan-out and NULL-handles every
    measure by hand). Works for any associative measure (sum/count);
    min/max merge the same way via their own agg.

    Scale shape: both inputs are already aggregates (bounded by key
    cardinality, not data); one map-side-combined re-aggregation."""
    cols = list(keys) + list(measures)
    u = standing.select(*cols).unionByName(delta.select(*cols))
    return u.groupBy(*keys).agg(
        *[F.sum(m).cast("bigint").alias(m) for m in measures]
    )
