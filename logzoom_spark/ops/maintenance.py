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
