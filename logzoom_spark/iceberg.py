"""Iceberg table layer: DDL, snapshot pinning, and per-row file lineage.

SURVEY.md §1.2 maps the reference's durable queue + ack to an Iceberg
table + snapshot lineage. The Iceberg runtime jars are absent from this
container (documented sandbox delta, docs/SCALE.md), so this module is
split into:

- **Works on plain parquet today** (tested): `with_lineage_columns` — the
  `_file`/`_pos` provenance columns via Spark's file-source `_metadata`
  struct (no Iceberg needed); `read_table` — format-agnostic reader.
- **Iceberg-specific, exercised only when the catalog is configured**
  (import/config-gated, unit-tested at the SQL-text level):
  `create_table_ddl`, `pin_snapshot`, `read_snapshot`.

At 100 TB the lineage columns are what make per-group resume exact: a
group manifest that records (file, first_pos, last_pos) ranges can prove a
group complete without re-scanning it (lineage.py holds the group-level
manifest; these columns are the row-level refinement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default transcript table spec (SURVEY §1.2: bucket by conv hash so one
#: conversation's turns co-locate; hidden time partition for pruning)
TURNS_TABLE_DDL = """CREATE TABLE IF NOT EXISTS {table} (
  conv_id STRING,
  turn_idx INT,
  role STRING,
  text STRING,
  tool STRING,
  ts TIMESTAMP
)
USING iceberg
PARTITIONED BY (days(ts), bucket({buckets}, conv_id))
TBLPROPERTIES ('write.format.default' = 'parquet')"""


def create_table_ddl(table: str, buckets: int = 64) -> str:
    """The turns-table DDL a real deployment runs once (the analog of the
    reference's index-template install; see also sinks.sink_ddl)."""
    return TURNS_TABLE_DDL.format(table=table, buckets=buckets)


def with_lineage_columns(df: DataFrame) -> DataFrame:
    """Attach `_file` / `_pos` provenance to every row via the file-source
    `_metadata` hidden struct — works on plain parquet AND Iceberg scans
    (Spark populates file_path/row_index from the reader, no extra I/O).

    `df` must be a direct file-source scan (metadata struct is resolved
    against the relation; derived DataFrames that projected it away can't
    recover it)."""
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )


def read_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Format-agnostic source: Iceberg catalog table when the runtime is
    available and the name is catalog-qualified, else parquet path. No
    operator downstream cares which (the sandbox delta in one place)."""
    if "/" not in path_or_table:
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)


def pin_snapshot(spark: SparkSession, table: str) -> int:
    """Return the table's CURRENT snapshot id — recorded by a resumable run
    so every retry reads the same immutable snapshot (the lumberjack-ACK
    'window that was acked' analog). Iceberg-only.

    Reads `.history` filtered to the current ancestry line, NOT
    `max(committed_at)` over `.snapshots`: the snapshots metadata table
    lists every retained snapshot, including ones rolled back away or
    staged on other branches, whose commit time can exceed the live
    tip's — pinning one of those would read data the table no longer
    exposes."""
    row = spark.sql(
        f"SELECT snapshot_id FROM {table}.history "
        "WHERE is_current_ancestor ORDER BY made_current_at DESC LIMIT 1"
    ).first()
    if row is None:
        raise ValueError(f"table {table} has no snapshots")
    return int(row[0])


def read_snapshot(spark: SparkSession, table: str, snapshot_id: int) -> DataFrame:
    """Time-travel read pinned to a snapshot id (Iceberg-only)."""
    return spark.read.option("snapshot-id", str(snapshot_id)).table(table)
