"""Batch source readers: the turns table from any wire format.

The reference's inputs are network listeners (filebeat lumberjack TCP,
redis queue — input/filebeat/filebeat.go, input/redis/redis.go); in the
Spark rebuild the equivalent surface is "read the turns table from
whatever format the upstream shipper landed": parquet/Iceberg for the
normal path, JSON-lines or CSV for interop with text shippers. All
readers enforce the canonical schema (BASELINE input_hint) so every
downstream operator is format-agnostic, and malformed rows follow the
engine's counted-not-dropped policy (PERMISSIVE mode + corrupt-record
column where the format supports it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical transcript schema (BASELINE.json input_hint)
TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_CORRUPT = "_corrupt_record"


def _source_ok() -> F.Column:
    """Strictly `_corrupt_record IS NULL`: a partially-malformed row (bad
    turn_idx/ts but parseable conv_id) must still count as malformed under
    the counted-not-dropped policy. The tautological conv_id term only
    keeps a real column referenced — Spark rejects queries whose referenced
    columns are ONLY the corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Shared by the jsonl and csv
    readers so the workaround can never drift between formats."""
    return F.col(_CORRUPT).isNull() & (
        F.col("conv_id").isNotNull() | F.col("conv_id").isNull()
    )


def read_turns_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TURNS_SCHEMA).parquet(path)


def read_turns_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines turns. PERMISSIVE: malformed lines yield a row with all
    columns null and the raw line in `_corrupt_record` — surfaced via
    `parse_ok`-style accounting, not silently dropped (contrast
    input/redis/redis.go:85-88)."""
    df = (
        spark.read.schema(TURNS_SCHEMA + f", {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return df.withColumn("source_ok", _source_ok()).drop(_CORRUPT)


def read_turns_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    df = (
        spark.read.schema(TURNS_SCHEMA + f", {_CORRUPT} string")
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", False)
        .option("escape", '"')
        .csv(path)
    )
    return df.withColumn("source_ok", _source_ok()).drop(_CORRUPT)


READERS = {
    "parquet": read_turns_parquet,
    "jsonl": read_turns_jsonl,
    "csv": read_turns_csv,
}


def read_turns(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Format-dispatching turns reader (the input-registry analog of the
    reference's input.go:24-30 plugin map)."""
    if fmt not in READERS:
        raise ValueError(f"unknown turns format {fmt!r} (have {sorted(READERS)})")
    return READERS[fmt](spark, path)
