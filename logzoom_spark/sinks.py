"""Sink writers shaped like the reference's five outputs.

Each sink is (a) a *projection* (pure DataFrame → DataFrame, oracle-testable)
and (b) a *writer* (the projection + a partitioned file write). External
services (real ES/S3/Redis/TCP/WS) are out of scope in this sandbox; the
writers produce the same bytes/layout the reference would ship:

- elasticsearch → JSON lines partitioned by daily index `index_day`
  (reference: index name `prefix-YYYY.MM.dd`, elasticsearch.go:80-86;
  doc body is the raw Text, :96). Rules are NOT enforced (quirk,
  elasticsearch.go:146-153).
- s3 → gzip JSON lines partitioned by `time_slice` (strftime key template,
  s3.go:115-129; default slice `%Y-%m-%d-%H%M` ~ example.s3-output.yml:25).
- redis → one directory per copy_queue, each holding the routed rows'
  raw `text` (duplication across queues, redis.go:196-198).
- tcp → lines `"<source> <text>"` (tcp.go:66).
- websocket → per-source filtered stream + the distinct-source TTL
  aggregate (websocket.go:74-82, :111-138); materialized as text files
  per source here.

At cluster scale each write is one job over the routed branch; file sizing
is governed by maxRecordsPerFile rather than the reference's 10 s wall-clock
roll (s3.go:293) — event-time slices give the same layout without
coordinating on wall clock.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SinkSpec:
    name: str
    kind: str  # es | s3 | redis | tcp | websocket
    options: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Projections (oracle-testable shapes)
# ---------------------------------------------------------------------------


def es_project(df: DataFrame) -> DataFrame:
    """Daily-index partition column + document payload (raw text)."""
    return df.select(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy.MM.dd").alias("index_day"),
        "conv_id",
        "turn_idx",
        "source",
        "text",
    )


def s3_project(df: DataFrame, slice_fmt: str = "yyyy-MM-dd-HH") -> DataFrame:
    """Time-slice partition column (s3.go:115 strftime template; ':'/'/'
    replaced by '-' for filesystem-safe partition values).

    Default slice is hourly: slice count scales with wall-clock span, not
    data volume, and minute-level slices over a month of synthetic data
    mean ~43k directories of tiny files — the classic small-file problem.
    The reference's minute template (example.s3-output.yml:25) is available
    via ``slice_fmt="yyyy-MM-dd-HHmm"``."""
    return df.select(
        F.date_format(F.col("ts").cast("timestamp"), slice_fmt).alias("time_slice"),
        "conv_id",
        "turn_idx",
        "source",
        "text",
    )


def redis_project(df: DataFrame, copy_queues: list[str]) -> DataFrame:
    """Duplicate every routed row into each copy queue (redis.go:196-198).
    Columnar form: cross-join with the tiny queue list (broadcast NLJ —
    no shuffle of the fact side)."""
    queues = df.sparkSession.createDataFrame([(q,) for q in copy_queues], ["queue"])
    return df.crossJoin(F.broadcast(queues)).select("queue", "conv_id", "turn_idx", "text")


def tcp_project(df: DataFrame) -> DataFrame:
    """`"<source> <text>"` line format (tcp.go:66)."""
    return df.select(
        F.concat_ws(" ", F.col("source"), F.col("text")).alias("line"),
        "conv_id",
        "turn_idx",
    )


def websocket_project(df: DataFrame, source: str | None = None) -> DataFrame:
    """Per-connection source filter (websocket.go:74-78): exact equality on
    the provenance column; no rule enforcement (quirk)."""
    out = df.select("source", "conv_id", "turn_idx", "text", "ts")
    if source is not None:
        out = out.filter(F.col("source") == F.lit(source))
    return out


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------


def write_es(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: int = 10000,
    tasks_per_day: int = 8,
    **_: object,
) -> None:
    """Cluster by (index_day, salt) before the partitioned write: a plain
    `repartition(index_day)` hashes ALL rows of one daily index into ONE
    shuffle partition — at 100 TB one day = one writer task, regardless of
    maxRecordsPerFile (which re-splits *files*, not *tasks*). The conv_id
    salt spreads each day across `tasks_per_day` parallel writers, the
    same layout `write_s3` uses via files_per_slice; maxRecordsPerFile
    (10k = the reference's bulk flush size, elasticsearch.go:25) then
    bounds each file to one bulk request."""
    parts = [F.col("index_day")]
    if tasks_per_day > 1:
        parts.append(F.pmod(F.xxhash64("conv_id"), F.lit(tasks_per_day)))
    (
        es_project(df)
        .repartition(*parts)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("index_day")
        .json(path)
    )


def write_s3(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    slice_fmt: str = "yyyy-MM-dd-HH",
    files_per_slice: int = 1,
    **_: object,
) -> None:
    """Cluster rows by time slice before the partitioned write: without the
    repartition, EVERY task opens a gzip writer for EVERY slice it sees
    (tasks × slices tiny files — measured 40× slower at 720 slices).
    With it, each output slice is written by `files_per_slice` tasks.
    Raise files_per_slice when one slice holds more data than one task
    should write (the 100 TB case)."""
    proj = s3_project(df, slice_fmt)
    parts = [F.col("time_slice")]
    if files_per_slice > 1:
        parts.append(F.pmod(F.xxhash64("conv_id"), F.lit(files_per_slice)))
    (
        proj.repartition(*parts)
        .write.mode(mode)
        .option("compression", "gzip")
        .partitionBy("time_slice")
        .json(path)
    )


def write_redis(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    copy_queues: list[str] | None = None,
    **_: object,
) -> None:
    # one partition dir per queue; payload = raw text (redis.go:189 uses
    # the event's Text verbatim)
    (
        redis_project(df, copy_queues or ["q1"])
        .withColumn("payload", F.col("text"))
        .select("queue", "payload")
        .write.mode(mode)
        .partitionBy("queue")
        .json(path)
    )


def write_tcp(df: DataFrame, path: str, mode: str = "overwrite", **_: object) -> None:
    tcp_project(df).select("line").write.mode(mode).text(path)


def write_websocket(df: DataFrame, path: str, mode: str = "overwrite", **_: object) -> None:
    # source rides as a JSON field, NOT a partition column: per-source dirs
    # would mean one directory per conversation (10^9+ at target scale)
    websocket_project(df).select("source", "text").write.mode(mode).json(path)


WRITERS = {
    "es": write_es,
    "s3": write_s3,
    "redis": write_redis,
    "tcp": write_tcp,
    "websocket": write_websocket,
}


# ---------------------------------------------------------------------------
# Schema DDL artifact — the ES index-template analog
# ---------------------------------------------------------------------------

#: per-kind Iceberg partition transforms, mirroring each sink's layout:
#: ES = daily index (elasticsearch.go:80-86), S3 = time slice (s3.go:115),
#: redis = one queue per partition (redis.go:196-198)
_PARTITION_SPECS: dict[str, list[str]] = {
    "es": ["days(ts)"],
    "s3": ["hours(ts)"],
    "redis": ["queue"],
    "tcp": [],
    "websocket": [],
}

_PROJECTIONS = {
    "es": lambda df, opts: es_project(df),
    "s3": lambda df, opts: s3_project(df, opts.get("slice_fmt", "yyyy-MM-dd-HH")),
    "redis": lambda df, opts: redis_project(df, opts.get("copy_queues", ["q1"])),
    "tcp": lambda df, opts: tcp_project(df),
    "websocket": lambda df, opts: websocket_project(df),
}


def sink_ddl(
    spec: SinkSpec, df: DataFrame, catalog_table: str | None = None
) -> str:
    """Emit the `CREATE TABLE` DDL for a sink's output schema — the analog
    of the reference's Elasticsearch index-template install
    (output/elasticsearch/index-template.go:3-99: it declares field types +
    layout before any data flows; here the DataFrame schema IS the source
    of truth and this renders it as an Iceberg table spec).

    The DDL is what a deployment against a real catalog would run once at
    pipeline start; in this sandbox it is a generated artifact (tested by
    round-trip in tests/test_pipeline.py). `ts` is injected for the
    time-partitioned kinds whose projection carries the event time only in
    derived form."""
    proj = _PROJECTIONS[spec.kind](df, spec.options)
    cols = dict(proj.dtypes)
    if spec.kind in ("es", "s3") and "ts" not in cols:
        # partition source column: days(ts)/hours(ts) need the raw event time
        cols["ts"] = "timestamp"
    table = catalog_table or f"logzoom.sinks.{spec.name}"
    col_lines = ",\n  ".join(f"{c} {t.upper()}" for c, t in cols.items())
    parts = _PARTITION_SPECS[spec.kind]
    partition_clause = (
        f"\nPARTITIONED BY ({', '.join(parts)})" if parts else ""
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {col_lines}\n)\n"
        f"USING iceberg{partition_clause}\n"
        f"TBLPROPERTIES ('write.format.default' = 'parquet')"
    )


def all_sink_ddls(sinks: dict[str, SinkSpec], df: DataFrame) -> dict[str, str]:
    """One DDL statement per configured sink (pipeline-start artifact)."""
    return {name: sink_ddl(spec, df) for name, spec in sinks.items()}
