"""Deterministic transcript (`turns`) table, derived from the driver's
`events` parquet.

The engine's authoritative input shape (BASELINE.json `input_hint`) is an
Iceberg table of multi-turn conversation/agent transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

This sandbox has no external transcript data, so we synthesize the table
*deterministically* from the driver-generated `events` parquet using a SQL
expression that parses identically in Spark SQL and DuckDB (only the string
type name differs). That gives the DuckDB correctness oracle byte-identical
input without shipping any data of our own.

The generated `text` column is log-line-shaped so the parse stage has real
work to do, mirroring the two frame types of the reference's lumberjack
parser (reference: input/filebeat/parser.go:118-145 KV frames,
parser.go:146-179 JSON frames):

- ~80% KV lines:   `seq=N level=INFO log_type=log_type1 latency_ms=1234 msg="evt-N"`
- ~10% JSON lines: `{"message":"evt-N","log_type":"log_type2",...}`
- hostile rows: garbled non-matching text with unicode/tab/newline, and
  empty strings (parse_ok=false path; mirrors the reference's silent drop of
  undecodable events, input/redis/redis.go:85-88 — we count instead of drop)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Dual-dialect SQL (Spark SQL + DuckDB). Placeholders:
#   {STR}    -> STRING (Spark) / VARCHAR (DuckDB)
#   {events} -> events relation name
#
# conv_id padding: lpad TRUNCATES strings longer than the pad width in both
# engines, which would collide user_id 1000000 with 100000 into one conv —
# the CASE keeps ids ≥ 7 digits verbatim (zero-pad is cosmetic only).
# ---------------------------------------------------------------------------

_LEVEL_EXPR = (
    "CASE WHEN event_type = 'error' THEN 'ERROR' "
    "WHEN value > 150 THEN 'WARN' ELSE 'INFO' END"
)

TURNS_SELECT_TEMPLATE = f"""
SELECT
  concat('conv-',
    CASE WHEN length(cast(user_id AS {{STR}})) > 6 THEN cast(user_id AS {{STR}})
         ELSE lpad(cast(user_id AS {{STR}}), 6, '0') END) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE event_type
    WHEN 'error' THEN 'system'
    WHEN 'view' THEN 'assistant'
    WHEN 'purchase' THEN 'tool'
    ELSE 'user'
  END AS role,
  CASE
    WHEN event_id % 29 = 11 THEN ''
    WHEN event_id % 29 = 3 THEN concat(
      '?? garbled ', cast(event_id AS {{STR}}),
      ' no kv here ✓ 日本語 café', chr(9), 'tab', chr(10), 'line2')
    WHEN event_id % 10 = 7 THEN concat(
      '{{{{"message":"evt-', cast(event_id AS {{STR}}),
      '","log_type":"log_type', cast(1 + event_id % 3 AS {{STR}}),
      '","level":"', {_LEVEL_EXPR},
      '","latency_ms":', cast(cast(floor(value * 10) AS BIGINT) AS {{STR}}), '}}}}')
    ELSE concat(
      'seq=', cast(event_id AS {{STR}}),
      ' level=', {_LEVEL_EXPR},
      ' log_type=log_type', cast(1 + event_id % 3 AS {{STR}}),
      ' latency_ms=', cast(cast(floor(value * 10) AS BIGINT) AS {{STR}}),
      ' msg="evt-', cast(event_id AS {{STR}}), '"')
  END AS text,
  CASE
    WHEN event_type = 'purchase' THEN
      CASE cast(event_id % 4 AS INT)
        WHEN 0 THEN 'bash' WHEN 1 THEN 'search' WHEN 2 THEN 'editor' ELSE 'browser' END
    WHEN event_type = 'error' AND event_id % 5 = 0 THEN 'metrics_probe'
    ELSE NULL
  END AS tool,
  ts
FROM {{events}}
"""


def turns_sql_spark(events_relation: str = "events") -> str:
    return TURNS_SELECT_TEMPLATE.format(STR="STRING", events=events_relation)


def turns_sql_duckdb(events_relation: str = "events") -> str:
    return TURNS_SELECT_TEMPLATE.format(STR="VARCHAR", events=events_relation)


def turns_cte_duckdb(events_relation: str = "events") -> str:
    """`WITH turns AS (...)` prefix for oracle SQL strings."""
    return f"WITH turns AS ({turns_sql_duckdb(events_relation)})"


def load_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcript fact table from `{sf_dir}/events.parquet`."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    view = "logzoom_events_src"
    events.createOrReplaceTempView(view)
    return spark.sql(turns_sql_spark(view))


# ---------------------------------------------------------------------------
# Enrich dimensions (broadcast-joined). Single source of truth: these Python
# lists build both the Spark DataFrames and the oracle VALUES clauses, so the
# two sides cannot drift. Reference analog: route metadata is config-level
# (server/server.go:56-81); the graft promotes it to small dimension tables.
# ---------------------------------------------------------------------------

ROLE_META_ROWS: list[tuple[str, str, str]] = [
    ("user", "human", "standard"),
    ("assistant", "model", "compute"),
    ("system", "infra", "free"),
    ("tool", "infra", "metered"),
]
ROLE_META_COLS = ["role", "role_kind", "billing_class"]

# 'metrics_probe' appears in turns.tool but is deliberately absent here —
# the left-join null-path coverage required by FIXTURES.md §3.
TOOL_META_ROWS: list[tuple[str, str, str]] = [
    ("bash", "shell", "high"),
    ("search", "web", "low"),
    ("editor", "edit", "low"),
    ("browser", "web", "high"),
]
TOOL_META_COLS = ["tool", "tool_family", "risk_level"]


def role_meta(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_META_ROWS, ROLE_META_COLS)


def tool_meta(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_META_ROWS, TOOL_META_COLS)


def _values_clause(rows: list[tuple[str, ...]], alias: str, cols: list[str]) -> str:
    vals = ", ".join("(" + ", ".join(f"'{v}'" for v in r) + ")" for r in rows)
    return f"(VALUES {vals}) AS {alias}({', '.join(cols)})"


def role_meta_values_duckdb() -> str:
    return _values_clause(ROLE_META_ROWS, "role_meta", ROLE_META_COLS)


def tool_meta_values_duckdb() -> str:
    return _values_clause(TOOL_META_ROWS, "tool_meta", TOOL_META_COLS)
