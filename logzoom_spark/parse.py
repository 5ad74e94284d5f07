"""Vectorized parse stage: raw `text` → typed columns.

Rebuilds the reference's two lumberjack frame decoders as one columnar
projection (reference: input/filebeat/parser.go:118-145 KV frames,
parser.go:146-179 JSON frames):

- KV lines  -> `regexp_extract` per known field (JVM-side, codegen'd)
- JSON lines -> `get_json_object` (rows starting with '{')
- undecodable rows -> `parse_ok=false`, never dropped silently (the
  reference silently drops bad JSON, input/redis/redis.go:85-88; we keep
  and count them via observe metrics instead)

Two engines with identical semantics:

- ``engine="builtin"`` (default): pure `pyspark.sql.functions` — stays
  inside whole-stage codegen, no Python in the hot path. This is the fast
  path at 100 TB.
- ``engine="pandas"``: a grok-style Arrow-vectorized parser
  (`mapInPandas` + pandas `.str.extract`) for patterns built-ins can't
  express (multi-pattern grok dictionaries). No per-row Python: one
  `Series.str.extract` call per Arrow batch.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

# Grok-style pattern dictionary: field -> (kv regex with 1 group, json path).
# The canonical route-rule key is `log_type`
# (reference: examples/example.filebeat-to-redis.yml:24,30).
FIELD_PATTERNS: dict[str, tuple[str, str]] = {
    "log_type": (r"log_type=(\w+)", "$.log_type"),
    "level": (r"level=(\w+)", "$.level"),
    "latency_ms": (r"latency_ms=(-?\d+)", "$.latency_ms"),
    "msg": (r'msg="([^"]*)"', "$.message"),
}

PARSED_FIELDS = ["log_type", "level", "latency_ms", "msg"]


def _is_json(col: Column) -> Column:
    return col.startswith("{")


def _extract_field(text: Column, kv_pattern: str, json_path: str) -> Column:
    kv = F.nullif(F.regexp_extract(text, kv_pattern, 1), F.lit(""))
    js = F.get_json_object(text, json_path)
    return F.when(_is_json(text), js).otherwise(kv)


def parse_turns(df: DataFrame, engine: str = "builtin", with_attrs: bool = True) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> parsed turns.

    Adds: log_type, level, latency_ms (bigint), msg, source, parse_ok
    (+ attrs map when ``with_attrs``). `text` passes through verbatim —
    the per-turn text-equality invariant.
    """
    if engine == "pandas":
        parsed = _parse_pandas(df)
    else:
        text = F.col("text")
        cols = {
            name: _extract_field(text, kv, js) for name, (kv, js) in FIELD_PATTERNS.items()
        }
        parsed = df.select(
            "*",
            cols["log_type"].alias("log_type"),
            cols["level"].alias("level"),
            F.expr(
                "try_cast(CASE WHEN text LIKE '{%' THEN get_json_object(text, '$.latency_ms') "
                "ELSE nullif(regexp_extract(text, 'latency_ms=(-?\\\\d+)', 1), '') END AS BIGINT)"
            ).alias("latency_ms"),
            cols["msg"].alias("msg"),
        )

    parsed = parsed.withColumns(
        {
            # provenance, mirrors Event.Source "lumberjack://<host><file>"
            # (reference: buffer/buffer.go:19, parser.go:134)
            "source": F.concat(F.lit("conv://"), F.col("conv_id")),
            "parse_ok": F.col("log_type").isNotNull() & F.col("level").isNotNull(),
        }
    )
    if with_attrs:
        # dynamic-field carry-over of Event.Fields (buffer/buffer.go:23):
        # every k=v pair on KV lines kept as a map<string,string>
        kv_pairs = F.expr(r"""
            map_filter(
              str_to_map(
                regexp_replace(text, ' msg="[^"]*"', ''), ' ', '='),
              (k, v) -> k rlike '^\\w+$' AND v IS NOT NULL)
        """)
        parsed = parsed.withColumn(
            "attrs",
            F.when(_is_json(F.col("text")) | ~F.col("parse_ok"), F.expr("map()")).otherwise(
                kv_pairs
            ),
        )
    return parsed


# ---------------------------------------------------------------------------
# Arrow-vectorized grok path (no per-row Python: pandas .str ops per batch)
# ---------------------------------------------------------------------------

_COMBINED_KV = re.compile(
    r"(?:^|\s)level=(?P<level>\w+)(?=\s|$)"
    r"|(?:^|\s)log_type=(?P<log_type>\w+)(?=\s|$)"
    r"|(?:^|\s)latency_ms=(?P<latency_ms>-?\d+)(?=\s|$)"
    r'|(?:^|\s)msg="(?P<msg>[^"]*)"'
)


def _parse_pandas(df: DataFrame) -> DataFrame:
    import pandas as pd  # noqa: F401  (executor-side import)

    base_cols = df.columns
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in df.dtypes)
        + ", log_type string, level string, latency_ms bigint, msg string"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # re.ASCII: the builtin engine is Java regex and the oracle is RE2,
        # both ASCII \w — Python's Unicode \w would silently diverge on
        # non-ASCII field values (e.g. 'level=ÉRROR')
        pat_log_type = re.compile(r"log_type=(\w+)", re.ASCII)
        pat_level = re.compile(r"level=(\w+)", re.ASCII)
        pat_latency = re.compile(r"latency_ms=(-?\d+)", re.ASCII)
        pat_msg = re.compile(r'msg="([^"]*)"', re.ASCII)

        for pdf in it:
            text = pdf["text"].astype("string")
            is_json = text.str.startswith("{").fillna(False)
            # vectorized KV extraction: one C-level pass per field
            out = pdf.copy()
            out["log_type"] = text.str.extract(pat_log_type, expand=False)
            out["level"] = text.str.extract(pat_level, expand=False)
            out["latency_ms"] = pd.to_numeric(
                text.str.extract(pat_latency, expand=False), errors="coerce"
            ).astype("Int64")
            out["msg"] = text.str.extract(pat_msg, expand=False)
            if is_json.any():
                # JSON rows are a small slice; parse them batch-wise
                js = text[is_json].map(_safe_json_fields)
                out.loc[is_json, "log_type"] = js.map(lambda d: d.get("log_type"))
                out.loc[is_json, "level"] = js.map(lambda d: d.get("level"))
                # to_numeric+integral-mask mirrors builtin try_cast-to-BIGINT
                # (a JSON latency of 12.5 must yield null, not crash the job)
                lat = pd.to_numeric(
                    pd.Series([d.get("latency_ms") for d in js], index=js.index),
                    errors="coerce",
                )
                out.loc[is_json, "latency_ms"] = lat.where(lat.mod(1) == 0).astype(
                    "Int64"
                )
                out.loc[is_json, "msg"] = js.map(lambda d: d.get("message"))
            yield out[list(pdf.columns) + PARSED_FIELDS]

    return df.mapInPandas(batches, schema=out_schema).select(
        *base_cols, *PARSED_FIELDS
    )


def _safe_json_fields(s: str) -> dict:
    import json

    try:
        d = json.loads(s)
        return d if isinstance(d, dict) else {}
    except (ValueError, TypeError):
        return {}


def observe_parse_metrics(df: DataFrame, name: str = "parse") -> DataFrame:
    """Attach observable metrics: rows in, parse failures (counted, not
    silently dropped — contrast reference input/redis/redis.go:85-88)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_errors"),
    )
