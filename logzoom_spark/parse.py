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
        # latency is the one typed field: same extraction as the others
        # (FIELD_PATTERNS is the single source for the regex/path — no
        # hand-duplicated pattern to drift), wrapped in try_cast so a
        # non-integral or overflowing value yields NULL, never an error
        lat_kv, lat_js = FIELD_PATTERNS["latency_ms"]
        lat_kv_sql = lat_kv.replace("\\", "\\\\")  # escape for the SQL literal
        lat_expr = F.expr(
            "try_cast(CASE WHEN text LIKE '{%' "
            f"THEN get_json_object(text, '{lat_js}') "
            f"ELSE nullif(regexp_extract(text, '{lat_kv_sql}', 1), '') "
            "END AS BIGINT)"
        )
        parsed = df.select(
            "*",
            cols["log_type"].alias("log_type"),
            cols["level"].alias("level"),
            lat_expr.alias("latency_ms"),
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
        # every k=v pair on KV lines kept as a map<string,string>.
        # Built from a deduplicated entries array (LAST occurrence of a
        # repeated key wins — an entry survives iff no later entry shares
        # its key) + one map_from_entries, rather than str_to_map, which
        # THROWS [DUPLICATED_MAP_KEY] under the default
        # mapKeyDedupPolicy=EXCEPTION — one hostile line with 'x=1 x=2'
        # must not abort a 100 TB job under the counted-not-dropped
        # policy. The msg strip anchors on start-of-line OR whitespace so
        # a leading msg="..." cannot leak quoted-text fragments into the
        # map. (Measured faster than a per-token map fold; tokens per
        # line are small, so the pairwise dedup scan is cheap.)
        parsed = parsed.withColumn(
            "_lz_entries",
            F.expr(r"""
                transform(
                  filter(
                    split(regexp_replace(text, '(^|\\s)msg="[^"]*"', ' '), '\\s+'),
                    t -> t rlike '^\\w+=.*$'),
                  t -> struct(substring_index(t, '=', 1) AS k,
                              substring(t, length(substring_index(t, '=', 1)) + 2) AS v))
            """),
        )
        kv_pairs = F.expr("""
            map_from_entries(filter(_lz_entries,
              (e, i) -> NOT exists(
                slice(_lz_entries, i + 2, size(_lz_entries) - i - 1),
                x -> x.k = e.k)))
        """)
        parsed = parsed.withColumn(
            "attrs",
            F.when(_is_json(F.col("text")) | ~F.col("parse_ok"), F.expr("map()")).otherwise(
                kv_pairs
            ),
        ).drop("_lz_entries")
    return parsed


# ---------------------------------------------------------------------------
# Arrow-vectorized grok path (no per-row Python: pandas .str ops per batch)
# ---------------------------------------------------------------------------

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

        def coerce_int64(lat: "pd.Series") -> "pd.Series":
            # mirror builtin try_cast-to-BIGINT: non-integral and
            # out-of-int64-range values become NULL — an Int64 astype on a
            # float like 1e23 raises 'cannot safely cast' and kills the
            # task otherwise. (2^63 as float is the one boundary value
            # excluded here that exact string parsing would accept.)
            ok = (lat.mod(1) == 0) & (lat >= -(2.0**63)) & (lat < 2.0**63)
            return lat.where(ok).astype("Int64")

        for pdf in it:
            text = pdf["text"].astype("string")
            is_json = text.str.startswith("{").fillna(False)
            # vectorized KV extraction: one C-level pass per field
            out = pdf.copy()
            out["log_type"] = text.str.extract(pat_log_type, expand=False)
            out["level"] = text.str.extract(pat_level, expand=False)
            out["latency_ms"] = coerce_int64(
                pd.to_numeric(text.str.extract(pat_latency, expand=False), errors="coerce")
            )
            out["msg"] = text.str.extract(pat_msg, expand=False)
            if is_json.any():
                # JSON rows are a small slice; parse them batch-wise.
                # _json_str renders non-string JSON scalars/containers the
                # way get_json_object does ('5', 'true', '{"a":1}') — a raw
                # int/bool assigned into a StringDtype column would raise
                # and kill the task, and str(True) would render 'True'.
                js = text[is_json].map(_safe_json_fields)
                out.loc[is_json, "log_type"] = js.map(lambda d: _json_str(d.get("log_type")))
                out.loc[is_json, "level"] = js.map(lambda d: _json_str(d.get("level")))
                lat = pd.to_numeric(
                    pd.Series([d.get("latency_ms") for d in js], index=js.index),
                    errors="coerce",
                )
                out.loc[is_json, "latency_ms"] = coerce_int64(lat)
                out.loc[is_json, "msg"] = js.map(lambda d: _json_str(d.get("message")))
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


def _json_str(v) -> str | None:
    """Render a decoded JSON value the way Spark's get_json_object renders
    it as a string: None stays null, strings pass through, everything else
    (numbers, booleans, nested containers) gets its compact JSON text."""
    import json

    if v is None or isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"))


def observe_parse_metrics(df: DataFrame, name: str = "parse") -> DataFrame:
    """Attach observable metrics: rows in, parse failures (counted, not
    silently dropped — contrast reference input/redis/redis.go:85-88)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_errors"),
    )
