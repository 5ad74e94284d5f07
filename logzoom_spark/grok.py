"""Grok pattern compiler: `%{PATTERN:field}` syntax → regex → Spark columns.

Gives the parse stage a logstash-style grok surface (the ecosystem the
reference lives in — LogZoom sits downstream of Filebeat and replaces
logstash, README.md:1-9) without any per-row Python:

    expr = compile_grok('level=%{WORD:level} latency_ms=%{INT:latency_ms}')
    df = apply_grok(df, 'level=%{WORD:level} latency_ms=%{INT:latency_ms}')

Two execution strategies, chosen by `apply_grok`:
- builtin: one `regexp_extract(text, full_pattern, group_i)` per field —
  JVM-side, whole-stage codegen.
- pandas:  a single Arrow-vectorized `Series.str.extract` with named groups
  (one C regex pass for ALL fields) via mapInPandas.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

# Core grok pattern library (public logstash pattern names/semantics).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?(?:\d+\.\d+|\d+)",
    "QUOTEDSTRING": r'"[^"]*"',
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE)",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
}

# grok type hints: %{INT:port:int}
_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

_TYPE_MAP = {"int": "bigint", "long": "bigint", "float": "double", "double": "double"}


@dataclass(frozen=True)
class CompiledGrok:
    regex: str  # full regex with one capture group per field
    fields: tuple[str, ...]  # field names in group order
    types: dict[str, str]  # field -> spark type (default string)


def compile_grok(pattern: str, extra_patterns: dict[str, str] | None = None) -> CompiledGrok:
    """Expand %{NAME:field[:type]} tokens into capture groups; everything
    between tokens is escaped literally."""
    lib = dict(GROK_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)
    out: list[str] = []
    fields: list[str] = []
    types: dict[str, str] = {}
    pos = 0
    for m in _GROK_TOKEN.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        name, field, typ = m.group(1), m.group(2), m.group(3)
        if name not in lib:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        if field:
            fields.append(field)
            out.append(f"({lib[name]})")
            if typ:
                if typ not in _TYPE_MAP:
                    raise ValueError(f"unknown grok type {typ!r} for field {field!r}")
                types[field] = _TYPE_MAP[typ]
        else:
            out.append(f"(?:{lib[name]})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return CompiledGrok(regex="".join(out), fields=tuple(fields), types=types)


def apply_grok(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    engine: str = "builtin",
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Add one column per grok field; non-matching rows get nulls."""
    cg = compile_grok(pattern, extra_patterns)
    if engine == "pandas":
        return _apply_grok_pandas(df, cg, text_col)
    cols = []
    for i, f_name in enumerate(cg.fields):
        c = F.nullif(F.regexp_extract(F.col(text_col), cg.regex, i + 1), F.lit(""))
        if f_name in cg.types:
            c = F.expr(f"try_cast({_extract_sql(text_col, cg.regex, i + 1)} AS {cg.types[f_name]})")
        cols.append(c.alias(f_name))
    return df.select("*", *cols)


def _extract_sql(text_col: str, regex: str, group: int) -> str:
    esc = regex.replace("\\", "\\\\").replace("'", "\\'")
    return f"nullif(regexp_extract({text_col}, '{esc}', {group}), '')"


def _apply_grok_pandas(df: DataFrame, cg: CompiledGrok, text_col: str) -> DataFrame:
    # single named-group regex: one vectorized extract for all fields
    idx = 0

    def _name_group(m: re.Match) -> str:
        nonlocal idx
        g = m.group(0)
        if g == "(" and idx < len(cg.fields):
            name = cg.fields[idx]
            idx += 1
            return f"(?P<{name}>"
        return g

    # only bare "(" that start capture groups (compile_grok emits "(?:" for
    # non-capturing) get names
    named = re.sub(r"\((?!\?)", _name_group, cg.regex)

    out_schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + ", " + ", ".join(
        f"{f} {cg.types.get(f, 'string')}" for f in cg.fields
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            extracted = pdf[text_col].astype("string").str.extract(named)
            for f_name in cg.fields:
                col = extracted[f_name]
                if cg.types.get(f_name) == "bigint":
                    col = pd.to_numeric(col, errors="coerce").astype("Int64")
                elif cg.types.get(f_name) == "double":
                    col = pd.to_numeric(col, errors="coerce").astype("float64")
                pdf[f_name] = col
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
