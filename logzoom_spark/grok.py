"""Grok pattern compiler: `%{PATTERN:field}` syntax → regex → Spark columns.

Gives the parse stage a logstash-style grok surface (the ecosystem the
reference lives in — LogZoom sits downstream of Filebeat and replaces
logstash, README.md:1-9) without any per-row Python:

    expr = compile_grok('level=%{WORD:level} latency_ms=%{INT:latency_ms}')
    df = apply_grok(df, 'level=%{WORD:level} latency_ms=%{INT:latency_ms}')

Two execution strategies, chosen by `apply_grok`:
- builtin: one `regexp_extract(text, full_pattern, group_i)` per field —
  JVM-side, whole-stage codegen. Uses the NUMBERED-group regex.
- pandas:  a single Arrow-vectorized `Series.str.extract` with named groups
  (one C regex pass for ALL fields) via mapInPandas. Uses the NAMED-group
  regex compiled with `re.ASCII` so `\\w`/`\\b` agree with Java regex (the
  builtin engine) and RE2 (the DuckDB oracle) — both ASCII by default.

Both regexes are emitted by ONE compile pass over the same token stream, so
field↔group alignment cannot drift (the previous post-hoc "rename bare '('"
rewrite mis-fired on escaped literal parens in the pattern text).

Library entries may reference other entries (`%{IPORHOST}` →
`%{IP}|%{HOSTNAME}`) and may carry their own captures — composites like
`%{COMMONAPACHELOG}` expand recursively and surface every subfield, exactly
like logstash. Literal text in the USER pattern is escaped (parentheses
etc. match literally); text inside library entries is raw regex.
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
# Invariant: entries contain NO bare capturing groups — only (?:...) — so
# group numbering is fully determined by %{NAME:field} tokens. Entries may
# reference other entries with %{NAME} / %{NAME:field}.
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?(?:\d+\.\d+|\d+)",
    "QUOTEDSTRING": r'"[^"]*"',
    "QS": r"%{QUOTEDSTRING}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    # both cases, like logstash's LOGLEVEL — httpd 2.4 writes lowercase
    # ([core:error]), syslog daemons write uppercase
    "LOGLEVEL": r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Aa]lert|ALERT|[Ff]atal|FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    # --- host / user / path --------------------------------------------------
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "HOSTNAME": r"(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "PATH": r"%{UNIXPATH}",
    # --- date / time ---------------------------------------------------------
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    # optional fractional part, like logstash — httpd 2.4 error timestamps
    # carry microseconds (11:55:44.569531)
    "SECOND": r"(?:[0-5][0-9](?:[:.,][0-9]+)?)",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    # --- composite log-line formats (carry their own captures) ---------------
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\]'
        r' "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?'
        r'|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "PROG": r"[\w._/%-]+",
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:syslog_timestamp} %{IPORHOST:syslog_host}"
        r" %{PROG:syslog_program}(?:\[%{INT:syslog_pid}\])?:"
    ),
    "SYSLOGLINE": r"%{SYSLOGBASE} %{GREEDYDATA:syslog_message}",
    # --- httpd (apache) composites, logstash modern names --------------------
    "POSINT": r"\b[1-9][0-9]*\b",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPD_COMMONLOG": r"%{COMMONAPACHELOG}",
    "HTTPD_COMBINEDLOG": r"%{COMBINEDAPACHELOG}",
    "HTTPD24_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[(?:%{WORD:module})?:?%{LOGLEVEL:loglevel}\]"
        r" \[pid %{POSINT:pid}(?::tid %{POSINT:tid})?\]"
        r"(?: \[client %{IPORHOST:clientip}:%{POSINT:clientport}\])?"
        r" %{GREEDYDATA:message}"
    ),
}

def load_pattern_file(path: str) -> dict[str, str]:
    """Parse a logstash-format pattern file: one ``NAME regex`` definition
    per line (first whitespace run separates name from pattern), ``#``
    comments and blank lines skipped — the patterns_dir file format every
    logstash deployment ships custom grok in. Returned dict feeds the
    ``extra_patterns`` argument of compile_grok/apply_grok; entries may
    reference each other and the built-in library."""
    patterns: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = re.split(r"\s+", line, maxsplit=1)
            if len(parts) != 2 or not re.fullmatch(r"\w+", parts[0]):
                raise ValueError(f"{path}:{lineno}: expected 'NAME pattern', got {line!r}")
            patterns[parts[0]] = parts[1]
    return patterns


def load_patterns_dir(dirpath: str) -> dict[str, str]:
    """Load every pattern file in a directory (sorted by name, later files
    winning name collisions) — the logstash ``patterns_dir`` analog."""
    import os

    merged: dict[str, str] = {}
    for name in sorted(os.listdir(dirpath)):
        full = os.path.join(dirpath, name)
        if os.path.isfile(full):
            merged.update(load_pattern_file(full))
    return merged


# grok type hints: %{INT:port:int}
_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

_TYPE_MAP = {"int": "bigint", "long": "bigint", "float": "double", "double": "double"}

_MAX_DEPTH = 16


@dataclass(frozen=True)
class CompiledGrok:
    regex: str  # numbered-group regex (JVM engine); group i+1 = fields[i]
    regex_named: str  # named-group regex (pandas engine), same traversal order
    fields: tuple[str, ...]  # field names in group order
    types: dict[str, str]  # field -> spark type (default string)


def compile_grok(pattern: str, extra_patterns: dict[str, str] | None = None) -> CompiledGrok:
    """Expand %{NAME:field[:type]} tokens (recursively through the library)
    into capture groups; literal text in the user pattern is escaped."""
    lib = dict(GROK_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)
    fields: list[str] = []
    types: dict[str, str] = {}

    def add_field(field: str, typ: str | None) -> None:
        if field in fields:
            raise ValueError(f"duplicate grok field {field!r}")
        fields.append(field)
        if typ:
            if typ not in _TYPE_MAP:
                raise ValueError(f"unknown grok type {typ!r} for field {field!r}")
            types[field] = _TYPE_MAP[typ]

    def expand(pat: str, escape_literals: bool, stack: tuple[str, ...]) -> tuple[str, str]:
        if len(stack) > _MAX_DEPTH:
            raise ValueError(f"grok expansion too deep (cycle?): {' -> '.join(stack)}")
        num: list[str] = []
        named: list[str] = []
        pos = 0
        for m in _GROK_TOKEN.finditer(pat):
            lit = pat[pos : m.start()]
            if escape_literals:
                lit = re.escape(lit)
            num.append(lit)
            named.append(lit)
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name not in lib:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if name in stack:
                raise ValueError(f"grok pattern cycle: {' -> '.join(stack + (name,))}")
            if field:
                # outer group opens before any subgroups inside the body,
                # so register the field before recursing
                add_field(field, typ)
            body = lib[name]
            if "%{" in body:
                sub_num, sub_named = expand(body, False, stack + (name,))
            else:
                sub_num = sub_named = body
            if field:
                num.append(f"({sub_num})")
                named.append(f"(?P<{field}>{sub_named})")
            else:
                num.append(f"(?:{sub_num})")
                named.append(f"(?:{sub_named})")
            pos = m.end()
        lit = pat[pos:]
        if escape_literals:
            lit = re.escape(lit)
        num.append(lit)
        named.append(lit)
        return "".join(num), "".join(named)

    regex, regex_named = expand(pattern, True, ())
    # invariant: every capture group in the numbered regex is one field
    n_groups = re.compile(regex).groups
    if n_groups != len(fields):
        raise AssertionError(
            f"grok compile drift: {n_groups} groups vs {len(fields)} fields "
            f"(a library entry contains a bare capturing group?)"
        )
    return CompiledGrok(
        regex=regex, regex_named=regex_named, fields=tuple(fields), types=types
    )


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
            # Column.try_cast keeps everything in the Column API — no
            # hand-escaped SQL string to break on exotic column names or
            # non-default parser escape settings
            c = c.try_cast(cg.types[f_name])
        cols.append(c.alias(f_name))
    return df.select("*", *cols)


def _apply_grok_pandas(df: DataFrame, cg: CompiledGrok, text_col: str) -> DataFrame:
    out_schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + ", " + ", ".join(
        f"{f} {cg.types.get(f, 'string')}" for f in cg.fields
    )
    named = cg.regex_named

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # re.ASCII: match Java-regex (builtin engine) / RE2 (oracle) \w, \b
        pat = re.compile(named, re.ASCII)
        for pdf in it:
            extracted = pdf[text_col].astype("string").str.extract(pat)
            for f_name in cg.fields:
                col = extracted[f_name]
                if cg.types.get(f_name) == "bigint":
                    col = pd.to_numeric(col, errors="coerce").astype("Int64")
                elif cg.types.get(f_name) == "double":
                    col = pd.to_numeric(col, errors="coerce").astype("float64")
                pdf[f_name] = col
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
