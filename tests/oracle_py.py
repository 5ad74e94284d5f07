"""Pure-Python reference implementation of parse → route → aggregate.

The oracle for the reference-quirk tests (SURVEY.md §5.2-2): a direct,
unoptimized transcription of LogZoom's per-event semantics
(route rules: output/s3/s3.go:300-308; parse: input/filebeat/parser.go;
ES quirk: output/elasticsearch/elasticsearch.go:146-153) that pytest
compares against the Spark implementation row-for-row.
"""

from __future__ import annotations

import json
import re
from collections import Counter

KV_PATTERNS = {
    "log_type": re.compile(r"log_type=(\w+)"),
    "level": re.compile(r"level=(\w+)"),
    "latency_ms": re.compile(r"latency_ms=(-?\d+)"),
    "msg": re.compile(r'msg="([^"]*)"'),
}


def parse_row(row: dict) -> dict:
    """Mirror of parse.parse_turns for one row (dict with text/conv_id...)."""
    text = row["text"]
    out = dict(row)
    if text.startswith("{"):
        try:
            d = json.loads(text)
        except ValueError:
            d = {}
        out["log_type"] = d.get("log_type")
        out["level"] = d.get("level")
        lat = d.get("latency_ms")
        out["latency_ms"] = int(lat) if lat is not None else None
        out["msg"] = d.get("message")
    else:
        for name, pat in KV_PATTERNS.items():
            m = pat.search(text)
            out[name] = m.group(1) if m else None
        if out["latency_ms"] is not None:
            out["latency_ms"] = int(out["latency_ms"])
    out["source"] = f"conv://{row['conv_id']}"
    out["parse_ok"] = out["log_type"] is not None and out["level"] is not None
    return out


def route_allows(parsed: dict, rules: dict[str, str], enforce: bool = True) -> bool:
    """s3.go:300-308 semantics: conjunctive equality, missing key rejects.
    enforce=False mirrors the ES/WS sinks that ignore rules."""
    if not enforce or not rules:
        return True
    for k, v in rules.items():
        val = parsed.get(k)
        if val is None or str(val) != v:
            return False
    return True


def window_counts(rows: list[dict], key: str, bucket_s: int = 300) -> Counter:
    import datetime as dt

    c: Counter = Counter()
    for r in rows:
        # turns.ts is timezone-naive UTC (session TZ pinned to UTC)
        epoch = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp())
        c[(r.get(key), epoch // bucket_s * bucket_s)] += 1
    return c
