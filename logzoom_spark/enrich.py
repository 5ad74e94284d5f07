"""Broadcast-lookup enrich stage.

The reference has no joins at all (SURVEY.md §2.2) — route metadata lives in
config (server/server.go:56-81). The graft promotes role/tool metadata to
small dimension tables joined with explicit `broadcast()` hints: the fact
table (10^12 turns at target scale) is never shuffled for the enrich step;
each executor gets a hash map of the dims.

Left joins: unknown keys yield nulls (FIXTURES.md §3 requires ≥1 tool value
absent from tool_meta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    turns: DataFrame,
    role_meta: DataFrame,
    tool_meta: DataFrame,
) -> DataFrame:
    return turns.join(F.broadcast(role_meta), on="role", how="left").join(
        F.broadcast(tool_meta), on="tool", how="left"
    )
