"""Dual-dialect deterministic hashing.

``portable_hash`` produces the same positive 60-bit BIGINT in Spark and in
DuckDB, which is what lets hash-dependent operators (minhash, LSH banding,
simhash, sampling gates) be value-verified against an independent SQL
engine:

- Spark:  ``conv(substr(md5(s || '#seed'), 1, 15), 16, 10)::bigint``
- DuckDB: ``cast('0x' || substr(md5(s || '#seed'), 1, 15) AS BIGINT)``

15 hex digits = 60 bits < 2^63, so the cast never overflows or goes
negative. md5 is a JVM intrinsic in Spark (whole-stage codegen); the fast
non-portable alternative for production hot paths is ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash(col: Column, seed: int = 0) -> Column:
    """Spark side: deterministic seeded 60-bit BIGINT hash of a string."""
    seeded = F.concat(col, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("bigint")


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB side: SQL text computing the identical value for `expr`.

    The seed is appended with `||`, NOT concat(): DuckDB's concat() SKIPS
    NULL arguments while Spark's F.concat propagates them — with concat a
    NULL input hashed to a real bucket in the oracle while Spark produced
    NULL, silently diverging every NULL-bearing gate/sketch."""
    return (
        f"cast('0x' || substr(md5(({expr}) || '#{seed}'), 1, 15) AS BIGINT)"
    )
