"""Route stage: per-sink conjunctive equality rules + sampling + fan-out.

Reference semantics re-expressed columnar (SURVEY.md §2.1 #6-#11):

- A route is {input, output, rules}; rules are ANDed string-equality
  predicates on event fields (reference: route/route.go:3-7, enforcement
  output/s3/s3.go:300-308, output/redis/redis.go:186-194,
  output/tcp/tcp.go:56-65).
- Missing rule key ⇒ row rejected (s3.go:303 `fields[key] == nil`); Spark's
  `col == lit` null semantics already give null→false, and a key that is no
  column at all resolves through the `attrs` map → null → rejected.
- Elasticsearch and WebSocket sinks NEVER enforce rules (the reference
  stores but ignores them, elasticsearch.go:134 vs :146-153;
  websocket.go:74-82 filters only by source) — modeled as
  ``enforce_rules=False``.
- Sampling happens twice — once at ingest (parser.go:142,176) and once per
  sink — and compounds. The reference's wall-clock-seeded Bernoulli
  (server/rand.go:8-11) is irreproducible by design; we provide three
  deterministic modes plus `rand()`. S3 uses `<=` where every other sink
  uses `<` (s3.go:308 vs tcp.go:65) — reproduced via ``bound``.
- Routing is FAN-OUT duplication, never partitioning: every sink evaluates
  its own predicate over the same cached upstream (buffer/buffer.go:62-68).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash


@dataclass(frozen=True)
class Route:
    """One input→sink binding (reference: server/server.go:56-81)."""

    name: str
    sink: str  # sink name this route feeds
    rules: dict[str, str] = field(default_factory=dict)
    sample_pct: float = 100.0  # per-sink sample (reference default 100)
    enforce_rules: bool = True  # False for ES/WS-shaped sinks
    sample_bound: str = "lt"  # "lt" everywhere except S3's "le" (s3.go:308)


def rule_predicate(df: DataFrame, rules: dict[str, str]) -> Column:
    """AND of string-equality rules; missing key ⇒ reject.

    A rule key that is a real column compares directly (cast to string —
    the reference would panic on non-string fields, s3.go:303; we compare
    lexically instead). A key with no column falls back to the dynamic
    `attrs` map when present, else a constant null ⇒ row rejected,
    matching `fields[key] == nil` semantics.
    """
    if not rules:
        return F.lit(True)

    def key_col(k: str) -> Column:
        if k in df.columns:
            return F.col(k).cast("string")
        if "attrs" in df.columns:
            return F.col("attrs").getItem(k)
        return F.lit(None).cast("string")

    return reduce(lambda a, b: a & b, (key_col(k) == F.lit(v) for k, v in rules.items()))


# ---------------------------------------------------------------------------
# Sampling gates
# ---------------------------------------------------------------------------


def gate_arith(pct: float, bound: str = "lt", seed: int = 0) -> Column:
    """Deterministic, cross-engine-reproducible gate used for oracle tests:
    portable md5 hash of the full lineage key (conv_id, turn_idx) mod 100 —
    shape-agnostic (no assumption about the conv_id format), uniform, and
    expressible identically in ANSI SQL (DuckDB oracle, hashing.py).
    Different `seed`s give independent gates so input+sink double-sampling
    genuinely compounds (SURVEY.md §2.1 quirk: sampling applied twice)."""
    key = F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string"))
    bucket = F.pmod(portable_hash(key, seed), F.lit(100))
    return bucket <= F.lit(pct) if bound == "le" else bucket < F.lit(pct)


def gate_hash(pct: float, seed: int = 42, bound: str = "lt") -> Column:
    """Production-deterministic gate: xxhash64 of the row key — uniform,
    seedable, stable across runs/cluster sizes (unlike rand())."""
    bucket = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed)), F.lit(10000))
    # round, not truncate: int(8.2 * 100) is 819 under binary floats,
    # silently shaving one of the 10000 buckets off the requested rate
    thresh = F.lit(int(round(pct * 100)))
    return bucket <= thresh if bound == "le" else bucket < thresh


def gate_rand(pct: float, seed: int = 42, bound: str = "lt") -> Column:
    """Bernoulli gate like the reference's RandInt(0,100) (server/rand.go:8-11),
    but seeded for reproducibility within a run."""
    r = F.rand(seed) * 100
    return r <= F.lit(pct) if bound == "le" else r < F.lit(pct)


#: fixed seed for the ingest-side gate (parser.go:142,176 analog)
INGEST_SEED = 1


def route_seed(name: str) -> int:
    """Stable per-route sampling seed. The reference draws an independent
    RandInt per sink per event (server/rand.go:8-11), so ingest sampling and
    every sink's sampling are mutually independent and stacked gates
    compound (50% ingest × 50% sink ≈ 25%). Deriving the seed from the
    route name keeps that independence while staying deterministic across
    runs and cluster sizes."""
    return zlib.crc32(name.encode("utf-8")) & 0x7FFFFFFF


def sample(
    df: DataFrame, pct: float, mode: str = "hash", bound: str = "lt", seed: int = 42
) -> DataFrame:
    if pct >= 100 and bound == "lt":
        return df  # default config: pass-through, no predicate at all
    if mode == "hash":
        return df.filter(gate_hash(pct, bound=bound, seed=seed))
    if mode == "rand":
        return df.filter(gate_rand(pct, bound=bound, seed=seed))
    return df.filter(gate_arith(pct, bound=bound, seed=seed))


def apply_route(df: DataFrame, route: Route, sample_mode: str = "hash") -> DataFrame:
    """rules filter (if enforced) + per-sink sample (independent seed per
    route, so sinks with pct<100 select independent subsets and stacking on
    the ingest gate compounds — reference parity, see route_seed)."""
    out = df
    if route.enforce_rules and route.rules:
        out = out.filter(rule_predicate(df, route.rules))
    if route.sample_pct < 100 or route.sample_bound == "le":
        out = sample(
            out,
            route.sample_pct,
            mode=sample_mode,
            bound=route.sample_bound,
            seed=route_seed(route.name),
        )
    return out


def fan_out(
    df: DataFrame, routes: list[Route], sample_mode: str = "hash"
) -> dict[str, DataFrame]:
    """One buffer, N subscribers (buffer/buffer.go:52-68): every route gets
    its own branch over the SAME upstream DataFrame. Caller is expected to
    `.persist()` the upstream so the scan+parse runs once.

    Duplicate sinks are rejected loudly: the dict is keyed by sink, so a
    second route bound to the same sink would silently shadow the first —
    the reference's own silent first-match bug (server.go:124-132) this
    engine validates away (config_from_dict checks the YAML path; this
    check covers programmatic Route lists)."""
    seen: set[str] = set()
    for r in routes:
        if r.sink in seen:
            raise ValueError(f"more than one route bound to sink {r.sink!r}")
        seen.add(r.sink)
    return {r.sink: apply_route(df, r, sample_mode) for r in routes}


# ---------------------------------------------------------------------------
# Skew handling (north rule: explicit conv_id-hash partitioning + salting)
# ---------------------------------------------------------------------------


def repartition_salted(df: DataFrame, num_partitions: int, salt: int = 8) -> DataFrame:
    """Hash-partition by (conv_id, salt(turn_idx)) so one hot conversation
    spreads over `salt` partitions instead of one straggler task. Safe for
    every downstream op here: aggregates re-shuffle on their own group keys,
    and per-turn ops are row-local."""
    return df.repartition(
        num_partitions,
        F.col("conv_id"),
        F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt)),
    )


def skew_key_stats(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 1_000_000,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-key diagnostic: top-N keys by row count with exact share
    (basis points) and the salt factor a salted repartition would need to
    keep every task under ``target_rows_per_task`` rows — the measurement
    step that sizes `repartition_salted`'s salt and decides when AQE
    skew-join thresholds need a manual override.

    Output: (key, cnt, share10k = cnt·10000 div total, salt_factor =
    ceil(cnt / target)). All integer arithmetic.

    Scale shape: one map-side-combined shuffle on the key (partial counts,
    never rows), a 1-row global total broadcast back over the bounded
    per-key counts, and a TakeOrdered(top_n) — no global sort, nothing
    driver-side. NULL keys count as a key of their own: at 100 TB the
    null bucket IS the classic skew key, so hiding it would defeat the
    diagnostic.

    Plan-visible cost: the count subtree feeds both the total and the
    top-N, so the source is scanned twice (both passes map-side-combine
    before their exchange; AQE reuses the exchange when shapes match).
    The deliberate alternative — attaching the total via a
    ``Window.partitionBy()`` — would funnel every distinct key through ONE
    task, which at 10^9 conversations is the exact straggler this
    diagnostic exists to prevent. For a quick look at extreme scale, run
    it over a hash-gated sample (``route.sample``) and scale
    ``target_rows_per_task`` by the sample rate."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    t = int(target_rows_per_task)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 10000L div _total").alias("share10k"),
            F.expr(f"(cnt + {t - 1}L) div {t}L").alias("salt_factor"),
        )
        # nulls LAST to match SQL's default ASC NULLS LAST: on a count tie
        # at the top_n boundary the two engines must cut the same row
        .orderBy(F.desc("cnt"), F.asc_nulls_last("key"))
        .limit(top_n)
    )


def route_config_diff(
    df: DataFrame, rules_a: dict[str, str], rules_b: dict[str, str]
) -> DataFrame:
    """Canary a routing-config change BEFORE deploying it (the reference
    applies config edits blind — config.go just reloads; at 100 TB a
    bad rule silently drops a day of data): evaluate the current (A)
    and proposed (B) rule sets side by side on the same pass and report
    the migration delta. One scan, two codegen'd predicates, a 1-row
    aggregate — no second job.

    Returns one row: (n_rows, n_match_a, n_match_b, n_only_a, n_only_b,
    n_both) — n_only_a is traffic the change would STOP routing,
    n_only_b is traffic it would START routing."""
    fa = rule_predicate(df, rules_a)
    fb = rule_predicate(df, rules_b)
    flagged = df.select(
        fa.cast("int").alias("_a"), fb.cast("int").alias("_b")
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_a").cast("bigint").alias("n_match_a"),
        F.sum("_b").cast("bigint").alias("n_match_b"),
        F.sum(F.expr("cast(_a = 1 AND _b = 0 AS INT)")).cast("bigint").alias(
            "n_only_a"
        ),
        F.sum(F.expr("cast(_a = 0 AND _b = 1 AS INT)")).cast("bigint").alias(
            "n_only_b"
        ),
        F.sum(F.expr("cast(_a = 1 AND _b = 1 AS INT)")).cast("bigint").alias(
            "n_both"
        ),
    )


def rate_limit_audit(
    events: DataFrame, limit: int = 3, window_s: int = 60
) -> DataFrame:
    """Fixed-window rate-limiter audit: replaying the stream through a
    per-user admission policy of `limit` events per `window_s`-second
    window (ordered by ts with event_id as the deterministic tiebreak),
    report per user what WOULD have been admitted vs rejected — the
    sizing evidence for an ingest throttle before it deploys, the same
    measure-first discipline as `route_config_diff`. max_in_window is
    the user's worst burst (max row_number across windows).

    Returns (user_id, n_events, n_admitted, n_rejected, n_windows,
    max_in_window).

    Scale shape: one window function partitioned by the natural
    (user_id, time-window) key — no global state; the rollup rides the
    same user_id exchange."""
    flags = rate_limit_verdicts(events, limit=limit, window_s=window_s)
    return flags.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("_rn") <= limit).cast("int")).cast("bigint").alias("n_admitted"),
        F.sum((F.col("_rn") > limit).cast("int")).cast("bigint").alias("n_rejected"),
        F.count_distinct("_win").cast("bigint").alias("n_windows"),
        F.max("_rn").cast("bigint").alias("max_in_window"),
    )


def rate_limit_verdicts(
    events: DataFrame, limit: int = 3, window_s: int = 60
) -> DataFrame:
    """Per-event admission verdicts for the fixed-window rate limiter:
    within each (user_id, window) the first `limit` events in
    (ts, event_id) order are admitted. The per-row substrate shared by
    `rate_limit_audit` (batch rollup) and the streaming twin's parity
    test. Returns (user_id, event_id, _win, _rn, admitted)."""
    if limit < 1 or window_s < 1:
        raise ValueError(f"need limit >= 1 and window_s >= 1, got {limit}/{window_s}")
    from pyspark.sql import Window as W

    base = events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            f"cast(unix_timestamp(cast(ts AS TIMESTAMP)) AS BIGINT) div {window_s}"
        ).alias("_win"),
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "_win").orderBy("ts", "event_id")
    )
    return base.select(
        "user_id",
        "event_id",
        "_win",
        rn.alias("_rn"),
        (rn <= limit).cast("int").alias("admitted"),
    )


def hrw_shard(key: Column, n_shards: int, seed: int = 0) -> Column:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar, IEEE/ACM ToN 1998): shard = argmax over s of
    hash(key '|' s). Row-local — an array of n_shards struct literals
    and an array_max, zero exchange, fully codegen'd; the property that
    makes it the right sharding for a mutable 100 TB layout is minimal
    movement: adding shard n moves ONLY the keys whose new max is the
    new shard (expected 1/(n+1) of them), never reshuffles the rest —
    unlike mod-n, which moves (n-1)/n of all keys.

    Ties on the 60-bit hash break to the SMALLER shard id (struct max
    over (h, -s)), matching the oracle's ORDER BY h DESC, shard ASC."""
    if n_shards < 1:
        raise ValueError(f"need n_shards >= 1, got {n_shards}")
    entries = [
        F.struct(
            portable_hash(F.concat(key.cast("string"), F.lit(f"|{s}")), seed).alias("h"),
            F.lit(-s).alias("ns"),
        )
        for s in range(n_shards)
    ]
    return (-F.array_max(F.array(*entries))["ns"]).cast("int")


def hrw_shard_counts(
    events: DataFrame, n_shards: int = 8, key_col: str = "user_id", seed: int = 0
) -> DataFrame:
    """Shard-occupancy report for rendezvous sharding over the distinct
    keys: (shard, n_keys, n_events). One groupBy on the key (the table's
    natural rollup), then a bounded n_shards-row aggregate — the shard
    expression itself never shuffles."""
    per_key = (
        events.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ev"))
        .withColumn("shard", hrw_shard(F.col("k"), n_shards, seed))
    )
    return per_key.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
    )


def hrw_reshard_audit(
    events: DataFrame, n_before: int = 8, key_col: str = "user_id", seed: int = 0
) -> DataFrame:
    """Measured minimal-movement audit: assign every distinct key at
    n_before and n_before+1 shards and report, per before-shard,
    (shard_before, n_keys, n_moved, n_moved_to_new). The HRW theorem
    says n_moved == n_moved_to_new on every row (a key either keeps its
    shard or moves to the NEW shard — the argmax over the old candidates
    is unchanged), so the pair of columns is a self-audit the pytest and
    the oracle both pin; total movement is ~ 1/(n_before+1)."""
    keys = (
        events.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("k"))
        .distinct()
    )
    both = keys.select(
        "k",
        hrw_shard(F.col("k"), n_before, seed).alias("shard_before"),
        hrw_shard(F.col("k"), n_before + 1, seed).alias("shard_after"),
    )
    return both.groupBy("shard_before").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum((F.col("shard_after") != F.col("shard_before")).cast("int"))
        .cast("bigint")
        .alias("n_moved"),
        F.sum((F.col("shard_after") == n_before).cast("int"))
        .cast("bigint")
        .alias("n_moved_to_new"),
    )
