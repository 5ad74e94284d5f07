"""Pipeline builder: config → per-sink DataFrame branches → batch run.

The reference's server startup (server/server.go:47-158) wires
inputs → buffers → routed outputs from YAML; here the same wiring builds a
lazy DataFrame DAG (SURVEY.md §3.1 mapping). "Start" = the write actions.

Fan-out economics: the parsed+enriched upstream is persisted once
(MEMORY_AND_DISK) so N sink branches share one scan+parse — the columnar
analog of the reference's pointer-broadcast pub/sub (buffer/buffer.go:62-68).
At cluster scale persist() holds only the columns the branches need
(Catalyst prunes before the cache), and every branch's rule filter is a
cheap predicate over the cached columnar batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from . import aggregate as agg
from . import sinks as sk
from . import transcripts as tr
from .enrich import enrich
from .parse import observe_parse_metrics, parse_turns
from .route import Route, fan_out


@dataclass
class PipelineConfig:
    routes: list[Route]
    sinks: dict[str, sk.SinkSpec]
    parse_engine: str = "builtin"  # "builtin" | "pandas" (grok path)
    sample_mode: str = "hash"
    ingest_sample_pct: float = 100.0  # input-side sample (parser.go:142,176)
    bucket_seconds: int = 300  # aggregate window size
    agg_keys: tuple[str, ...] = ("role", "tool", "conv_id")


def default_config() -> PipelineConfig:
    """Mirrors examples/example.filebeat-to-redis.yml:21-31 extended with
    the quirk routes from FIXTURES.md §5."""
    routes = [
        Route("route1", "sink_redis_a", {"log_type": "log_type1"}),
        Route("route2", "sink_redis_b", {"log_type": "log_type2"}),
        Route("route3", "sink_s3", {"log_type": "log_type1", "level": "ERROR"}, sample_bound="le"),
        # ES ignores rules even when configured (elasticsearch.go:146-153)
        Route("route4", "sink_es", {"log_type": "log_type1"}, enforce_rules=False),
        # missing rule key ⇒ 0 rows (s3.go:303 semantics)
        Route("route5", "sink_tcp", {"nonexistent_key": "x"}),
        Route("route6", "sink_ws", {}, enforce_rules=False),
    ]
    sinks = {
        "sink_redis_a": sk.SinkSpec("sink_redis_a", "redis", {"copy_queues": ["q1", "q2"]}),
        "sink_redis_b": sk.SinkSpec("sink_redis_b", "redis", {"copy_queues": ["q3", "q4"]}),
        "sink_s3": sk.SinkSpec("sink_s3", "s3", {}),
        "sink_es": sk.SinkSpec("sink_es", "es", {}),
        "sink_tcp": sk.SinkSpec("sink_tcp", "tcp", {}),
        "sink_ws": sk.SinkSpec("sink_ws", "websocket", {}),
    }
    return PipelineConfig(routes=routes, sinks=sinks)


def config_from_yaml(path: str) -> PipelineConfig:
    """Load a pipeline config from a YAML file (the reference's config
    surface, server/config.go:9-28). PyYAML is optional in this container."""
    try:
        import yaml
    except ImportError as ex:  # pragma: no cover
        raise RuntimeError("pyyaml not installed; use config_from_dict") from ex
    with open(path) as f:
        return config_from_dict(yaml.safe_load(f))


def config_from_dict(d: dict) -> PipelineConfig:
    """Build a config from a YAML-shaped dict (the reference's config.yml
    surface, server/config.go:9-28). Validates what the reference silently
    mishandles: duplicate sink names and >1 route per sink
    (server.go:124-132 binds only the first match)."""
    sink_types = {name: s.get("type") for name, s in d.get("sinks", {}).items()}

    def default_bound(sink: str) -> str:
        # the reference's S3 output samples with '<=' where every other
        # sink uses '<' (s3.go:308 vs tcp.go:65) — a YAML author gets the
        # quirk without having to know it exists
        return "le" if sink_types.get(sink) == "s3" else "lt"

    routes = [
        Route(
            name=r.get("name", f"route{i}"),
            sink=r["output"],
            rules=dict(r.get("rules", {})),
            sample_pct=float(r.get("sample_size", 100)),
            enforce_rules=bool(r.get("enforce_rules", True)),
            sample_bound=r.get("sample_bound", default_bound(r["output"])),
        )
        for i, r in enumerate(d.get("routes", []))
    ]
    seen: set[str] = set()
    for r in routes:
        if r.sink in seen:
            raise ValueError(f"more than one route bound to sink {r.sink!r}")
        seen.add(r.sink)
    sinks = {
        name: sk.SinkSpec(name, s["type"], {k: v for k, v in s.items() if k != "type"})
        for name, s in d.get("sinks", {}).items()
    }
    unknown = [r.sink for r in routes if r.sink not in sinks]
    if unknown:
        raise ValueError(f"routes reference unknown sinks: {unknown}")
    return PipelineConfig(routes=routes, sinks=sinks)


def build(
    spark: SparkSession, turns: DataFrame, cfg: PipelineConfig, persist: bool = True
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """turns → (parsed+enriched upstream, {sink_name: routed branch})."""
    parsed = parse_turns(turns, engine=cfg.parse_engine)
    if cfg.ingest_sample_pct < 100:
        from .route import INGEST_SEED, sample

        # fixed ingest seed, independent of every per-route seed — stacked
        # ingest+sink gates compound like the reference's per-event RandInt
        parsed = sample(
            parsed, cfg.ingest_sample_pct, mode=cfg.sample_mode, seed=INGEST_SEED
        )
    enriched = enrich(parsed, tr.role_meta(spark), tr.tool_meta(spark))
    enriched = observe_parse_metrics(enriched)
    if persist:
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
    branches = fan_out(enriched, cfg.routes, sample_mode=cfg.sample_mode)
    return enriched, branches


def drain_branch(
    branch: DataFrame,
    spec: sk.SinkSpec,
    cfg: PipelineConfig,
    out_dir: str,
    sink_name: str,
    suffix: str = "",
    write_mode: str = "overwrite",
) -> int:
    """Write one sink branch's event files + its per-key aggregate tables;
    returns the branch row count. Shared by `run_batch` and
    `lineage.run_resumable` (which appends a `/group=N` suffix) so the
    sink/aggregate layout cannot drift between the plain and resumable
    paths."""
    sk.WRITERS[spec.kind](
        branch, f"{out_dir}/{sink_name}{suffix}", mode=write_mode, **spec.options
    )
    # per-sink aggregate tables (counts by role/tool/conv + bucket) —
    # one GROUPING SETS shuffle for all keys, not one per key
    combined, aggs = agg.window_counts_multi(
        branch, list(cfg.agg_keys), cfg.bucket_seconds
    )
    try:
        for key, adf in aggs.items():
            adf.write.mode(write_mode).parquet(
                f"{out_dir}/aggregates/{sink_name}/by_{key}{suffix}"
            )
        return branch.count()
    finally:
        combined.unpersist()


def run_batch(
    spark: SparkSession,
    turns: DataFrame,
    cfg: PipelineConfig | None = None,
    out_dir: str | None = None,
    write_mode: str = "overwrite",
    concurrency: int = 6,
) -> dict[str, dict]:
    """Execute the full pipeline; returns {sink: {rows, aggregates...}}.

    When ``out_dir`` is set, every sink writes its event files under
    ``{out_dir}/{sink}/`` and its aggregate tables under
    ``{out_dir}/aggregates/{sink}/by_{key}`` (the same layout
    lineage.run_resumable uses). Sinks are driven by ``concurrency``
    submission threads — the batch equivalent of the reference's
    concurrently-draining per-sink goroutines (server/server.go:140-144).
    Concurrent jobs fill the task slots a sequential job's stage barrier
    would leave idle; correctness is unaffected (branches share only the
    immutable persisted upstream).
    """
    from concurrent.futures import ThreadPoolExecutor

    cfg = cfg or default_config()
    upstream, branches = build(spark, turns, cfg)

    def drain(item: tuple[str, DataFrame]) -> tuple[str, dict]:
        sink_name, branch = item
        if out_dir is not None:
            rows = drain_branch(
                branch, cfg.sinks[sink_name], cfg, out_dir, sink_name,
                write_mode=write_mode,
            )
        else:
            rows = branch.count()
        return sink_name, {"rows": rows}

    try:
        # NO materialization barrier before the fan-out: concurrent branch
        # jobs co-build the shared cache (BlockManager's per-block compute
        # lock means each cached partition is computed exactly once, later
        # touchers wait on the lock) — the first wave of tasks fills every
        # slot immediately instead of idling behind a serial count() pass
        if concurrency > 1:
            with ThreadPoolExecutor(max_workers=concurrency) as pool:
                results = dict(pool.map(drain, branches.items()))
        else:
            results = dict(map(drain, branches.items()))
    finally:
        upstream.unpersist()
    return results
