"""logzoom_spark — a PySpark-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the capabilities of packetzoom/logzoom (a Go
log-shipping pipeline; see /root/reference) as an idiomatic Spark job:

- vectorized parse stage (built-in regexp/json functions; pandas-UDF grok
  path for patterns the built-ins can't express)
- broadcast-lookup enrich stage (role/tool dimension joins)
- route stage: per-sink conjunctive equality rules + deterministic sampling,
  fan-out duplication semantics (every routed sink sees its own copy)
- per-sink aggregates (counts by conv_id / role / tool / time bucket)
- sink writers shaped like the reference's elasticsearch / s3 / redis /
  tcp / websocket outputs (daily index dirs, gzip time slices, copy queues,
  line formatting)
- per-partition lineage manifest for resumable batch runs
- the same pipeline builder reused for Structured Streaming via foreachBatch

Everything is DataFrame/Catalyst-first; no RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
