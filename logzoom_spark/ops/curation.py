"""End-to-end training-data curation: the composition every corpus build
runs, as one lazy DataFrame plan —

    quality filter → PII redaction → exact dedup → near-dup LSH →
    connected-components clustering → keep one canonical doc per cluster

Each stage is an operator from this package (`text`, `dedup`, `cluster`);
this module only wires them, so the whole pipeline inherits their scale
properties: zero Python in any hot path, digest-only dedup shuffles, the
LSH bucket cap, and log-round component convergence. The composed result
is value-verified against a single DuckDB SQL oracle that re-derives the
same pipeline independently (oracles.py: curation_pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from .cluster import dedup_cluster_assign
from .text import gopher_quality_filter, redact_pii


def curate(docs: DataFrame, hasher: str = "xx", max_iter: int = 25) -> DataFrame:
    """Returns the curated corpus: (doc_id, text, n_redacted) — quality
    survivors, PII-scrubbed, exact-deduped, one canonical doc per near-dup
    cluster. Row order of stages matters and is part of the contract:
    redaction happens BEFORE dedup so two docs differing only in redacted
    spans collapse together."""
    keep = gopher_quality_filter(docs).filter(F.col("keep") == 1).select("doc_id")
    kept = docs.join(keep, "doc_id", "left_semi")
    red = redact_pii(kept)
    clean = red.select("doc_id", F.col("clean_text").alias("text"), "n_redacted")
    # exact dedup on the scrubbed text (min doc_id survives)
    winners = dedup.dedup_exact(clean).select("doc_id")
    # lazy checkpoint: the deduped corpus feeds the LSH pair source, the
    # CC node list AND the final canonical join — without it the
    # quality→redact→dedup subtree recomputes once per consumer (the
    # standard materialize-between-stages shape of a production curation
    # build; MEMORY_AND_DISK blocks, released by the ContextCleaner)
    clean = clean.join(winners, "doc_id", "left_semi").localCheckpoint(eager=False)
    # near-dup: LSH candidates -> connected components -> canonical only
    pairs = dedup.lsh_candidate_pairs(clean, hasher=hasher)
    cc = dedup_cluster_assign(clean, pairs, max_iter=max_iter)
    canon = cc.filter(F.col("is_canonical") == 1).select("doc_id")
    return clean.join(canon, "doc_id", "left_semi")
