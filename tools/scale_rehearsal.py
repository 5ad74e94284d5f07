"""Scale rehearsal (VERDICT r4 #5): run the flagship compositions at
1x/8x/64x(/512x) input replication on this host and record PER-STAGE
shuffle read/write bytes + spill from the Spark UI REST API — converting
the "scales by design" plan arguments into measured shuffle-volume curves,
the strongest pre-cluster evidence available in-sandbox.

Replicas are content-PERTURBED (suffix per replica / embedding jitter) so
dedup stages face a realistic mostly-unique corpus instead of collapsing
everything to one survivor.

Usage:
    python tools/scale_rehearsal.py [sf_dir] [out_json]
Writes one JSON with, per (query, scale): rows_in, wall seconds, total and
max-single-stage shuffle read/write bytes, spill bytes, n_stages.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _ui_stages(port: int = 4040) -> list[dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=30)
    )


def _metrics_since(prev_ids: set[int]) -> tuple[dict, set[int]]:
    stages = _ui_stages()
    new = [s for s in stages if s["stageId"] not in prev_ids]
    ids = {s["stageId"] for s in stages}
    agg = {
        "n_stages": len(new),
        "shuffle_read_b": sum(s.get("shuffleReadBytes", 0) for s in new),
        "shuffle_write_b": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "max_stage_shuffle_write_b": max(
            (s.get("shuffleWriteBytes", 0) for s in new), default=0
        ),
        "spill_mem_b": sum(s.get("memoryBytesSpilled", 0) for s in new),
        "spill_disk_b": sum(s.get("diskBytesSpilled", 0) for s in new),
        "input_b": sum(s.get("inputBytes", 0) for s in new),
    }
    return agg, ids


def replicate_turns_perturbed(spark, turns, k: int):
    """k near-copies of every conversation with DISTINCT conv_id AND a
    per-replica text perturbation on every turn (replica 0 is the
    original), so conversation dedup keeps ~all replicas — the realistic
    mostly-unique regime."""
    if k <= 1:
        return turns
    reps = spark.range(k).select(F.col("id").cast("int").alias("_rep"))
    return (
        turns.crossJoin(F.broadcast(reps))
        .withColumn("conv_id", F.concat_ws("-", "conv_id", "_rep"))
        .withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.concat_ws(" ", "text", F.concat(F.lit("r"), F.col("_rep")))
            ),
        )
        .drop("_rep")
    )


def replicate_docs_perturbed(spark, docs, k: int):
    if k <= 1:
        return docs
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(n))
        .withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.concat_ws(" ", "text", F.concat(F.lit("v"), F.col("_rep")))
            ),
        )
        .drop("_rep")
    )


def replicate_emb_perturbed(spark, emb, k: int):
    """Replica r jitters every coordinate by a deterministic r-dependent
    epsilon — replicas are NEAR duplicates (the SemDeDup regime) but not
    byte-identical."""
    if k <= 1:
        return emb
    n = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(F.broadcast(reps))
        .withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("_rep") % 7 + i % 5).cast("float") * 0.0003,
                )
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(n))
        .drop("_rep")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scale_rehearsal_r5.json"

    from logzoom_spark.ops.corpus import transcript_training_corpus
    from logzoom_spark.ops.curation import curate
    from logzoom_spark.ops.similarity import semdedup
    from logzoom_spark.session import get_spark
    from logzoom_spark.transcripts import load_turns

    spark = get_spark(
        "scale_rehearsal",
        extra_conf={
            "spark.ui.enabled": "true",
            # default retention (1000 stages) evicts early stages mid-campaign
            # and silently undercounts the per-run diffs — keep everything
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )

    turns0 = load_turns(spark, sf_dir)
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    import math

    def prep(df, path):
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    results: dict[str, dict] = {}
    seen: set[int] = set()
    work = "/tmp/scale_rehearsal"

    def run(qname: str, scale: int, build_input, run_query):
        nonlocal seen
        key = f"{qname}@{scale}x"
        inp = prep(build_input(scale), f"{work}/{qname}_{scale}x")
        rows_in = inp.count()
        _, seen = _metrics_since(seen)  # reset baseline AFTER input build
        t0 = time.time()
        n_out = run_query(inp)
        wall = time.time() - t0
        m, seen = _metrics_since(seen)
        m.update({"rows_in": rows_in, "rows_out": n_out, "wall_s": round(wall, 2)})
        results[key] = m
        print(key, json.dumps(m))

    for scale in (1, 8, 64, 512):
        run(
            "transcript_training_corpus",
            scale,
            lambda s: replicate_turns_perturbed(spark, turns0, s),
            lambda inp: transcript_training_corpus(inp, budget_tokens=512).count(),
        )
    for scale in (1, 8, 64):
        run(
            "curation_pipeline",
            scale,
            lambda s: replicate_docs_perturbed(spark, docs0, s),
            lambda inp: curate(inp).count(),
        )
    for scale in (1, 8, 64):
        # k ~ sqrt(N): the documented SemDeDup operating point at scale
        run(
            "semdedup_kmeans",
            scale,
            lambda s: replicate_emb_perturbed(spark, emb0, s),
            lambda inp, s=scale: semdedup(
                inp, k=max(4, int(math.sqrt(2000 * s) / 8)), iters=2, threshold=0.3
            ).count(),
        )

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
             "results": results},
            f,
            indent=1,
        )
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
