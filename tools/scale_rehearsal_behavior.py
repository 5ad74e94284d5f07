"""Scale rehearsal for the round-5 behavior + winnowing families: run
cohort retention, rolling actives, Markov transitions, the rate-limit
audit, and winnowed overlap pairs at 1x/8x/64x(/512x) input replication
and record per-run shuffle read/write bytes + spill from the Spark UI —
the measured curve behind each op's "collapses to the distinct set
first" scale claim.

Event replicas get DISTINCT user_id/event_id spaces (replica r shifts
both by r*N) so user cardinality grows with volume — the realistic
regime for user-keyed exchanges. Document replicas reuse the perturbed
replicator from tools/scale_rehearsal.py.

Usage: python tools/scale_rehearsal_behavior.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from scale_rehearsal import (  # noqa: E402
    _metrics_since,
    replicate_docs_perturbed,
)


def replicate_events(spark, events, k: int):
    """k replicas with disjoint user/event id spaces, timestamps kept."""
    if k <= 1:
        return events
    n_u = events.agg(F.max("user_id")).first()[0] + 1
    n_e = events.agg(F.max("event_id")).first()[0] + 1
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    return (
        events.crossJoin(F.broadcast(reps))
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(n_u))
        .withColumn("event_id", F.col("event_id") + F.col("_rep") * F.lit(n_e))
        .drop("_rep")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH/scale_rehearsal_behavior_r5.json"
    )

    from logzoom_spark.ops.behavior import (
        active_users_rolling,
        cohort_retention,
        markov_transitions,
    )
    from logzoom_spark.ops.text import winnow_overlap_pairs
    from logzoom_spark.route import rate_limit_audit
    from logzoom_spark.session import get_spark

    spark = get_spark(
        "scale_rehearsal_behavior",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")

    results: dict[str, dict] = {}
    seen: set[int] = set()
    work = "/tmp/scale_rehearsal_behavior"

    def prep(df, path):
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _flush():
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    "results": results,
                },
                f,
                indent=1,
            )

    def run(qname, scale, build_input, run_query):
        nonlocal seen
        key = f"{qname}@{scale}x"
        try:
            inp = prep(build_input(scale), f"{work}/{qname}_{scale}x")
            rows_in = inp.count()
            _, seen = _metrics_since(seen)
            t0 = time.time()
            n_out = run_query(inp)
            wall = time.time() - t0
            m, seen = _metrics_since(seen)
            m.update(
                {"rows_in": rows_in, "rows_out": n_out, "wall_s": round(wall, 2)}
            )
        except Exception as e:  # record, keep campaigning
            m = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            try:
                _, seen = _metrics_since(seen)
            except Exception:
                pass  # UI may be gone with the JVM; keep the error record
        results[key] = m
        _flush()
        print(key, json.dumps(m), flush=True)

    for scale in (1, 8, 64, 512):
        run(
            "cohort_retention",
            scale,
            lambda s: replicate_events(spark, ev0, s),
            lambda inp: cohort_retention(inp).count(),
        )
        run(
            "active_users_rolling",
            scale,
            lambda s: replicate_events(spark, ev0, s),
            lambda inp: active_users_rolling(inp).count(),
        )
        run(
            "markov_transitions",
            scale,
            lambda s: replicate_events(spark, ev0, s),
            lambda inp: markov_transitions(inp).count(),
        )
        run(
            "rate_limit_audit",
            scale,
            lambda s: replicate_events(spark, ev0, s),
            lambda inp: rate_limit_audit(inp).count(),
        )
    for scale in (1, 8, 64, 512):
        run(
            "winnow_overlap_pairs",
            scale,
            lambda s: replicate_docs_perturbed(spark, docs0, s),
            lambda inp: winnow_overlap_pairs(inp).count(),
        )

    _flush()
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
