"""spark-submit session payload for the scaling bench.

Launched by scripts/bench_scaling.py --via-submit as

    spark-submit --master local[N] --py-files logzoom_spark.zip \
        scripts/submit_session.py --turns-path ... --reps R

so the N-vs-4N scaling evidence runs through the exact launch path the
north rule names (spark-submit --py-files): the package is imported from
the shipped zip, not the repo checkout, and the master/memory come from
spark-submit flags. The measured job is identical to bench_scaling's
in-process session: full routing pipeline (parse -> broadcast enrich ->
route 6 sinks -> grouping-sets aggregates), every branch materialized,
per-sink jobs submitted concurrently (the reference's per-sink goroutines,
logzoom pipeline.go).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns-path", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("logzoom_scale_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cpus = spark.sparkContext.defaultParallelism

    # imported from the --py-files zip (no repo path on sys.path)
    from concurrent.futures import ThreadPoolExecutor

    from logzoom_spark import aggregate as agg
    from logzoom_spark.pipeline import build, default_config

    turns = spark.read.parquet(args.turns_path)
    n_turns = turns.count()
    cfg = default_config()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def routing_e2e() -> float:
        t0 = time.time()
        upstream, branches = build(spark, turns, cfg)
        try:
            def drain(br):
                noop(br)
                combined, _ = agg.window_counts_multi(
                    br, list(cfg.agg_keys), 300, persist=False
                )
                noop(combined)

            with ThreadPoolExecutor(max_workers=len(branches)) as pool:
                list(pool.map(drain, branches.values()))
        finally:
            upstream.unpersist()
        return time.time() - t0

    routing_e2e()  # warmup (codegen/JIT)
    reps = [routing_e2e() for _ in range(args.reps)]
    spark.stop()
    print("RESULT " + json.dumps({"cpus": cpus, "reps": reps, "turns": n_turns}))


if __name__ == "__main__":
    main()
