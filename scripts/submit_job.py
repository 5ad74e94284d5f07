"""spark-submit entry point: run the full pipeline from a packaged zip.

Driver program for scripts/submit.sh; imports logzoom_spark from the
--py-files zip, not from the repo checkout.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--n-groups", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("logzoom_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from logzoom_spark.pipeline import default_config, run_batch
    from logzoom_spark.transcripts import load_turns

    turns = load_turns(spark, args.sf_dir)
    if args.resumable:
        from logzoom_spark.lineage import run_resumable

        res = run_resumable(
            spark, turns, default_config(), out_dir=args.out_dir, n_groups=args.n_groups
        )
    else:
        res = run_batch(spark, turns, default_config(), out_dir=args.out_dir)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
