"""Scale rehearsal for the round-5 log-ops family: measured shuffle-volume
curves for template mining, the SRE triage composition, and cooldown flap
suppression at 1x-512x input replication (same method and helpers as
tools/scale_rehearsal.py — per-stage shuffle/spill bytes from the Spark UI
REST API).

The flap-suppression run doubles as an honest measurement of its known
scale bound: parallelism = alert-KEY cardinality (applyInPandas groups),
which on this synthetic corpus is only the 4 log_types. Real deployments
key by (service, template) — plentiful — but the curve here shows what
happens when they don't.

Usage:
    python tools/scale_rehearsal_sre.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_rehearsal import (  # noqa: E402
    _metrics_since,
    replicate_turns_perturbed,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scale_rehearsal_sre_r5.json"

    from logzoom_spark.ops.sre import flap_suppress
    from logzoom_spark.ops.templates import log_template_mine, sre_triage_report
    from logzoom_spark.parse import parse_turns
    from logzoom_spark.session import get_spark
    from logzoom_spark.transcripts import load_turns

    spark = get_spark(
        "scale_rehearsal_sre",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    turns0 = load_turns(spark, sf_dir)
    results: dict[str, dict] = {}
    seen: set[int] = set()
    work = "/tmp/scale_rehearsal_sre"

    def prep(df, path):
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run(qname: str, scale: int, run_query) -> None:
        nonlocal seen
        key = f"{qname}@{scale}x"
        inp = prep(
            replicate_turns_perturbed(spark, turns0, scale),
            f"{work}/turns_{scale}x",
        )
        rows_in = inp.count()
        _, seen = _metrics_since(seen)
        t0 = time.time()
        n_out = run_query(inp)
        wall = time.time() - t0
        m, seen = _metrics_since(seen)
        m.update({"rows_in": rows_in, "rows_out": n_out, "wall_s": round(wall, 2)})
        results[key] = m
        print(key, json.dumps(m), flush=True)

    def flap_query(inp):
        p = parse_turns(inp, with_attrs=False).filter(
            (F.col("level") == "ERROR") & F.col("log_type").isNotNull()
        )
        return flap_suppress(
            p, ("log_type",), ("conv_id", "turn_idx"), cooldown_s=14400
        ).count()

    for scale in (1, 8, 64, 512):
        run("log_template_mine", scale, lambda inp: log_template_mine(inp).count())
        run("sre_triage_report", scale, lambda inp: sre_triage_report(inp).count())
    for scale in (1, 8, 64):
        # 512x deliberately omitted: 4 keys x ~8.5M rows/key in single pandas
        # groups is the documented anti-pattern this curve is here to show
        run("flap_suppress_errors", scale, flap_query)

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
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
