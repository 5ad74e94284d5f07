"""Scale rehearsal for the session-6 family: Heaps vocabulary growth,
char entropy, t-closeness, PSI drift, LOO target encoding and Neyman
sampling at 1x/8x/64x(/512x) input replication, recording per-run
shuffle read/write bytes + spill from the Spark UI — the measured curve
behind each op's scale claim:

- heaps_vocab_growth: the exchange is the DISTINCT vocabulary (grows
  sublinearly under perturbed replication), never the corpus.
- char_entropy: zero exchange at every scale (row-local fold).
- tcloseness_audit / psi_value_drift / loo_target_encode: count-sized
  aggregates on small key domains — shuffle bytes must stay flat-ish
  while input grows 512x.
- neyman_sample: moment rollup + WindowGroupLimit pick; shuffle scales
  with survivors-per-partition, not input.

Usage: python tools/scale_rehearsal_s6.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from scale_rehearsal import _metrics_since, replicate_docs_perturbed  # noqa: E402
from scale_rehearsal_behavior import replicate_events  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH/scale_rehearsal_s6_r5.json"
    )

    from logzoom_spark.ops.audit import psi_value_drift, tcloseness_audit
    from logzoom_spark.ops.classify import loo_target_encode
    from logzoom_spark.ops.corpus import neyman_sample
    from logzoom_spark.ops.text import char_entropy, heaps_vocab_growth
    from logzoom_spark.session import get_spark

    spark = get_spark(
        "scale_rehearsal_s6",
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
    work = "/tmp/scale_rehearsal_s6"

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
                pass
        results[key] = m
        _flush()
        print(key, json.dumps(m), flush=True)

    doc_ops = [
        ("heaps_vocab_growth", lambda inp: heaps_vocab_growth(inp).count()),
        ("char_entropy", lambda inp: char_entropy(inp).count()),
        ("neyman_sample", lambda inp: neyman_sample(inp, budget=120).count()),
    ]
    ev_ops = [
        ("tcloseness_audit", lambda inp: tcloseness_audit(inp).count()),
        ("psi_value_drift", lambda inp: psi_value_drift(inp).count()),
        ("loo_target_encode", lambda inp: loo_target_encode(inp).count()),
    ]
    for scale in (1, 8, 64, 512):
        for qname, q in doc_ops:
            run(
                qname,
                scale,
                lambda s: replicate_docs_perturbed(spark, docs0, s),
                q,
            )
        for qname, q in ev_ops:
            run(
                qname,
                scale,
                lambda s: replicate_events(spark, ev0, s),
                q,
            )

    _flush()
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
