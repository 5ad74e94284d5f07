"""Scale rehearsal for the round-6 Arrow/numpy kernels: the ops whose
compute cores moved from interpreted higher-order functions to exact-GEMM
kernels (and setsim's adaptive small-universe path) at 1x/8x/64x input
replication, recording per-run shuffle read/write bytes + spill from the
Spark UI — the measured curve behind each op's scale claim:

- knn_outlier_scores: the old plan shuffled O(c²) pair rows per cell into
  a rank window; the kernel shuffles each member row ONCE — shuffle bytes
  must now scale ~linearly with input, never quadratically.
- knn_join (ann batch): cogrouped per-cell GEMM emits k rows per
  (query, cell); the exchange feeding the rank window is query-bounded.
- random_project / rp_rerank_topk: projection is a per-batch GEMM —
  zero-ish shuffle at every scale (TakeOrdered shortlist only).
- ivfpq_residual_index build: single-pass kernels (no vec_id build
  joins) — shuffle bytes stay tiny while input grows 64x.
- setsim_join: replicate_docs_perturbed appends one fresh token per
  replica, so 8x stays inside the ≤63-token bitmask path while 64x
  (94-token vocabulary) exercises the prefix-filter fallback — both
  branches measured in one curve.

Usage: python tools/scale_rehearsal_r6.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from scale_rehearsal import (  # noqa: E402
    _metrics_since,
    replicate_docs_perturbed,
    replicate_emb_perturbed,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH/scale_rehearsal_r6.json"
    )

    from logzoom_spark.ops import pq as pqm
    from logzoom_spark.ops.setsim import setsim_join
    from logzoom_spark.ops.similarity import (
        knn_join,
        knn_outlier_scores,
        rp_rerank_topk,
    )
    from logzoom_spark.session import get_spark

    spark = get_spark(
        "scale_rehearsal_r6",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    results: dict[str, dict] = {}
    seen: set[int] = set()
    work = "/tmp/scale_rehearsal_r6"

    def prep(df, path):
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

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
        print(key, json.dumps(m), flush=True)

    import math

    for scale in (1, 8, 64):
        # n_cells ~ sqrt(N): the documented IVF operating point at scale
        run(
            "knn_outlier_scores",
            scale,
            lambda s: replicate_emb_perturbed(spark, emb0, s),
            lambda inp, s=scale: knn_outlier_scores(
                inp, k=5, n_cells=max(16, int(math.sqrt(2000 * s)))
            ).count(),
        )
    for scale in (1, 8, 64):
        run(
            "knn_join_batch",
            scale,
            lambda s: replicate_emb_perturbed(spark, emb0, s),
            lambda inp, s=scale: knn_join(
                inp,
                queries=inp.filter("vec_id < 100"),
                k=3,
                n_cells=max(16, int(math.sqrt(2000 * s))),
                n_probe=4,
            ).count(),
        )
    for scale in (1, 8, 64):
        run(
            "rp_rerank_topk",
            scale,
            lambda s: replicate_emb_perturbed(spark, emb0, s),
            lambda inp: rp_rerank_topk(inp, 0, k=10, n_candidates=100, out_dims=32)
            .count(),
        )
    for scale in (1, 8, 64):
        def build_index(inp):
            idx, books, cents = pqm.ivfpq_residual_index(inp)
            return idx.count()

        run(
            "ivfpq_residual_index_build",
            scale,
            lambda s: replicate_emb_perturbed(spark, emb0, s),
            build_index,
        )
    for scale in (1, 8):
        # 8x keeps a 38-token vocabulary (bitmask path). 64x is NOT run:
        # its 94-token vocabulary passes the ≤63-token bound, and on a
        # template-dense corpus the prefix-filter fallback's candidate
        # shuffle is inherently quadratic — a recorded attempt filled the
        # sandbox's ~79 GB free disk (see the note in
        # BENCH/scale_rehearsal_kernels_r6.json). That degenerate regime
        # is exactly what the bitmask path exists for.
        run(
            "setsim_join_t9500",
            scale,
            lambda s: replicate_docs_perturbed(spark, docs0, s),
            lambda inp: setsim_join(inp, threshold_bp=9500).count(),
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
