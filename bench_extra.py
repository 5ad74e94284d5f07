"""Isolated per-operator bench + plan capture (optimization guide §1).

NOT the driver bench (bench.py is frozen for measurement) — this file exists
so optimization work can time one operator at a time with the noop sink and
capture `.explain("formatted")` plans, without paying the full bench.py
session. Numbers from here are cited in OPTIMIZATION_r06.md; official
round-over-round numbers stay with bench.py.

Usage:
    python bench_extra.py [--sf DIR] [--cpus N] [--runs N] [--plans DIR] \
                          [--tag TAG] name [name ...]

`name` keys into TARGETS below; `all` runs everything. With --plans the
physical plan of each target goes to <plans>/<name>_<tag>.txt. Timing is
min of post-warmup reps (same estimator as bench.py); builds that are
inherently one-shot (pq_build, curation, setsim) run once, like bench.py.
Output: one JSON line {"queries": {name: sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from logzoom_spark.session import get_spark

    spark = get_spark(
        "bench_extra",
        cpus=args.cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    from pyspark.sql import functions as F

    import __spark_entry__ as se
    from logzoom_spark.ops import dedup, pq as pqm, setsim
    from logzoom_spark.ops.curation import curate

    sf = args.sf
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    def pq_build() -> None:
        books = pqm.pq_fit(emb, m=4, k=16, iters=2)
        pqm.pq_encode(emb, books).localCheckpoint()
        idx, _ = pqm.ivfpq_index(emb, books)
        idx.localCheckpoint()
        r_idx, _, _ = pqm.ivfpq_residual_index(emb)
        r_idx.localCheckpoint()

    # (df-producing thunk, one_shot) — one_shot targets time a single run
    TARGETS: dict[str, tuple] = {
        "setsim_join_pairs": (lambda: setsim.setsim_join(docs, threshold_bp=9000), True),
        "semdedup_kmeans": (lambda: se.q_semdedup_kmeans(spark, sf), True),
        "curation_pipeline": (lambda: curate(docs), True),
        "dedup_incremental": (lambda: se.q_dedup_incremental(spark, sf), False),
        "edit_distance_verify": (lambda: se.q_edit_distance_verify(spark, sf), False),
        "rp_rerank_topk": (lambda: se.q_rp_rerank_topk(spark, sf), False),
        "knn_recall_eval": (lambda: se.q_knn_recall_eval(spark, sf), False),
        "knn_outlier_scores": (lambda: se.q_knn_outlier_scores(spark, sf), False),
        "ann_knn_join": (lambda: se.q_ann_knn_join(spark, sf), False),
        "winnow_overlap_pairs": (lambda: se.q_winnow_overlap_pairs(spark, sf), False),
        "ivf_upsert": (lambda: se.q_ivf_upsert(spark, sf), False),
        "kmeans_clusters": (lambda: se.q_kmeans_clusters(spark, sf), False),
        "classify_lang_en": (lambda: se.q_classify_lang_en(spark, sf), False),
        "remove_dup_spans": (lambda: se.q_remove_dup_spans(spark, sf), False),
        "contamination_pairs": (lambda: se.q_contamination_pairs(spark, sf), False),
        "minhash_lsh_pairs": (lambda: dedup.lsh_candidate_pairs(docs), False),
        "bigram_surprisal": (lambda: se.q_bigram_surprisal(spark, sf), False),
        "ivfpq_residual_topk": (lambda: se.q_ivfpq_residual_topk(spark, sf), False),
        "semantic_dedup": (lambda: se.q_semantic_dedup(spark, sf), False),
        "gopher_quality": (lambda: se.q_gopher_quality(spark, sf), False),
    }
    # non-DataFrame (procedural) targets: name -> zero-arg fn, always one-shot
    PROC: dict[str, object] = {
        "pq_build_fit_encode_index": pq_build,
        "bpe_learn": lambda: se.q_bpe_learn_merges(spark, sf).collect(),
    }

    names = list(TARGETS) + list(PROC) if args.names == ["all"] else args.names
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if name in PROC:
            t0 = time.time()
            PROC[name]()
            timings[name] = round(time.time() - t0, 3)
            continue
        thunk, one_shot = TARGETS[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            p = os.path.join(args.plans, f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(thunk()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        reps = []
        for _ in range(1 if one_shot else args.runs):
            t0 = time.time()
            _noop(thunk())
            reps.append(time.time() - t0)
        timings[name] = round(min(reps[1:]) if len(reps) > 1 else reps[0], 3)
        print(f"## {name}: {timings[name]} s  (reps {[round(r,3) for r in reps]})", file=sys.stderr)
    print(json.dumps({"sf": sf.rstrip("/").split("/")[-1], "cpus": args.cpus, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
