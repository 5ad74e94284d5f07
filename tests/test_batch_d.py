"""Invariant tests for turn_latency_stats, knn_outlier_scores, mmr_topk."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_turn_latency_counts_every_non_opener(spark, turns):
    from logzoom_spark.aggregate import turn_latency_stats

    out = turn_latency_stats(turns).cache()
    n_turns = turns.count()
    n_convs = turns.select("conv_id").distinct().count()
    assert out.agg(F.sum("n")).collect()[0][0] == n_turns - n_convs
    assert out.filter(
        (F.col("mean_gap_s") < F.col("min_gap_s"))
        | (F.col("mean_gap_s") > F.col("max_gap_s"))
    ).count() == 0
    out.unpersist()


def test_knn_outlier_scores_cell_consistency(spark):
    from logzoom_spark.ops.similarity import ivf_assign, knn_outlier_scores

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    out = knn_outlier_scores(emb, k=5, n_cells=16).cache()
    assert out.count() == emb.count()
    sizes = (
        ivf_assign(emb, n_cells=16)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # n_neighbors is exactly cell size - 1 (pairs are within-cell complete)
    bad = (
        out.join(sizes, "cell")
        .filter(F.col("n_neighbors") != F.col("c") - 1)
        .count()
    )
    assert bad == 0
    # NULL score iff alone in the cell
    assert out.filter(
        F.col("kth_dot").isNull() != (F.col("n_neighbors") == 0)
    ).count() == 0
    out.unpersist()


def test_mmr_prefers_diverse_over_redundant(spark):
    from logzoom_spark.ops.similarity import mmr_topk

    dim = 8
    def vec(*vals):
        v = list(vals) + [0.0] * (dim - len(vals))
        return [float(x) for x in v]

    rows = [
        (0, vec(1.0, 0.9), 0),   # query
        (1, vec(1.0, 0.0), 0),   # most relevant
        (2, vec(1.0, 0.0), 0),   # exact redundant twin of 1
        (3, vec(0.0, 1.0), 0),   # orthogonal to 1, still relevant
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {r["rank"]: r["vec_id"] for r in mmr_topk(emb, k=2, pool=3).collect()}
    # plain top-2 would be (1, 2); MMR must pick the diverse 3 second
    assert out == {1: 1, 2: 3}


def test_mmr_rank1_is_plain_top1_and_args_validated(spark):
    import pytest

    from logzoom_spark.ops.similarity import brute_force_topk, mmr_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    got = mmr_topk(emb, k=3, pool=10).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert len({r["vec_id"] for r in got}) == 3
    top1 = brute_force_topk(emb, query_vec_id=0, k=1).collect()[0]
    assert got[0]["vec_id"] == top1["vec_id"]
    assert got[0]["mmr"] == 7 * top1["dot"]
    with pytest.raises(ValueError):
        mmr_topk(emb, k=5, pool=3)
    with pytest.raises(ValueError):
        mmr_topk(emb, lam_num=10, lam_den=10)
