"""Invariant tests for the round-5 batch-I operators: exact prefix-filter
set-similarity join (PPJoin-lite) and rendezvous-hash (HRW) sharding.

Value parity with DuckDB is covered by the oracle harness; these pin the
algorithmic guarantees: the prefix filter misses NO qualifying pair
(equality with a brute-force all-pairs Jaccard), and HRW resharding moves
keys ONLY to the newly added shard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet")


def _events(spark):
    return spark.read.parquet(f"{SF0001}/events.parquet")


def _brute_pairs(spark, threshold_bp):
    """All-pairs word-set Jaccard in plain Python — the ground truth the
    prefix filter must reproduce exactly."""
    rows = _docs(spark).select("doc_id", "text").collect()
    sets = {
        r["doc_id"]: {t for t in (r["text"] or "").lower().strip().split() if t}
        for r in rows
    }
    ids = sorted(i for i, s in sets.items() if s)
    out = {}
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1:]:
            sb = sets[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and 10000 * inter >= threshold_bp * union:
                out[(a, b)] = (inter, union)
    return out


def test_setsim_equals_brute_force(spark):
    from logzoom_spark.ops.setsim import setsim_join

    for t in (5000, 6000, 8000):
        got = {
            (r["doc_a"], r["doc_b"]): (r["inter_tokens"], r["union_tokens"])
            for r in setsim_join(_docs(spark), threshold_bp=t).collect()
        }
        assert got == _brute_pairs(spark, t), f"threshold {t}"


def test_setsim_threshold_monotone_and_exact_values(spark):
    from logzoom_spark.ops.setsim import setsim_join

    lo = setsim_join(_docs(spark), threshold_bp=5000).collect()
    hi = {
        (r["doc_a"], r["doc_b"])
        for r in setsim_join(_docs(spark), threshold_bp=7000).collect()
    }
    lo_pairs = {(r["doc_a"], r["doc_b"]) for r in lo}
    assert hi <= lo_pairs
    for r in lo:
        assert r["doc_a"] < r["doc_b"]
        assert 0 < r["inter_tokens"] <= r["union_tokens"]
        assert r["jaccard_bp"] == 10000 * r["inter_tokens"] // r["union_tokens"]
        assert r["jaccard_bp"] >= 5000
    # the testdata's synthetic near-dups must actually surface
    assert lo_pairs


def test_setsim_handcrafted_edge(spark):
    """Identical sets, threshold-boundary set, disjoint set, NULL text."""
    from logzoom_spark.ops.setsim import setsim_join

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),       # jaccard 10000 with 1
        (3, "alpha beta gamma zeta"),        # 3/5 = 6000 with 1 and 2
        (4, "omega psi chi"),                # disjoint
        (5, None),                           # empty set: never pairs
        (6, "  ALPHA   beta GAMMA delta "),  # case/space-normalizes to 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in setsim_join(docs, threshold_bp=6000).collect()
    }
    assert got == {
        (1, 2): 10000,
        (1, 6): 10000,
        (2, 6): 10000,
        (1, 3): 6000,
        (2, 3): 6000,
        (3, 6): 6000,
    }


def test_hrw_assignment_deterministic_and_total(spark):
    from logzoom_spark.route import hrw_shard, hrw_shard_counts

    ev = _events(spark)
    counts = hrw_shard_counts(ev, n_shards=8).collect()
    n_keys = ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    assert sum(r["n_keys"] for r in counts) == n_keys
    assert all(0 <= r["shard"] < 8 for r in counts)
    # event conservation: per-shard event sums add up to all keyed events
    assert sum(r["n_events"] for r in counts) == ev.filter(
        F.col("user_id").isNotNull()
    ).count()
    # determinism: same expression twice -> identical assignment
    a = ev.select("user_id", hrw_shard(F.col("user_id"), 8).alias("s1")).distinct()
    b = ev.select("user_id", hrw_shard(F.col("user_id"), 8).alias("s2")).distinct()
    diff = a.join(b, "user_id").filter(F.col("s1") != F.col("s2")).count()
    assert diff == 0


def test_hrw_minimal_movement_theorem(spark):
    """Adding a shard moves keys ONLY to the new shard — exact, not
    statistical: the argmax over the old shard set is unchanged, so any
    key whose assignment differs must have the new shard as its max."""
    from logzoom_spark.route import hrw_reshard_audit, hrw_shard

    rows = hrw_reshard_audit(_events(spark), n_before=8).collect()
    assert rows
    for r in rows:
        assert r["n_moved"] == r["n_moved_to_new"]
        assert 0 <= r["n_moved"] <= r["n_keys"]
    # expected movement ~ 1/9 of keys; on a wide synthetic key set the
    # fraction must be visibly below 1/2 (mod-N resharding would move 8/9)
    keys = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    both = keys.select(
        hrw_shard(F.col("k"), 8).alias("b8"),
        hrw_shard(F.col("k"), 9).alias("b9"),
    ).collect()
    moved = sum(1 for r in both if r["b8"] != r["b9"])
    assert all(r["b9"] == 8 for r in both if r["b8"] != r["b9"])
    assert 0.03 < moved / 3000 < 0.25  # around 1/9, wide slack


def test_hrw_single_shard_and_validation(spark):
    import pytest

    from logzoom_spark.route import hrw_shard, hrw_shard_counts

    one = hrw_shard_counts(_events(spark), n_shards=1).collect()
    assert len(one) == 1 and one[0]["shard"] == 0
    with pytest.raises(ValueError):
        hrw_shard(F.lit("x"), 0)


def test_setsim_prefix_path_wide_vocab_equals_brute_force(spark):
    """A > 63-token vocabulary skips the bitmask fast path, so this pins
    the prefix-filter plan (the at-scale branch) to the same brute-force
    ground truth the small-universe tests pin the bitmask branch to."""
    import random

    from logzoom_spark.ops.setsim import setsim_join

    rng = random.Random(11)
    vocab = [f"tok{i:03d}" for i in range(80)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, 12)
        rows.append((2 * i, " ".join(base)))
        near = list(base)
        near[rng.randrange(len(near))] = rng.choice(vocab)  # 1-token edit
        rows.append((2 * i + 1, " ".join(near)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(threshold_bp):
        sets = {i: {t for t in txt.lower().split() if t} for i, txt in rows}
        out = {}
        ids = sorted(sets)
        for x, a in enumerate(ids):
            for b in ids[x + 1:]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and 10000 * inter >= threshold_bp * union:
                    out[(a, b)] = (inter, union)
        return out

    for t in (6000, 8000):
        got = {
            (r["doc_a"], r["doc_b"]): (r["inter_tokens"], r["union_tokens"])
            for r in setsim_join(docs, threshold_bp=t).collect()
        }
        assert got == brute(t), f"threshold {t}"
