"""Tests for winnowing fingerprints, rate-limit audit, and conversion
latency — batch-B round-5 ops. Winnowing is checked exactly against an
independent pure-Python implementation of the SIGMOD 2003 algorithm."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _py_winnow(text: str, k: int = 4, window: int = 5, seed: int = 7):
    """Independent reference: robust winnowing, rightmost-min ties."""
    toks = text.lower().strip().split()
    if len(toks) < k + window - 1:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(f"{g}#{seed}".encode()).hexdigest()[:15], 16)
        for g in grams
    ]
    out = set()
    for j in range(len(hs) - window + 1):
        frame = hs[j : j + window]
        m = min(frame)
        pos = j + max(i for i, h in enumerate(frame) if h == m)
        out.add((pos + 1, m))
    return out


def test_winnow_matches_pure_python(spark):
    from logzoom_spark.ops.text import winnow_fingerprints

    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .cache()
    )
    got = {
        (r["doc_id"], r["pos"], r["gh"])
        for r in winnow_fingerprints(docs).collect()
    }
    want = set()
    for r in docs.select("doc_id", "text").collect():
        if r["text"] is None or not r["text"].strip():
            continue
        for pos, gh in _py_winnow(r["text"]):
            want.add((r["doc_id"], pos, gh))
    assert got == want
    docs.unpersist()


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Two docs sharing a k+window-1 = 8-token run must share >= 1
    fingerprint hash (the paper's guarantee), regardless of context."""
    from logzoom_spark.ops.text import winnow_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"unrelated prefix words here {shared} and a suffix tail"),
        (2, f"{shared} totally different continuation of this text body"),
        (3, "no overlap with anything else at all in this one document"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = winnow_overlap_pairs(docs, min_shared=1).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_rate_limit_audit_conservation(spark):
    from logzoom_spark.route import rate_limit_audit

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    out = rate_limit_audit(ev, limit=3, window_s=60).cache()
    assert out.filter(
        F.col("n_admitted") + F.col("n_rejected") != F.col("n_events")
    ).count() == 0
    # admitted per user can never exceed limit × windows
    assert out.filter(F.col("n_admitted") > 3 * F.col("n_windows")).count() == 0
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # an unreachable limit rejects nothing
    out2 = rate_limit_audit(ev, limit=10**9, window_s=60)
    assert out2.agg(F.sum("n_rejected")).collect()[0][0] == 0
    out.unpersist()


def test_rate_limit_audit_rejects_bad_args(spark):
    import pytest

    from logzoom_spark.route import rate_limit_audit

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    with pytest.raises(ValueError):
        rate_limit_audit(ev, limit=0)
    with pytest.raises(ValueError):
        rate_limit_audit(ev, window_s=0)


def test_conversion_latency_counts_every_signup_user(spark):
    from logzoom_spark.ops.behavior import conversion_latency_hist

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    out = conversion_latency_hist(ev).cache()
    n_signup_users = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert out.agg(F.sum("n_users")).collect()[0][0] == n_signup_users
    # never-converted bucket carries no gap stats
    neg = out.filter(F.col("gap_bucket_bits") == -1).collect()
    for r in neg:
        assert r["min_gap_s"] is None and r["max_gap_s"] is None
    # converted buckets have consistent bounds
    assert out.filter(
        (F.col("gap_bucket_bits") > 0) & (F.col("min_gap_s") > F.col("max_gap_s"))
    ).count() == 0
    out.unpersist()
