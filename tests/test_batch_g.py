"""Invariant tests for the session-6 operators: Heaps vocabulary growth,
character entropy, t-closeness, classifier AUC, Neyman allocation.

Value parity with DuckDB is covered by the oracle harness; these pin the
semantic invariants that survive any refactor.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet")


def _events(spark):
    return spark.read.parquet(f"{SF0001}/events.parquet")


def test_heaps_growth_conserves_and_is_monotone(spark):
    from logzoom_spark.ops.text import heaps_vocab_growth, token_count

    docs = _docs(spark)
    out = heaps_vocab_growth(docs, n_buckets=7).cache()
    rows = out.orderBy("bucket").collect()
    # docs and tokens are conserved across buckets
    assert sum(r["docs_n"] for r in rows) == docs.count()
    tok_total = docs.select(
        F.sum(token_count(F.coalesce(F.col("text"), F.lit("")))).alias("t")
    ).collect()[0]["t"]
    assert rows[-1]["cum_tokens"] == tok_total
    # cum_vocab ends at the corpus-wide distinct token count
    vocab = (
        docs.select(
            F.explode(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
                )
            ).alias("t")
        )
        .filter(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert rows[-1]["cum_vocab"] == vocab
    # both cumulative curves are non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
    out.unpersist()


def test_char_entropy_known_values(spark):
    from logzoom_spark.ops.text import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, ""), (3, None), (4, "abcd")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[0]["entropy_mnat"] == 0 and got[0]["n_distinct_chars"] == 1
    assert got[1]["entropy_mnat"] == math.floor(1000 * math.log(2))
    assert got[2]["entropy_mnat"] is None and got[2]["n_chars_used"] == 0
    assert got[3]["entropy_mnat"] is None
    assert got[4]["entropy_mnat"] == math.floor(1000 * math.log(4))
    # corpus sanity: entropy is bounded by ln(n_distinct)
    out = char_entropy(_docs(spark))
    bad = out.filter(
        F.col("entropy_mnat")
        > F.floor(F.log(F.col("n_distinct_chars").cast("double")) * 1000) + 1
    ).count()
    assert bad == 0


def test_tcloseness_zero_iff_cell_matches_global(spark):
    from logzoom_spark.ops.audit import tcloseness_audit

    # one quasi cell == whole table -> TVD 0; a pure cell of one user
    # among many -> large TVD
    rows = [("a", u) for u in range(10)] + [("b", 0)] * 10
    df = spark.createDataFrame(rows, "event_type string, user_id bigint")
    got = {r["event_type"]: r for r in tcloseness_audit(df, t_bp=3000).collect()}
    # hand-computed: global p(0) = 11/20, p(1..9) = 1/20 each.
    # cell a (uniform over 10 users): TVD = (9/20 + 9/20)/2 = 0.45;
    # cell b (pure user-0):          TVD = (9/20 + 9/20)/2 = 0.45 too
    assert got["a"]["tvd_bp"] == 4500 and got["a"]["ok"] == 0
    assert got["b"]["tvd_bp"] == 4500 and got["b"]["ok"] == 0
    # a single-cell table is always t-close to itself
    one = tcloseness_audit(
        spark.createDataFrame(rows, "event_type string, user_id bigint").withColumn(
            "event_type", F.lit("x")
        )
    ).collect()
    assert len(one) == 1 and one[0]["tvd_bp"] == 0 and one[0]["ok"] == 1
    # real table: every tvd_bp in [0, 10000]
    out = tcloseness_audit(_events(spark))
    assert out.filter((F.col("tvd_bp") < 0) | (F.col("tvd_bp") > 10000)).count() == 0


def test_classifier_auc_bounds_and_perfect_ranking(spark):
    from logzoom_spark.ops import classify

    # a synthetic perfectly-separating score -> AUC 10000; reversed -> 0
    scored = spark.createDataFrame(
        [(i, 1, i * 100, True) for i in range(10)],
        "doc_id bigint, n_feats bigint, score_fp bigint, pred boolean",
    )
    docs = spark.createDataFrame(
        [(i, i >= 5) for i in range(10)], "doc_id bigint, y boolean"
    )
    perfect = classify.classifier_auc(scored, docs, "y").collect()[0]
    assert perfect["auc_bp"] == 10000
    inverted = classify.classifier_auc(
        scored.withColumn("score_fp", -F.col("score_fp")), docs, "y"
    ).collect()[0]
    assert inverted["auc_bp"] == 0
    # all-tied scores -> exactly 1/2
    tied = classify.classifier_auc(
        scored.withColumn("score_fp", F.lit(7).cast("bigint")), docs, "y"
    ).collect()[0]
    assert tied["auc_bp"] == 5000
    # real pipeline: one row, AUC in [0, 10000], unscored counted
    d = _docs(spark)
    w = classify.classifier_fit(
        d.filter(F.col("doc_id") % 10 < 8), F.col("lang") == "en"
    )
    out = classify.classifier_auc(
        classify.classifier_score(d, w), d, F.col("lang") == "en"
    ).collect()
    assert len(out) == 1
    assert 0 <= out[0]["auc_bp"] <= 10000
    assert out[0]["n_pos"] + out[0]["n_neg"] + out[0]["n_unscored"] == d.count()


def test_neyman_allocation_and_determinism(spark):
    from logzoom_spark.ops.corpus import neyman_sample

    docs = _docs(spark)
    out = neyman_sample(docs, budget=40, seed=3).cache()
    per = out.groupBy("lang", "alloc_n").agg(F.count(F.lit(1)).alias("n")).collect()
    # each stratum delivers exactly its allocation, total <= budget
    assert all(r["n"] == r["alloc_n"] for r in per)
    assert sum(r["n"] for r in per) <= 40
    # allocation follows N_h * sd ordering: recompute weights driver-side
    import statistics

    rows = docs.select("lang", "n_chars").collect()
    by = {}
    for r in rows:
        by.setdefault(r["lang"], []).append(r["n_chars"])
    w = {
        g: int(math.floor(math.sqrt(len(v) * sum(x * x for x in v) - sum(v) ** 2)))
        for g, v in by.items()
    }
    tot = sum(w.values())
    expect = {g: 40 * wg // tot for g, wg in w.items()}
    got = {r["lang"]: r["alloc_n"] for r in per}
    for g, e in expect.items():
        assert got.get(g, 0) == e or e == 0
    # same seed -> identical pick set; different seed -> (almost surely) not
    again = set(
        (r["lang"], r["doc_id"]) for r in neyman_sample(docs, budget=40, seed=3).collect()
    )
    assert again == set((r["lang"], r["doc_id"]) for r in out.collect())
    other = set(
        (r["lang"], r["doc_id"]) for r in neyman_sample(docs, budget=40, seed=4).collect()
    )
    assert other != again
    out.unpersist()


def test_psi_zero_on_identical_halves_and_positive_on_shift(spark):
    from logzoom_spark.ops.audit import psi_value_drift

    # same value multiset on both sides of the split -> every term is
    # exactly 0 (shares identical); shifted second half -> PSI fires
    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    d9 = datetime.datetime(2024, 1, 9)
    same = [(d0, float(v)) for v in range(100)] + [
        (d9, float(v)) for v in range(100)
    ]
    df = spark.createDataFrame(same, "ts timestamp, value double")
    out = psi_value_drift(df).collect()
    assert len(out) == 10  # full bin spine, empty bins included
    assert all(r["term_micro"] == 0 for r in out)
    assert out[0]["psi_micro"] == 0
    shifted = [(d0, float(v)) for v in range(100)] + [
        (d9, float(v) + 60.0) for v in range(100)
    ]
    out2 = psi_value_drift(
        spark.createDataFrame(shifted, "ts timestamp, value double")
    ).collect()
    assert out2[0]["psi_micro"] > 250000  # > 0.25: "act" territory
    # real table: conservation of rows into n_ref + n_cur
    ev = _events(spark)
    out3 = psi_value_drift(ev).collect()
    assert sum(r["n_ref"] + r["n_cur"] for r in out3) == ev.filter(
        F.col("value").isNotNull()
    ).count()


def test_calibration_curve_conserves_and_bounds(spark):
    from logzoom_spark.ops import classify

    d = _docs(spark)
    w = classify.classifier_fit(
        d.filter(F.col("doc_id") % 10 < 8), F.col("lang") == "en"
    )
    scored = classify.classifier_score(d, w).cache()
    out = classify.calibration_curve(scored, d, F.col("lang") == "en").collect()
    assert sum(r["n"] for r in out) == scored.filter(
        F.col("score_fp").isNotNull()
    ).count()
    for r in out:
        assert 0 <= r["pos_bp"] <= 10000
        assert 0 <= r["bin"] <= 9
        assert r["n_pos"] <= r["n"]
    scored.unpersist()


def test_loo_target_encode_hand_values(spark):
    from logzoom_spark.ops.classify import loo_target_encode

    df = spark.createDataFrame(
        [
            (1, "a", 0.10),
            (2, "a", 0.20),
            (3, "a", 0.30),
            (4, "b", 9.99),  # singleton group -> NULL
            (5, "c", None),  # NULL target -> NULL, still a row
            (6, "c", 1.00),  # its group has only 1 non-null -> NULL too
        ],
        "event_id bigint, event_type string, value double",
    )
    got = {r["event_id"]: r for r in loo_target_encode(df).collect()}
    assert len(got) == 6  # counted, not dropped
    assert got[1]["enc_cents"] == 25  # (20+30)/2
    assert got[2]["enc_cents"] == 20  # (10+30)/2
    assert got[3]["enc_cents"] == 15  # (10+20)/2
    assert got[4]["enc_cents"] is None
    assert got[5]["enc_cents"] is None and got[5]["target_cents"] is None
    assert got[6]["enc_cents"] is None
    # real table: row conservation and NULL only where contract says
    ev = _events(spark)
    out = loo_target_encode(ev)
    assert out.count() == ev.count()


def test_tcloseness_and_neyman_null_handling(spark):
    from logzoom_spark.ops.audit import tcloseness_audit
    from logzoom_spark.ops.corpus import neyman_sample

    # NULL sensitive rows are excluded from EVERY term (cells and total):
    # with them gone, cell 'x' == global -> TVD exactly 0
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", None), ("x", None)],
        "event_type string, user_id bigint",
    )
    got = tcloseness_audit(df).collect()
    assert len(got) == 1 and got[0]["tvd_bp"] == 0 and got[0]["n_rows"] == 2
    # NULL measures don't inflate the Neyman variance numerator: a stratum
    # whose only non-null measures are constant has weight 0 -> alloc 0
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "a", None), (4, "b", 5), (5, "b", 105)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    picked = neyman_sample(docs, budget=2, seed=0).collect()
    assert all(r["lang"] == "b" for r in picked)  # all weight sits on b
