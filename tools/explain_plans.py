"""Dump formatted physical plans for the core operators (docs/SCALE.md
evidence). Usage: python tools/explain_plans.py [sf_dir] > /tmp/plans.txt"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from logzoom_spark import aggregate as agg
    from logzoom_spark import transcripts as tr
    from logzoom_spark.enrich import enrich
    from logzoom_spark.parse import parse_turns
    from logzoom_spark.route import Route, apply_route
    from logzoom_spark.session import get_spark

    spark = get_spark("explain", cpus=4)
    turns = tr.load_turns(spark, sf)
    parsed = parse_turns(turns, with_attrs=False)
    enriched = enrich(parsed, tr.role_meta(spark), tr.tool_meta(spark))
    routed = apply_route(enriched, Route("r", "s", {"log_type": "log_type1"}))

    print("=" * 30, "enrich (broadcast joins, no fact shuffle)")
    enriched.explain("formatted")
    print("=" * 30, "grouping-sets aggregate (single Exchange)")
    combined, _ = agg.window_counts_multi(routed, ["role", "tool", "conv_id"], 300)
    combined.explain("formatted")
    combined.unpersist()

    print("=" * 30, "column pruning + filter pushdown on stored columns")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    pruned = ev.filter(ev.event_type == "error").select("event_id", "ts")
    pruned.explain("formatted")

    import __spark_entry__ as se

    for name, q in [
        ("asof join (one shuffle, window carry)", se.q_asof_last_purchase),
        ("bounded range join (bucketed equi-join)", se.q_range_prior_hour),
        ("heavy hitters (partial agg + TakeOrdered)", se.q_heavy_hitter_tokens),
        ("merge upsert (anti-join + union)", se.q_merge_docs_upsert),
        ("salted join (key+salt equi-join)", se.q_salted_join_revenue),
        ("gopher filter (zero-shuffle projection)", se.q_gopher_quality),
        ("media header parse (zero-shuffle binary ops)", se.q_media_header_parse),
        ("tpch_q3 (no forced customer broadcast)", se.q_tpch_q3),
        ("tpch_q5 (no forced customer broadcast)", se.q_tpch_q5_region_revenue),
        ("topk per segment (no forced customer broadcast)", se.q_topk_orders_per_segment),
        ("tpch_q9 (6-table, size-based join strategy)", se.q_tpch_q9_profit),
        ("container headers (zero-shuffle binary codecs)", se.q_media_container_headers),
        ("chunk documents (zero-shuffle slice explode)", se.q_chunk_documents),
        ("contamination (hash equi-join + df cap)", se.q_contamination_pairs),
        ("kmv distinct (salted two-stage, no whole-group window)", se.q_kmv_distinct_users),
        ("percentiles (histogram + cumulative rank)", se.q_latency_percentiles),
        # round 4
        ("knn join (cell equi-join + WindowGroupLimit, no cartesian)", se.q_ann_knn_join),
        ("paragraph dedup (digest-only winner shuffle)", se.q_paragraph_dedup),
        ("incremental dedup (digest equi-joins vs standing sigs)", se.q_dedup_incremental),
        ("bm25 (broadcast query terms first, TakeOrdered finish)", se.q_bm25_topk),
        ("tpch_q13 (outer join + double agg)", se.q_tpch_q13),
        ("tpch_q17 (decorrelated scalar subquery)", se.q_tpch_q17),
        ("tpch_q18 (HAVING agg feeds 3-way join)", se.q_tpch_q18),
        ("reservoir sample (WindowGroupLimit rank<=k)", se.q_reservoir_sample_lang),
        ("mixture sample (broadcast plan rows back onto corpus)", se.q_mixture_sample),
        # round 4 (late)
        ("pack sequences (bucketed prefix sum, no global-sort window)", se.q_pack_sequences),
        ("tpch_q4 (EXISTS as left semi)", se.q_tpch_q4),
        ("tpch_q6 (pure pushdown scan, no shuffle past partial agg)", se.q_tpch_q6),
        ("tpch_q16 (anti join + count distinct)", se.q_tpch_q16),
        ("tpch_q21 (flag rollups, no correlated self-joins)", se.q_tpch_q21),
        ("tpch_q22 (1-row broadcast scalar + anti join)", se.q_tpch_q22),
        # round 4 (final)
        ("kmeans (zero-shuffle literal-centroid assign)", se.q_kmeans_clusters),
        ("bpe pairs (vocab-sized shuffles + TakeOrdered)", se.q_bpe_pair_counts),
        ("quality prune (one group-key shuffle, per-domain window)", se.q_quality_prune_per_lang),
        ("conv dedup (conv_id shuffle + digest-only fingerprint window)", se.q_conv_dedup),
        ("skew key stats (partial counts + 1-row total broadcast + TakeOrdered)", se.q_skew_key_stats),
        ("rp rerank (projected-scan shortlist, broadcast fetch of m vectors)", se.q_rp_rerank_topk),
        # round 4 (continued)
        ("dup span grams (digest-only explode + semi-join, no self-join)", se.q_dup_span_grams),
        ("bm25 query join (df once per term, WindowGroupLimit per query)", se.q_bm25_query_join),
        ("weighted sample (row-local A-ES keys + WindowGroupLimit)", se.q_weighted_sample_lang),
        ("split assign (zero-shuffle projection)", se.q_split_assign_counts),
        ("vocab stats (vocabulary-sized shuffle, map-side collapse)", se.q_vocab_stats_lang),
        # round 4 (PQ / classifier / bigram batch)
        ("pq encode (zero-shuffle codebook-literal projection)", se.q_pq_encode_codes),
        ("pq adc (broadcast m*k distance table, TakeOrdered)", se.q_pq_adc_topk),
        ("ivfpq (broadcast nprobe cell semi-join prunes the scan)", se.q_ivfpq_adc_topk),
        ("classifier fit+serve (bounded-bucket fit shuffle, broadcast weights)", se.q_classify_lang_en),
        ("classifier inline serve (map-literal weights, ZERO exchanges)", se.q_classify_inline_serve),
        ("bigram surprisal (row-local pairs, vocab-sized LM shuffles)", se.q_bigram_surprisal),
        # round 4 (session 3)
        ("bloom build (distinct bit coords, bounded word agg)", se.q_bloom_filter_words),
        ("bloom probe (broadcast word table + row-local bit test)", se.q_bloom_membership),
        ("cdc chunks (zero-shuffle row-local edge HOFs)", se.q_cdc_chunks),
        ("range shards (bounded histogram fit, zero-shuffle assign)", se.q_curriculum_shards),
        ("boilerplate lines (digest df shuffle, broadcast flagged set)", se.q_boilerplate_lines),
        ("ivf upsert (batch-only assign + anti-join MERGE)", se.q_ivf_upsert),
        ("remove dup spans (digest rank shuffle, row-local cut rebuild)", se.q_remove_dup_spans),
        # round 5 (session 4) — log-ops family
        ("template mine (row-local mask, vocabulary-sized shuffle)", se.q_log_template_mine),
        ("sre triage (every stage aggregated to vocabulary before joins)", se.q_sre_triage_report),
        ("tail sampling (broadcast rate join, facts never shuffle)", se.q_template_tail_sampling),
        ("burn rate (two bounded time-bucket aggs, broadcast long side)", se.q_burn_rate_alerts),
        ("latency regression (histogram percentile, lag over daily agg)", se.q_latency_regression),
        ("erasure plan (broadcast tombstones, one day-key rollup)", se.q_erasure_plan),
        ("value outliers (histogram quartiles, broadcast fences)", se.q_value_outliers_iqr),
        ("multiline stitch (conv-key window + bounded-record assembly)", se.q_multiline_stitch),
        ("cohort retention (distinct user-day first, bounded triangle)", se.q_cohort_retention),
        ("rolling actives (explode on the distinct set, not raw events)", se.q_active_users_rolling),
        ("rate limit audit (row_number on natural user+window key)", se.q_rate_limit_audit),
        ("winnowing (one doc_id exchange, shuffle_hash frame-min join)", se.q_winnow_fingerprint_summary),
        ("winnow overlap (hot-bucket cap before the pair join)", se.q_winnow_overlap_pairs),
        ("knn outliers (within-cell pairs, shuffle_hash, loner left join)", se.q_knn_outlier_scores),
        ("zorder layout (row-local Morton, bounded file-envelope agg)", se.q_zorder_layout),
        ("session trigrams (split+id+two leads on one user exchange)", se.q_session_event_trigrams),
        ("autocorr profile (shifted self-joins on bounded minute grid)", se.q_autocorr_lag_profile),
    ]:
        print("=" * 30, name)
        q(spark, sf).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
