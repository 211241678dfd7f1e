"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Per-query timing includes plan construction + execution to a count() sink
(results are not shipped to the driver -- we are benchmarking the engine,
not py4j serialization). A warmup pass on sf0.001 triggers JVM/codegen
warmup so steady-state throughput is measured, mirroring how a long-lived
cluster behaves.
"""

from __future__ import annotations

import json
import os
import sys
import time

from automated_review_analysis_pipeline_spark.registry import QUERIES
from automated_review_analysis_pipeline_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "top_orders_per_customer",
    "doc_classify",
    "doc_sentiment_summary",
    "text_profile",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_pairs",
    "cosine_topk",
    "embedding_near_dup",
    "events_hourly",
    "sessions",
    "event_funnel",
    "survey_wide",
    "survey_summary",
    "revenue_rollup",
    "customer_set_ops",
    "cumulative_order_value",
    "asof_last_click",
    "value_range_join",
    "quality_filter_join",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_share",
    "volume_cube",
    "events_sliding",
    "label_centroids",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_prospect_balance",
    "tf_idf_top_terms",
    "order_value_percentiles",
    "totalprice_histogram",
    "chunk_documents",
    "token_budget_shards",
    "lineitem_stats",
    "cohort_retention",
    "quantize_embeddings",
    "distinct_users_per_type",
    "q15_top_supplier",
    "q21_sole_blame_supplier",
    "deterministic_split",
    "redact_pii",
    "decontaminate",
    "lang_quota_sample",
    "mix_corpus",
    "repetition_profile",
    "gap_fill_hourly",
    "rolling_user_value",
    "hourly_anomalies",
    "multimodal_features",
    "audio_features",
    "order_value_percentiles_approx",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_revenue_concentration",
    "q12_priority_lines",
    "q16_part_supplier_breadth",
    "q20_dominant_part_suppliers",
    "gopher_quality_flags",
    "ngram_topk",
    "token_freq_score",
    "semantic_dedup",
    "near_dup_components",
    "bm25_search",
    "hybrid_search",
    "hashed_vectors",
    "rolling_users_sketch",
    "corpus_source_stats",
    "event_props_struct",
    "user_event_intervals",
    "user_value_trend",
    "sample_frames",
    "user_value_ewma",
    "customer_pareto",
    "event_transitions",
    "dau_wau_stickiness",
    "table_profile",
    "near_dup_pagerank",
    "resize_thumbnails",
    "top_session_paths",
    "incremental_daily_rollup",
    "ordered_funnel",
    "totalprice_equidepth",
    "customer_rfm",
    "salted_revenue_by_nation",
    "doc_clean",
    "dup_stats",
    "event_props",
    "product_explode",
    "sentiment_normalize",
    "simhash_pairs",
    "sign_lsh_topk",
    "ivf_topk",
    "pq_topk",
    "debounce_events",
    "event_dow_chi2",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "count_min_users",
    "ab_value_report",
    "cdc_apply",
    "revenue_grouping_sets",
    "approx_distinct_users",
    "near_dup_triangles",
    "expectations_orders",
    "curate_corpus",
    "kmeans_embeddings",
    "centroid_assign",
    "containment_pairs",
    "bloom_decontaminate",
    "incremental_minhash_pairs",
    "bucketed_order_revenue",
    "portable_hll_users",
    "portable_rolling_hll",
    "zorder_codes",
    "scd2_intervals",
    "streaming_dedup",
    "portable_quantiles",
    "streaming_finalized_sessions",
    "ivf_trained_topk",
    "random_projection",
    "prototype_prune",
    "shuffle_shards",
    "boilerplate_line_dedup",
    "weighted_sample",
    "contamination_report",
    "bigram_lm_score",
    "dedup_representatives",
    "quality_filter_observed",
    "lateral_top_orders",
    "event_props_variant",
    "table_fingerprint",
    "self_line_dedup",
    "leakage_safe_split",
    "temperature_mix",
    "quality_classifier",
    "ann_recall",
    "ann_recall_ivf",
    "perplexity_filter",
    "psi_drift",
    "media_near_dup",
    "pack_sequences",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_encode",
    "pack_sequences_bpe",
    "bpe_vocab",
    "bpe_encode_ids",
    "bpe_train_bytes",
    "bpe_encode_bytes",
    "bpe_vocab_bytes",
    "bpe_encode_ids_bytes",
    "tokenizer_fertility",
    "ivf_index_probe",
    "substring_dedup",
    "curate_corpus_tokens",
    "temperature_mix_tokens",
    # round 9
    "pq_index_probe",
    "global_ids",
    "word_entropy",
    "shard_manifest",
    "table_diff",
    "length_batches",
    # round 10
    "ivfpq_index_probe",
    "ann_recall_ivfpq",
    "asof_join_attribution",
    "session_error_overlap",
    "token_offsets",
    "kmv_users_per_type",
    "kmv_type_overlap",
    "flac_features",
    "streaming_kmv_distinct",
    "streaming_asof_enrich",
    # round 11 (+ two round-10 queries that had never been benched)
    "sorted_export_manifest",
    "blocklist_matches",
    "ivfpq_residual_probe",
    "ann_recall_ivfpq_residual",
    "streaming_asof_ooo",
    "set_similarity_pairs",
    "set_similarity_incremental",
    "stratified_sample",
    "column_stats",
    "set_similarity_rs",
    "streaming_set_similarity",
    "ivfpq_rerank_topk",
    "basket_rules",
    "multi_touch_attribution",
    # round 12
    "column_stats_exact",
    "bm25_topk",
    "snapshot_drift",
    "profile_store_stats",
    "streaming_profile_stats",
    "key_skew_report",
    "join_size_estimate",
    "snapshot_drift_depth",
    "embedding_drift",
    # round 13
    "near_dup_components_incremental",
    "simjoin_components_incremental",
    "bm25_index_search",
    "simjoin_delete_pairs",
    "simjoin_delete_compacted",
    "components_delete_labels",
    "bm25_index_delete_search",
    "ivfpq_delete_probe",
    "ivfpq_rebuilt_probe",
    "key_skew_report_approx",
    "streaming_embedding_drift",
    "bm25_index_topk",
    # round 14
    "streaming_components",
    "index_stats_simjoin",
    "index_stats_components",
    "index_stats_bm25",
    "index_stats_ivfpq",
    "index_stats_profile",
]

# Deliberately NOT in the headline list: the 8 streaming_* drain variants
# (streaming_hourly/sessions/sliding/minhash_pairs/click_attribution/
# user_profiles/segment_enrich/incremental_rollup). Each is an
# availableNow drain whose wall-clock is micro-batch trigger latency, not
# engine throughput, and each shares its BATCH twin's oracle + kernel --
# the batch twins are all benched above. The streaming execution path
# itself stays represented by streaming_dedup and
# streaming_finalized_sessions (the stateful one).

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="arap-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    # Warmup: run each headline query once at the smallest sf so codegen,
    # shuffle service, and Arrow paths are hot before timing.
    for name in names:
        try:
            QUERIES[name](spark, WARMUP_SF_DIR).count()
        except Exception as e:  # pragma: no cover
            print(f"warmup {name} failed: {e}", file=sys.stderr)

    # min of 2 timed runs per query: this box is a shared VM and a single
    # run can absorb a neighbor's CPU burst; the min is the engine's cost.
    from automated_review_analysis_pipeline_spark.plan_cache import (
        release_plan_caches,
    )

    # Sub-second queries can swing +/-60% run-to-run on this shared VM;
    # when the two samples disagree by >30% a third sample is taken so
    # the recorded min stops flagging phantom regressions round-to-round.
    # The summary line reports how many queries needed the extra sample.
    # BENCH_REPEAT > 1 is the HOUSE-BENCH mode (PERF.md methodology):
    # N full passes over the suite with per-query min-merge -- the
    # min-of-N estimator that separates engine cost from this shared
    # VM's +/-35% ambient drift. The driver's per-round run keeps the
    # default (1 pass, min-of-2-samples per query).
    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "1")))
    timings: dict[str, float] = {}
    n_extra_samples = 0
    for _pass in range(repeat):
        for name in names:
            samples: list[float] = []
            failed = False
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, sf_dir).count()
                    samples.append(round(time.perf_counter() - t0, 3))
                except Exception as e:  # pragma: no cover
                    print(f"bench {name} failed: {e}", file=sys.stderr)
                    failed = True
                    break
            if not failed and len(samples) == 2 \
                    and max(samples) > 1.3 * max(min(samples), 1e-9):
                n_extra_samples += 1
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, sf_dir).count()
                    samples.append(round(time.perf_counter() - t0, 3))
                except Exception as e:  # pragma: no cover
                    print(f"bench {name} failed: {e}", file=sys.stderr)
            this = min(samples) if samples and not failed else -1.0
            prev = timings.get(name)
            if prev is None or prev < 0 or (0 <= this < prev):
                timings[name] = this
            # drop plan-embedded caches between queries: keeps the
            # session's cache footprint flat and stops cross-query
            # InMemoryRelation substitution from flattering later
            # timings
            release_plan_caches()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Output framing (round 16 measurement-contract fix, documented in
    # OPTIMIZATION_r16.md): the driver's stdout capture keeps only a
    # ~2000-char TAIL, so the single ~6 KB per-query line of earlier
    # rounds was truncated mid-dict in BOTH compared rounds and
    # PERF_r14/r15 ended up with per_query == {} (BENCH_r02 lesson,
    # re-diagnosed in VERDICT r15 item 2). Emit, in order:
    #   1. the FULL contract line (metric/value/unit/queries/sf) --
    #      complete per-query map for full-capture parsers and the house
    #      tools (tools/bench_compare.py reads this first line);
    #   2. short CHUNK lines, each a complete JSON object carrying a
    #      ~12-entry "queries" slice -- a tail-window parser that merges
    #      every parseable line recovers as many chunks as fit;
    #   3. the summary line LAST, exactly as before PLUS a "queries"
    #      subset of the slowest queries packed to keep the line under
    #      ~1800 bytes, so even a last-line-only parser inside a
    #      2000-char tail window gets a non-empty, comparison-worthy
    #      per-query map (slowest queries are where optimization shows).
    # Timing methodology, query set, and the summary's existing keys are
    # unchanged.
    print(json.dumps({
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }, separators=(",", ":")))
    items = list(timings.items())
    for i in range(0, len(items), 12):
        print(json.dumps({
            "metric": "headline_queries_wall_clock",
            "part": i // 12 + 1,
            "parts": (len(items) + 11) // 12,
            "queries": dict(items[i:i + 12]),
            "sf": sf,
        }, separators=(",", ":")))
    summary = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_extra_samples": n_extra_samples,
    }
    slowest: dict[str, float] = {}
    budget = 1800 - len(json.dumps(summary, separators=(",", ":")))
    for name, t in sorted(items, key=lambda kv: -kv[1]):
        cost = len(json.dumps({name: t}, separators=(",", ":")))
        if budget - cost < 0:
            break
        budget -= cost
        slowest[name] = t
    summary["queries"] = slowest
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
