#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full computation, no
driver-side collect) so the number measures the distributed plan, not
result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

from team_aragon_spark.plans.star_queries import QUERY_REGISTRY
from team_aragon_spark.session import get_spark

# Headline set: one per workload family, weighted toward the shapes
# that dominate at 100 TB (joins, window dedup, LSH dedup, ANN, events).
HEADLINE = [
    "q01_week_count",                # filtered scan/count
    "q04_recent_weeks_totals",       # grouped multi-agg + top-k
    "q05_revenue_ratio_by_segment",  # flagship: 3-way join + ratio agg
    "q08_priority_month_ratio",      # big-big join + 2-key agg
    "q12_first_line_per_order",      # window dedup
    "q13_customers_without_orders",  # anti join
    "q18_token_counts",              # text projection
    "q20_quality_scores",            # text feature pipeline
    "q22_ann_cosine_topk",           # brute-force ANN
    "q24_minhash_neardup_pairs",     # MinHash-LSH near-dup (linear path)
    "q27_hourly_event_stats",        # windowed event agg
    "q29_user_sessions",             # sessionization (2 window passes)
    "q33_distinct_users_by_type",    # exact distinct agg
    "q36_multimodal_meta",           # mapInPandas plumbing
    "q40_asof_last_click_before_purchase",  # as-of join (union-merge)
    "q41_clicks_within_day_of_error",       # range join (bucketed)
    "q42_srp_lsh_neardup_pairs",            # cosine-LSH near-dup
]

# Round-2 families, reported under "extra" (not in the headline total):
EXTRA = [
    "q63_md5_minhash_signatures",   # portable MinHash
    "q65_partitioned_month_revenue",  # partition-pruned star agg
    "q66_tfidf_top_terms",          # tf-idf
    "q68_doc_token_chunks",         # context-window chunking
    "q74_benchmark_contamination",  # decontamination join
    "q76_unigram_logprob_score",    # perplexity-proxy scoring
    # round-4 families:
    "q92_audio_wav_meta",           # real WAV synth+decode round-trip
    "q93_token_budget_packing",     # sequence packing (window cumsum)
    "q95_user_last_event_state",    # latest-wins compaction (max_by)
    "q96_funnel_conversion",        # ordered funnel (2 aggregates)
    "q100_hourly_gap_fill",         # dense-grid resampling (sequence+explode)
    # round-5 families:
    "q97_incremental_neardup",      # batch-vs-index LSH dedup
    "q98_session_transcripts",      # sessionize + array_sort transcript
    "q103_video_mp4_meta",          # real MP4 synth+box-parse round-trip
    "q110_passage_dedup_reassembly",  # passage-level dedup + reassembly
    "q111_epoch_shard_plan",        # deterministic epoch-shuffle layout
    "q113_pq_codes",                # product-quantization encode
    "q116_bm25_search",             # BM25 retrieval top-k
    "q120_image_ahash_clusters",    # PNG decode + perceptual-hash dedup
    "q121_audio_signal_features",   # per-sample WAV feature extraction
    "q122_value_trend_stats",       # stat-aggregate family
    "q123_token_bigram_counts",     # BPE-merge-style bigram counting
    "q126_weighted_doc_sample",     # deterministic weighted sampling
    "q127_basket_set_similarity",   # exact prefix-filter set-sim join
    "q128_state_snapshot_diff",     # snapshot CDC diff
    "q130_source_token_kl",         # per-source KL divergence
    "q132_trade_pagerank",          # iterative weighted PageRank
    "q133_portable_winnowing",      # true window-min winnowing
    "q134_per_source_weighted_sample",  # stratified weighted sampling
    "q135_lineitem_corr_matrix",    # one-scan correlation matrix
    "q136_bpe_merge_training",      # oracle-verified BPE training loop
    "q137_bpe_token_counts",        # tokenizer-aware token accounting
    "q138_hybrid_rrf_retrieval",    # BM25 + dense RRF hybrid search
    "q139_user_value_twap",         # time-weighted average (lead window)
    "q140_linear_touch_attribution",  # two-phase credit distribution
    "q141_value_psi_drift",         # PSI drift (chi2/KL/PSI trio)
    "q142_key_skew_profile",        # heavy-hitter share per key column
    "q143_ab_conversion_ztest",     # experimentation z-test
    "q144_zorder_layout_keys",      # Morton/Z-order clustering keys
    "q145_dau_wau_stickiness",      # rolling-distinct active users
    "q146_period_contribution",     # metric-move decomposition
    "q147_event_markov_transitions",  # behavioral transition matrix
    "q148_zonemap_skipping_audit",  # layout/data-skipping audit
    "q149_doc_ngram_novelty",       # memorization/boilerplate signal
    "q150_source_overlap_matrix",   # cross-source contamination matrix
    # round-6 families:
    "q152_winnowing_fast",          # xxhash64 engine twin of q133
    "q153_minhash_signatures_fast", # xxhash64 engine twin of q63
    "q154_event_value_percentiles", # exact distributed percentiles
    "q155_trade_triangle_enum",     # degree-oriented triangle enumeration
    "q156_bigram_lm_scores",        # bigram-LM quality scoring
    "q157_mad_robust_outliers",     # robust MAD outlier screen
    "q158_doc_containment_pairs",   # directed containment dedup
    "q159_containment_fast",        # hashed-shingle containment twin
    "q160_error_rate_control_chart",  # SPC p-chart screen
    "q161_source_token_entropy",    # per-source entropy/perplexity
    "q162_doc_ngram_novelty_fast",  # hashed-gram novelty twin
    "q163_cms_heavy_hitters",       # portable count-min sketch
    "q164_portable_hll_distinct",   # portable HyperLogLog
    "q165_curation_pipeline",       # end-to-end curation DAG
    "q166_pq_codes_portable",       # oracle-replayable PQ training
    "q167_bloom_membership",        # portable Bloom filter
    "q169_partition_checksums",     # per-partition digest audit
    "q170_delta_join_view_maintenance",  # join-view IVM
    "q171_seasonal_residual_anomaly",    # hour-of-day baseline screen
    "q172_histogram_sketch_quantiles",   # mergeable quantile sketch
    "q173_join_size_cms_estimate",  # CMS inner-product join sizing
    "q174_table_stats_one_pass",    # one-scan ANALYZE column stats
    "q175_ann_recall_audit",        # IVF recall@10 vs ground truth
    "q176_k_anonymity_generalization",   # privacy generalization ladder
    "q177_hll_set_algebra",         # merged-sketch union/intersection
    "q178_grouped_ols_regression",  # sufficient-statistics least squares
    "q179_time_decay_engagement",   # half-life decayed feature scores
    "q180_kmv_distinct_sketch",     # k-minimum-values NDV + union algebra
    "q181_copurchase_bfs_hops",     # iterative frontier BFS vs recursive oracle
    "q182_daily_order_autocorrelation",  # lag-k ACF on zero-filled series
    "q183_part_pareto_skyline",     # 2-D skyline via bounded-domain reduction
    "q184_activity_streaks",        # gaps-and-islands longest streaks
    "q185_referential_usage_audit", # FK orphan / unreferenced-parent audit
    "q186_copurchase_kcore",        # fixed-round k-core peeling
    "q187_phrase_positional_search",     # map-side positional phrase index
    "q188_peak_concurrency_sweep",  # interval sweep-line peaks
    "q189_copurchase_association_rules", # support/confidence/lift rules
    "q190_greedy_coverage_selection",    # greedy max-coverage curation
    # round-7 batches 7-8:
    "q191_user_activity_bitmap",    # bit_or/bit_count engagement bitmaps
    "q192_dq_constraint_suite",     # Deequ-style one-scan DQ verdicts
    "q193_mann_whitney_utest",      # rank-sum test via count table
    "q194_bipartite_hits",          # integer-exact HITS power iteration
    "q195_pmi_collocations",        # PMI phrase mining (integer ranking)
    "q196_session_path_analysis",   # session entry-path funnel discovery
    "q197_capped_running_balance",  # non-associative scan (mapInPandas)
    "q198_benford_digit_audit",     # Benford first-digit forensics
    "q199_hourly_crosscorrelation", # lagged click->purchase correlation
    "q200_funnel_latency_quantiles",  # time-to-convert percentiles
    "q201_token_zipf_fit",          # Zipf power-law OLS fit
    "q202_rfm_segmentation",        # R/F/M quintile scoring
    "q203_label_medoids",           # exact per-label medoid (label-bounded)
    "q204_interarrival_burstiness", # arrival-process burstiness index
    "q205_cohort_ltv_curves",       # cohort LTV cumulative curves
    "q206_revenue_concentration",   # exact Gini + top-20% share
    "q207_centroid_medoid_proxy",   # linear medoid proxy (100 TB path)
    "q208_order_volume_changepoint",  # CUSUM change-point detection
    "q209_part_abc_classification", # ABC Pareto classifier
    "q210_negative_sampling",       # LCG contrastive negatives
    "q211_degree_assortativity",    # graph mixing coefficient
    "q212_ks_two_sample_test",      # Kolmogorov-Smirnov D
    "q213_markov_heldout_accuracy", # train/test model evaluation
    "q214_feature_hashing",         # hashing-trick featurizer
    "q215_source_quantile_normalization",  # per-source rank normalize
    "q216_copurchase_link_prediction",     # common-neighbor Jaccard
    "q217_prediction_calibration",  # reliability diagram / ECE
    "q218_mann_kendall_trend",      # non-parametric trend test
    "q219_hash_bootstrap_ci",       # deterministic Poisson bootstrap
    "q221_point_in_time_feature_join",  # SCD2 PIT join (zero-join as-of)
    "q222_process_conformance",     # session-signature rule audit
    # (q220 is a streaming drain — excluded like q46/q47: its wall is
    # source staging, not engine work)
    "q223_wasserstein_value_drift", # earth-mover drift in value units
    "q224_daily_order_peaks",       # local-maxima spike screen
    "q225_theil_sen_slope",         # robust median-of-slopes trend
    "q226_windowed_funnel",         # time-windowed funnel depths
    "q227_weighted_quantiles",      # unit-weighted price percentiles
    "q228_kaplan_meier_survival",   # right-censored churn curve
    "q229_ses_forecast",            # exponential-smoothing fold
    "q230_forecast_backtest",       # rolling-origin MAE/RMSE
    "q231_misra_gries_heavy_hitters",  # two-pass exact heavy hitters
    "q232_llr_keywords",            # Dunning G2 keyword extraction
    "q233_spearman_corr",           # tie-aware rank correlation
    "q234_yoy_growth",              # segment YoY revenue report
    "q235_l_diversity_audit",       # sensitive-attribute diversity
    "q236_langid_prf1",             # per-class precision/recall/F1
    "q237_weighted_shortest_path",  # Bellman-Ford relaxation rounds
    "q238_mutual_nn_pairs",         # reciprocal-top-1 mining (brute pin)
    "q239_info_gain_split",         # decision-stump feature selection
    "q240_popularity_rec_hitk",     # leave-last-out recommender eval
    "q241_holt_trend_forecast",     # double exponential smoothing
    "q242_session_path_taxonomy",   # transcript edit-distance matrix
    "q243_robust_means",            # trimmed/winsorized means
    "q244_event_burst_compaction",  # retry-storm burst accounting
    "q245_activity_lease_coverage", # interval-union lease coverage
    "q246_label_propagation_communities",  # sync LPA communities
    "q247_ams_f2_sketch",           # AMS F2 self-join-size sketch
    "q248_entity_resolution_scoring",  # blocked Fellegi-Sunter linkage
    "q249_watermark_delay_audit",   # lateness quantiles -> watermark size
    "q250_weekday_seasonal_decomposition",  # trend/seasonal/remainder split
    "q251_spatial_radius_join",     # grid-bucketed points-within-r join
    "q252_ann_ndcg_eval",           # graded IVF ranking quality
    "q253_doc_readability_scores",  # Flesch reading-ease gate
    "q254_woe_feature_encoding",    # weight-of-evidence + IV
    "q255_column_encoding_advisor", # NDV/entropy/run-length layout pick
    "q256_knn_loo_classifier_eval", # label-quality kNN audit
    "q257_markov_removal_attribution",  # channel removal effects
    "q258_power_iteration_pca",     # top principal component
    "q259_simpsons_paradox_screen", # stratification-reversal audit
    "q260_cohort_retention_triangle",   # product-analytics retention
    "q261_geometric_median_weiszfeld",  # iterative robust center
    "q262_scd2_state_intervals",    # event stream -> validity intervals
    "q263_weekly_trending_parts",   # top-k movers with rank shifts
    "q264_knn_ivf_loo_fast",        # IVF-blocked kNN LOO (q256 twin)
    "q265_orderkey_gap_audit",      # bucketed key-sequence gap audit
    "q266_fulfillment_lead_time",   # ship-minus-order SLA percentiles
    # round-8 families:
    "q267_curation_pipeline_v2",    # passage dedup + greedy coverage DAG
    "q268_cuped_experiment_readout",  # CUPED variance-reduced experiment
    "q269_embedding_centroid_drift",  # per-label embedding drift monitor
    "q270_knn_ivf_loo_arrow",       # Arrow-kernel IVF kNN twin (10x q264)
    "q271_retrieval_eval_pipeline", # hybrid RRF + NDCG eval composed DAG
    "q272_difference_in_differences",  # DiD quasi-experimental estimator
    "q273_lsh_recall_audit",        # md5-LSH recall/precision vs exact truth
    # round-9 families:
    "q274_lsh_recall_audit_sampled",  # q273 on the fixed-size production sample
    "q275_split_leakage_audit",       # near-dup pairs crossing split boundaries
    "q276_dedup_cluster_size_histogram",  # dedup-health cluster-mass readout
    "q277_source_effective_size",     # duplicate-aware mixture budgeting
    "q278_langid_cohens_kappa",       # chance-corrected classifier agreement
    "q279_lsh_s_curve",               # banding recall curve vs analytic S-curve
    "q280_quality_curriculum_stages", # quartile curriculum staging
    "q281_experiment_power_mde",      # minimum-detectable-effect readout
    # late-round-9 families:
    "q282_kmeans_lloyd",              # portable Lloyd k-means iteration
    "q283_dsir_importance_weights",   # DSIR hashed-unigram data selection
    "q284_vocab_oov_coverage",        # vocabulary/tokenizer coverage audit
    "q285_t_closeness_audit",         # privacy EMD over the bin domain
    "q286_compaction_bin_packing",    # lakehouse compaction planner
    "q287_truncation_recall_audit",   # Matryoshka-truncation recall
    "q288_cluster_mixture_plan",      # cluster-source mixture readout
    "q289_budgeted_mixture_waterfill",  # closed-form water-fill allocation
    "q290_curation_pipeline_v3",      # DSIR gate -> dedup -> water-fill DAG
    "q291_streaming_psi_drift",       # streaming PSI drift monitor
    "q292_reshard_migration_audit",   # mod vs range reshard move fraction
    "q293_srm_check",                 # daily sample-ratio-mismatch chi2
    "q294_schema_drift_audit",        # weekly new-JSON-key monitor
    "q295_ivfpq_search_eval",         # IVF+PQ ADC search, end-to-end recall
    "q296_two_stage_rerank_eval",     # truncated shortlist -> full re-rank
    "q297_logreg_domain_classifier",  # in-engine logistic-regression GD
    "q298_dsir_selection_auc",        # exact tie-aware AUC of the DSIR signal
    "q299_pretraining_data_card",     # per-source corpus release summary
    "q300_join_strategy_advisor",     # measured-stats join-strategy gates
    "q301_aa_test_calibration",       # 8-salt A/A placebo z calibration
    "q302_dedup_threshold_sensitivity",  # pair/involvement curve by threshold
    "q304_hard_negative_mining",      # contrastive triplet miner per anchor
    "q305_tokenizer_fertility_by_lang",  # BPE fertility equity by language
    "q306_fuzzy_decontamination",     # near-dup decontam vs benchmark sample
    "q307_vocab_growth_heaps",        # Heaps-law vocabulary growth + fit
    "q308_curriculum_grid",           # quality x length 2-D planning grid
    "q309_cross_language_dup_audit",  # identical text across language labels
    "q310_dsir_selection_depth",      # per-source selection-weight quartiles
    # round-10 families:
    "q311_repeated_substring_dedup",  # sliding-gram ExactSubstr span audit
    "q312_semantic_dedup",            # SemDeDup cluster-blocked prune
    "q313_quality_ensemble_gate",     # 3-signal per-source-median vote gate
    "q314_label_propagation_gated",   # size-gated broadcast-label LPA
    "q315_exact_substring_dedup_apply",  # ExactSubstr removal + reassembly
    "q316_substring_window_sensitivity",  # coverage curve vs gram window
    "q317_curation_pipeline_v4",      # substring-clean -> water-fill funnel
    "q318_semantic_dedup_arrow",      # SemDeDup via Arrow kernels (q312 twin)
    "q319_good_turing_unseen_mass",   # freq-of-freq table + unseen mass
    "q320_boilerplate_source_attribution",  # who repeats whose text
    # round-11 families:
    "q321_incremental_exact_substring",  # batch vs stored gram index
    "q322_incremental_exact_substring_apply",  # incremental removal+reassembly
    # q303 shares q276/q277's CC-round-dominated profile (~35 s at
    # sf0.1) and is ledgered in PLANS.md rather than timed per-run.
]

# Work-bound oracle pins: deliberately-linear md5/gram-string
# formulations kept registered so DuckDB can reproduce their values;
# the benchmarked formulations are their fast engine twins (q153,
# q152, q159).  Excluded from the default extra path so the bench
# reflects the engine's real speed (PLANS.md records both) — set
# SPARK_GRAFT_BENCH_PINS=1 to time them anyway.
ORACLE_PIN_SKIP = {
    "q63_md5_minhash_signatures",
    "q133_portable_winnowing",
    "q158_doc_containment_pairs",
    # q273's exact ground truth at threshold 0.3 is work-bound by
    # design (the prefix filter barely prunes at the audit's lowest
    # threshold); at corpus scale the audit runs on a sample, so the
    # full-corpus form stays out of the default bench like the other
    # audit pins.
    "q273_lsh_recall_audit",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    # Comma-separated query names to skip — for manual scaled runs only
    # (e.g. q63, the deliberately-linear portable-oracle pin, at 100x).
    # The driver never sets this; skipping a HEADLINE query breaks
    # round-over-round comparability of `value`.
    skip = set(filter(None, os.environ.get("SPARK_GRAFT_SKIP", "").split(",")))
    if not os.environ.get("SPARK_GRAFT_BENCH_PINS"):
        skip |= ORACLE_PIN_SKIP
    spark = get_spark("team-aragon-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session so startup cost is not attributed to q1, and
    # the Python UDF workers (pandas import, Arrow channel) so q36
    # measures the decode plumbing rather than interpreter startup.
    spark.range(1).count()

    def _noop(batches):
        yield from batches

    spark.range(64).repartition(8).mapInPandas(_noop, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Two passes per query: pass 1 includes one-time costs (codegen
    # compile, file listing, JIT); pass 2 is the steady-state plan
    # execution.  `value` is the steady-state total (what a resident
    # engine process costs per query); `cold_total` records the
    # first-run total for transparency.
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        if name in skip:
            continue
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        cold[name] = round(runs[0], 3)
        steady[name] = round(min(runs), 3)
        # queries that persist() intermediates (LSH shingles, tf) manage
        # lifetime per-invocation via the caller: drop cached blocks so
        # repeated queries can't accumulate executor-storage pressure
        spark.catalog.clearCache()
        print(f"  {name}: cold {cold[name]}s steady {steady[name]}s", file=sys.stderr)

    # Round-2 operator families, timed separately so the headline total
    # stays directly comparable round-over-round.
    extra_steady: dict[str, float] = {}
    for name in EXTRA:
        if name in skip:
            continue
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        extra_steady[name] = round(min(runs), 3)
        spark.catalog.clearCache()
        print(f"  {name}: steady {extra_steady[name]}s", file=sys.stderr)

    total = round(sum(steady.values()), 3)
    compact = {
        "metric": "headline_queries_total_wall_steady",
        "value": total,
        "unit": "sec",
        "queries": steady,
        "cold_total": round(sum(cold.values()), 3),
        "sf": sf,
    }
    # The 150+-entry extra dict outgrew the driver's stdout-tail JSON
    # capture (BENCH_r07 recorded parsed:null) — the per-family
    # timings go to committed side files + stderr, and the compact
    # headline line is the LAST thing on stdout.  Default run writes
    # only the rolling BENCH_EXTRA.json (latest run); the round-stamped
    # BENCH_FULL_r{N}.json is written ONLY behind --round-stamp, so a
    # post-stamp driver/judge bench run can never clobber the committed
    # idle-box record for the round (it happened in r10: the committed
    # 9.815 s record was silently replaced by a 12.081 s post-sweep
    # run — r10 VERDICT item 3).  N = 1 + the highest driver-committed
    # BENCH_r*.json.
    repo = os.path.dirname(os.path.abspath(__file__))
    targets = ["BENCH_EXTRA.json"]
    if "--round-stamp" in sys.argv[1:]:
        import glob
        import re

        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
        ]
        targets.append(f"BENCH_FULL_r{(max(rounds, default=0) + 1):02d}.json")
    for fname in targets:
        try:
            with open(os.path.join(repo, fname), "w") as f:
                json.dump({**compact, "extra": extra_steady}, f, indent=1)
        except OSError as exc:  # read-only checkout: stderr still has it
            print(f"  {fname} not written: {exc}", file=sys.stderr)
    print(json.dumps({"extra": extra_steady}), file=sys.stderr)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
