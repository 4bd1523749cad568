"""Central query registry — the bridge to the driver contract.

Every operator the engine implements registers here as a named
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) the equivalent ANSI SQL that DuckDB runs as the
correctness oracle. ``__spark_entry__.py`` exposes the registry to the
driver verbatim.

Conventions (enforced by tests/test_correctness.py):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- double-typed aggregates are rounded (2 dp for sums, 6 dp for
  rates/averages) on BOTH sides so order-of-accumulation float noise
  can't flip the driver's value hash;
- results are small (aggregated / top-k), never unbounded row dumps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


#: Explicit registry emission order. Downstream consumers (including
#: the external correctness runner) may evaluate a PREFIX of the
#: registry per run, so the order is a deliberate verification
#: schedule, not an accident of import statements: queries whose plans
#: changed this round, brand-new queries, and queries that have never
#: had an external-oracle row come FIRST; families re-verified most
#: recently go LAST. Every registered query MUST appear here exactly
#: once (load_all asserts both directions), so adding a query without
#: scheduling it is an error, and reordering is a one-list edit.
PRIORITY_ORDER: tuple[str, ...] = (
    # ================= round-8 prefix (50 slots) =================
    # Goal: finish the cumulative ledger and retire the stale-r1/r2
    # evidence. Slot 1 is the single never-driver-checked query (the
    # round-7 JPEG codec, which landed after the r7 window was full).
    # Slots 2-3 are the two queries whose PLANS changed this round
    # (the Theil-Sen shuffle pin and the de-collected salted join) —
    # changed plans re-verify first by policy. Slots 4-50 are the
    # head of the stale-evidence refresh queue, oldest latest-row
    # first: r1-era dedup/join rows predating the r2 rewrites, then
    # the r3-green families. After this window the oldest remaining
    # evidence is r3, and the whole registry has been driver-checked.
    "multimodal_jpeg_codec",  # new r7: baseline JPEG codec — the ONE query with no driver row ever
    "agg_theil_sen_trend",  # plan changed r8: range shuffle pinned (exchange-reuse advice)
    "join_salted_skew",  # plan changed r8: hot set stays a broadcast DataFrame, no collect
    # -- stale-evidence refresh queue (oldest latest-row first) --
    "dedup_exact",  # md5-digest rewrite (r2); r1 row stale — oldest
    "dedup_canonical_pick",
    "dedup_jaccard_pairs",
    "dedup_shingle_jaccard",
    "dedup_components",
    "dedup_simhash",
    "dedup_incremental_ingest",
    "join_star_revenue",
    "join_broadcast_dim",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_theta_size_bands",
    "join_full_outer_daily_activity",
    "join_right_outer_order_counts",
    "join_cross_grid_revenue",
    "join_selfpair_parts",
    "join_interval_overlap_activity",
    "join_literal_map_dim",
    "window_deciles",  # r3-green: two-pass ranked ntile
    "profile_constraint_checks",  # r3-green: one lazy job
    "rest_paged_scan",  # r3-green: cursor-paginated REST fetch
    "join_bucketed_colocated",  # r3-green: zero-exchange bucketed join
    "text_chunk_documents",  # r3-green: overlap chunking, md5-pinned
    "source_corrupt_records",  # r3-green: PERMISSIVE quarantine contract
    "sample_uniform_k",  # r3-green: md5-ranked portable k-sample
    "sample_split_groupsafe",  # r3-green: leakage-safe group split
    "udtf_bigram_explode",  # r3-green: Python UDTF via LATERAL
    "text_bpe_pretokenize",  # r3-green: GPT-2-style pretoken counts
    "text_pii_redact",  # r3-green: PII find/replace, content-pinned
    "text_gopher_filters",  # r3-green: per-rule quality reject funnel
    "subquery_scalar_correlated",  # r3-green: TPC-H-Q2-shape scalar subquery
    "graph_pagerank",  # r3-green: fixed-sweep PageRank
    "dedup_span_extract",  # r3-green: maximal duplicated-span islands
    "text_decontaminate",  # r3-green: train/eval 8-gram overlap gate
    "sample_mixture_weights",  # r3-green: domain-mixture quota resampling
    "text_unigram_logprob",  # r3-green: CCNet-style LM perplexity gate
    "sample_shard_shuffle",  # r3-green: portable shard permutation + pin
    "etl_zorder_layout",  # r3-green: Morton-code layout audit
    "text_collapse_repeats",  # r3-green: stutter-run squeeze
    "text_pmi_bigrams",  # r3-green: PMI collocation mining
    "agg_bloom_filter_audit",  # r3-green: relational bloom w/ FP rate
    "sample_weighted_ares",  # r3-green: portable weighted reservoir
    "agg_anomaly_mad",  # r3-green: median/MAD outliers
    "text_entropy_kl",  # r3-green: entropy + KL domain shift
    "join_range_bucketed",  # r3-green: keyless range join
    "sim_ivfpq_search",  # r3 rows-only: IVF+PQ capstone
    "sort_limit_topk",  # r3-green
    # ---- 50-entry prefix boundary (typical per-run budget) ----
    # ============ round-9 queue: remaining refreshes ============
    # The refresh queue continues in the same oldest-first order;
    # run the prefix each round until every row is r8+.
    "union_except_intersect",  # r3-green
    "sample_stratified",  # r3-green oracled
    "profile_table",  # r3-green
    "agg_bitmap_distinct",  # r3-green: exact mergeable bitmap distinct
    "profile_drift_psi",  # r3-green: PSI distribution-drift monitor
    "time_downsample_ohlc",  # r3-green: per-series OHLC candle rollup
    "dedup_fuzzy_names",  # r3-green: edit-distance dictionary dedup
    "agg_ks_drift",  # r3-green: binned two-sample KS drift
    "text_source_vocab_overlap",  # r3-green: pairwise vocabulary Jaccard
    "join_asof_next_purchase",  # r3-green: forward as-of attribution
    "agg_weighted_median",  # r3-green: exact weighted quantiles
    "text_bm25_search",  # r3-green: BM25 keyword retrieval
    "scalar_bitwise_funcs",  # r3-green: bit masks/shifts/popcount
    "window_value_range_frame",  # r3-green: numeric-distance RANGE frame
    "multimodal_audio_features",  # r3-green: WAV decode → loudness stats
    "etl_incremental_agg_merge",  # r3-green: agg merge ≡ recompute
    "etl_flatten_array",
    "etl_dict_unpivot",
    "etl_epoch_tz",
    "etl_json_normalize",
    "agg_stats",
    "agg_percentiles",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_heatmap_bins",
    "agg_having",
    "agg_histogram",
    "agg_mode_median",
    "funnel_view_click_purchase",
    "agg_conditional_filter",
    "agg_string_listagg",
    "agg_corr_covar",
    "etl_partitioned_sink",
    "source_json_roundtrip",
    "etl_epoch_roundtrip",
    "source_csv_roundtrip",
    "etl_schema_evolution",
    "scalar_map_funcs",
    "point_lookup_by_key",
    "join_stream_dim_enrich",
    "embedding_normalize",
    "curation_pipeline",
    "flagship_pricing_summary",
    "filter_predicates",
    "sim_topk_cosine",
    "sim_knn_batch",
    "sim_neardup_pairs",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_label_centroids",
    "text_token_stats",
    "text_quality_score",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_bigram_top20",
    "text_winnow_fingerprint",
    "text_tfidf_top_terms",
    "text_pack_sequences",
    "text_zipf_slope",
    "window_rank_topn",
    "window_running_sum",
    "window_moving_avg",
    "window_percent_rank_cume",
    "window_first_last_nth",
    "time_tumbling_window",
    "time_sliding_window",
    "time_session_window",
    "time_user_activity",
    "time_gapfill_locf",
    "time_trailing_week_revenue",
    "time_cohort_retention",
    "time_scd2_versions",
    "rest_publicmatches_pipeline",
    "rest_datasource_scan",
    "sql_shipping_priority",
    "subquery_exists_correlated",
    "subquery_not_in_null_semantics",
    "pivot_unpivot_roundtrip",
    "udf_zscore_median",
    "sql_recursive_months",
    "sql_pipe_syntax",
    "sql_lateral_topn",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_array_funcs",
    "scalar_json_funcs",
    "multimodal_features",
    "multimodal_framesample",
    "multimodal_resize",
    "agg_chi_square_independence",  # new r5: chi²/Cramér's V vs MI
    "agg_gini_concentration",  # new r5: Gini + Lorenz top-decile
    "agg_survival_km",  # new r5: Kaplan-Meier retention curve
    "agg_rfm_segments",  # new r5: RFM quartile grid, no ntile
    "agg_benford_digit_audit",  # new r5: first-digit DQ fraud screen
    "window_pctrank_cumedist",  # new r5: normalized-rank windows
    "funnel_conversion",  # new r5: ordered 3-step funnel
    "join_cdc_apply",  # new r5: change-feed fold, max_by state
    "time_changepoint_cusum",  # new r5: integer-exact CUSUM argmax
    "time_markov_transitions",  # new r5: transition matrix per user
    "agg_argmax_minby",  # new r4: max_by/min_by single hash agg
    "agg_mutual_information",  # new r4: MI from bounded contingency table
    "etl_compaction_binpack",  # new r4: greedy small-file compaction plan
    "etl_merge_upsert",  # r3 FAIL → integer-cents fix (58da761)
    "pretrain_corpus_recipe",  # r3 FAIL → BIGINT casts in UNION branches
    "agg_approx_percentile",  # upgraded to self-auditing oracle
    "time_interpolate_linear",  # rounding-idiom fix
    "sample_temporal_split_embargo",  # cut-rounding fix
    "dedup_shingle_containment",  # zero-word fix
    "source_orc_roundtrip",  # ORC sink/scan loss-free roundtrip
    "time_sliding_distinct_users",  # rolling 7-day distinct actives
    "time_ewma_smooth",  # closed-form EWMA, one hash agg
    "join_scd2_point_in_time",  # temporal join vs SCD2 validity
    "agg_countmin_heavyhitters",  # count-min sketch w/ visible error
    "text_bigram_lm_ppl",  # interpolated bigram LM gate
    "etl_snapshot_diff",  # lakehouse snapshot change classes
    "agg_regression_trend",  # mergeable per-group OLS trend
    "join_asof_nearest",  # bidirectional as-of, one window
    "text_url_canonicalize",  # URL canon dedup, dual parsers
    "time_session_paths",  # session path mining, ordered agg
    "agg_histogram_quantile_sketch",  # oracled mergeable quantiles
    "set_ops_all_multiplicity",  # INTERSECT/EXCEPT ALL bag semantics
    "join_null_safe_eq",  # <=> vs = NULL-key join audit
    "agg_winsorize_stats",  # tail-clamped robust moments
    "time_calendar_dim_join",  # generated calendar dim join
    "agg_higher_moments",  # shape stats from mergeable power sums
    "scalar_conditional_funcs",  # null-guard scalar surface
    "text_hashed_linear_score",  # hashed-feature classifier gate
    "dedup_minhash_lsh",  # audit via out-of-band sentinel row
    "sim_ann_ivf_kmeans",  # learned-codebook IVF
    "agg_hll_sketch_merge",  # mergeable distinct sketches
    "agg_frequent_items",  # one-pass heavy hitters
    "sim_pq_compress",  # product-quantization audit
    "sim_pq_adc_search",  # ADC top-k over PQ codes
    "sim_semantic_dedup",  # SemDeDup cluster-then-prune
    "multimodal_phash_neardup",  # dHash banded image near-dup
    "agg_hll_intersection",  # sketch set algebra w/ visible error
    "sim_recall_eval",  # recall@5 gate for the LSH index
    "time_sliding_distinct_hll",  # sketch-over-window scale path
    "graph_triangle_count",
    "sim_mmr_diversify",  # r6 rows-only-green: MMR re-rank
    "multimodal_png_codec",  # r6-green: stdlib-zlib PNG, all 5 filters
    "streaming_late_discard_audit",  # r6-green: watermark kept/dropped audit
    "streaming_watermark_frontier",  # r6-green: per-batch frontier split
    "streaming_dedup_replay_audit",  # r6-green: at-least-once dedup leak audit
    "streaming_join_state_audit",  # r6-green: stream-stream join loss audit
    "graph_label_propagation",  # r6-green: deterministic LPA communities
    "graph_link_prediction",  # r6-green: rarest-R common-neighbor index
    "ab_cuped_adjustment",  # r6-green: CUPED variance reduction
    "stats_anova_oneway",  # r6-green: fixed-order pivoted F-test
    "etl_partition_skew_audit",  # r6-green: layout skew + sizing plan
    "text_dsir_importance",  # r6-green: DSIR hashed-unigram selection
    "source_warc_scan",  # r6-green: WARC archive ingestion
    "sim_embedding_drift",  # r6-green: sign-rate drift monitor
    "text_quality_threshold_sweep",  # r6-green: curation operating points
    "graph_kcore_decomposition",  # r6-green: 3-sweep peeling
    "funnel_step_latency",  # r6-green: time-to-convert percentiles
    "attr_position_weighted",  # r6-green: U-shaped multi-touch credit
    "time_concurrency_peak",  # r6-green: interval-stabbing capacity
    "sample_bootstrap_ci",  # r6-green: Poisson bootstrap
    "agg_hhi_concentration",  # r6-green: integer-exact HHI per nation
    "time_seasonal_anomaly",  # r6-green: weekday baseline, int |z|>2
    "time_interval_coverage",  # r6-green: gaps-and-islands union length
    "graph_degree_distribution",  # r6-green: binary-length log2 bins
    "etl_vacuum_retention_plan",  # r6-green: retention/expire plan
    "agg_permutation_test",  # r6-green: md5-deterministic label test
    "agg_tail_cvar",  # r6-green: per-group VaR + shortfall
    "agg_skyline_pareto",  # r6-green: 2-D skyline in one window
    "time_burstiness",  # r6-green: Fano + Goh-Barabási B
    "source_binaryfile_scan",  # r6-green: binaryFile round-trip
    "graph_bfs_levels",  # r6-green: 4-sweep BFS, unrolled oracle
    "time_lag_xcorr",  # r6-green: lead-lag Pearson r, int sums
    "agg_mode_deterministic",  # r6-green: tie-proof portable mode
    "agg_grouping_id_rollup",  # r6-green: GROUPING() flag surface
    "time_yoy_growth",  # r6-green: lag window on yearly rollup
    "time_cohort_ltv",  # r6-green: money-dim cohort triangle
    "attr_last_touch",  # r6-green: carry-forward attribution
    "sample_balanced_downsample",  # r6-green: per-class quota
    "time_peak_detection",  # r6-green: integer-exact local maxima
    "agg_share_of_parent",  # r6-green: OLAP %-of-parent ratios
    "agg_pareto_8020",  # r6-green: integer-exact 80/20 crossing
    "udf_grouped_minmax_norm",  # r6-green: applyInPandas under an oracle
    "time_forecast_backtest",  # r6-green: seasonal-naive WAPE/bias/MAE
    "agg_fulfillment_latency",  # r6-green: SLA latency percentiles
    "agg_seasonality_strength",  # r6-green: weekday-R² model selector
    "join_basket_affinity",  # r6-green: support/confidence/lift top-20
    "time_new_vs_returning",  # r6-green: DAU growth accounting
    "time_dormancy_reactivation",  # r6-green: gap/resurrection counter
    "agg_reorder_rate",  # r6-green: repeat-purchase profile
    "time_active_streaks",  # r6-green: d - row_number islands
    # -- the round-7 window (slots 1-50 of r7, re-verified most
    #    recently of all — CORRECTNESS_r07 is 50/50 green) goes LAST --
    "streaming_session_state_audit",  # new r7: gap-4h sessionizer audit
    "stats_ttest_welch",  # new r6: pivoted Welch t + Satterthwaite df
    "stats_mann_whitney_u",  # new r6: distinct-value rank-sum, tie-corrected
    "stats_spearman_corr",  # new r6: doubled-rank Pearson, no row sort
    "source_xml_roundtrip",  # new r6: Spark-4 native XML, md5-pinned text
    "scalar_variant_funcs",  # new r6: VARIANT parse_json/variant_get surface
    "sql_udf_scalar_tvf",  # new r6: SQL-language scalar + table UDFs, inlined
    "ab_srm_guardrail",  # new r6: weekly sample-ratio-mismatch chi-square
    "graph_local_clustering",  # new r6: per-node Watts-Strogatz cc deciles
    "text_readability",  # new r6: Flesch/FK vowel-group readability
    "etl_zonemap_prune_audit",  # new r6: min/max data-skipping ledger
    "text_ngram_novelty",  # new r6: first-owner source novelty shares
    "graph_assortativity",  # new r6: Newman degree-degree Pearson
    "agg_ols_two_features",  # new r6: 2-feature normal-equation OLS + R2
    "stats_proportion_ztest",  # new r6: pooled-SE conversion z-test
    "ab_delta_method_ratio",  # new r6: linearized ratio-metric z-test
    "multimodal_gif_codec",  # new r6: from-scratch LZW GIF roundtrip
    "time_max_drawdown",  # new r6: peak-to-trough revenue risk stat
    "ab_funnel_lift",  # new r6: per-arm ordered funnel + pooled z
    "sim_matryoshka_recall",  # new r6: prefix-dim top-10 recall table
    "sample_neyman_allocation",  # new r6: optimal stratified allocation
    "time_interrupted_series",  # new r6: pre/post segmented trend (ITS)
    "text_source_similarity",  # new r6: source-pair 8-gram Jaccard top-10
    "text_compression_quality",  # new r6: deflate-ratio screen (rows-only)
    "time_autocorrelation",  # new r6: daily-revenue ACF, lags 1..14
    "sample_ht_estimator",  # new r6: stratified-Poisson HT totals
    "sim_centroid_classify_eval",  # new r6: Rocchio recall, integer centroids
    "stats_kendall_tau",  # new r6: grid-join tau-b, corpus-size-free
    "stats_runs_test",  # new r6: Wald-Wolfowitz randomness z
    "agg_chi2_cell_residuals",  # new r6: Haberman adjusted residual drill-down
    "etl_delete_rewrite_plan",  # new r6: GDPR copy-on-write amplification
    "time_rolling_median",  # new r6: robust 7-day smoother, top deviations
    "ml_calibration_error",  # new r6: reliability bins + integer-exact ECE
    "ab_power_mde",  # new r6: MDE / required-n experiment sizing
    "multimodal_pixel_histogram",  # new r6: decoded-raster intensity bins
    "graph_hits_scores",  # new r6: 2-sweep integer HITS, max-normalized
    "stats_brown_forsythe",  # new r6: robust variance-homogeneity F
    "udf_arrow_map_tokencount",  # new r6: raw-Arrow extension point
    "sql_observe_metrics",  # new r6: piggybacked DQ accumulators
    "sql_parameterized_args",  # new r6: named-parameter SQL binding
    "source_text_lines_scan",  # new r6: write.text/read.text, md5-pinned
    "time_interevent_gaps",  # new r6: log2 gap histogram per user
    "text_vocab_growth",  # new r6: Heaps-law saturation curve
    "stats_wilcoxon_signed_rank",  # new r6: paired pre/post rank test
    "agg_mcnemar_paired",  # new r6: discordant-pair flip chi-square
    "agg_capture_recapture",  # new r6: Chapman two-sample size estimate
    "stats_cochran_q",  # new r6: k=3 repeated-measures binary test
    "etl_calendar_coverage_audit",  # new r6: ingestion-gap day ledger
    "join_asof_latest_order",  # merge-form rewrite (r2); r1 row stale
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the registry ordered by ``PRIORITY_ORDER`` — the explicit
    verification schedule (see its comment). Import order is NOT
    semantically load-bearing; the assert keeps the schedule and the
    registrations in lockstep."""
    # Imports live here (not module top) so importing the registry stays
    # cheap and cycles are impossible.
    from dataextractor_spark.operators import aggregates  # noqa: F401
    from dataextractor_spark.operators import behavior  # noqa: F401
    from dataextractor_spark.operators import dedup  # noqa: F401
    from dataextractor_spark.operators import enrichment  # noqa: F401
    from dataextractor_spark.operators import etl_parity  # noqa: F401
    from dataextractor_spark.operators import graph_ops  # noqa: F401
    from dataextractor_spark.operators import joins  # noqa: F401
    from dataextractor_spark.operators import multimodal  # noqa: F401
    from dataextractor_spark.operators import relational  # noqa: F401
    from dataextractor_spark.operators import rest_source  # noqa: F401
    from dataextractor_spark.operators import sampling  # noqa: F401
    from dataextractor_spark.operators import scalars  # noqa: F401
    from dataextractor_spark.operators import similarity  # noqa: F401
    from dataextractor_spark.operators import sql_surface  # noqa: F401
    from dataextractor_spark.operators import statistics  # noqa: F401
    from dataextractor_spark.operators import streaming_audit  # noqa: F401
    from dataextractor_spark.operators import text  # noqa: F401
    from dataextractor_spark.operators import windows  # noqa: F401
    from dataextractor_spark.operators import windows_time  # noqa: F401

    missing = set(PRIORITY_ORDER) - set(_REGISTRY)
    unscheduled = set(_REGISTRY) - set(PRIORITY_ORDER)
    assert not missing and not unscheduled, (
        f"PRIORITY_ORDER out of sync: missing={sorted(missing)} "
        f"unscheduled={sorted(unscheduled)}"
    )
    return {name: _REGISTRY[name] for name in PRIORITY_ORDER}
