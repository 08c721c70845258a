"""Frozen recompute/contract-coverage inventory (VERDICT r8 task 2).

The DuckDB differential proves Spark == DuckDB, not Spark == truth: a
wrong formula shared by both texts hashes green (the r7 bartlett
incident — a shared n^2(n-1) denominator). The mitigation is an
INDEPENDENT check per key: a *recompute* replay (numpy/pandas
re-derivation from the raw fixture, tests/test_stats.py /
test_recompute.py / test_properties.py) or a *contract* test (named
recall/bound/exactness invariants). 118 keys carry neither — they are
engine-primitive compositions where the Spark and DuckDB texts are
independently-written built-ins, so the differential is already two
derivations; each such key is pinned below under a structural-family
justification.

This file freezes the full registry inventory — 433 keys as of r14
(the rows-only-set precedent,
test_registry.test_rows_only_set_is_frozen): EVERY
registered key must appear in exactly one of _COVERED /
_DIFFERENTIAL_ONLY. Registering a new operator without deciding its
independent-check story fails test_every_key_has_a_coverage_class —
the author must either write a recompute/contract test (and list it
in _COVERED) or make the differential-only claim explicit here, in
the same commit, where the diff is visible to review. The
differential-only set can therefore never grow silently.
"""

from engine.registry import all_queries

# Structural reasons a key may legitimately live on the differential
# alone. A tag used by _DIFFERENTIAL_ONLY must exist here and be
# non-empty (mirrors the plan-guard key->justification dicts).
_FAMILY_JUSTIFICATION = {
    "primitive-composition": (
        "engine-primitive composition (join/filter/agg/sort built-ins):"
        " the Spark DataFrame text and the DuckDB SQL text are"
        " independently written programs over independently implemented"
        " engines - the differential is already two derivations of the"
        " same relational spec, and there is no derived formula to"
        " recompute beyond what the primitives define"
    ),
    "scalar-builtin": (
        "scalar built-in exercise (string/date/math/json functions):"
        " output is the built-in's value; the cross-engine agreement of"
        " two independent implementations is the strongest available"
        " check short of re-implementing the function a third time"
    ),
    "window-builtin": (
        "window built-in exercise (rank/lag/frame semantics):"
        " independent primitive texts on both engines; no derived"
        " formula beyond the window spec itself"
    ),
    "streaming-differential": (
        "for a STREAMING key the oracle comparison IS the independent"
        " check: micro-batch replay final state vs an independent batch"
        " engine's answer is stream-vs-batch equivalence by"
        " construction; windowed/stateful semantics additionally"
        " exercised in tests/test_streaming.py"
    ),
    "hash-counting": (
        "content-addressed hash counting (md5-keyed splits/shards/"
        "samples): both engines compute the same documented hash"
        " expression; the property under test is the split/sample"
        " SHAPE, which the differential row-set equality pins exactly"
    ),
    "token-byte-counting": (
        "counting/heuristic shape over tokens/bytes: no derived"
        " formula - the output is definitionally the count the"
        " independently-written SQL also states"
    ),
    "counting-selection": (
        "counting/selection shape (first/last/min/max/exists): the"
        " differential pins the selected rows exactly; nothing to"
        " recompute"
    ),
    "udf-plumbing": (
        "UDF-surface plumbing key: the operator's contract is the"
        " UDF execution surface itself (scalar/pandas/grouped/arrow);"
        " output is the input passed through a documented identity or"
        " trivial transform the SQL restates"
    ),
    "roundtrip-identity": (
        "roundtrip identity: serialize-then-read-back equality against"
        " the source table is itself the independent check (any codec"
        " or schema drift breaks row equality)"
    ),
    "tpch-shape": (
        "TPC-H join/agg shape with published reference semantics;"
        " independent primitive texts on both engines"
    ),
}

# key -> structural-family tag (see _FAMILY_JUSTIFICATION)
_DIFFERENTIAL_ONLY = {
    # -- counting-selection (0: all replayed in r9, tests/test_recompute.py) --
    # -- hash-counting (0: all replayed in r9, tests/test_recompute.py) --
    # -- roundtrip-identity (4) --
    "q_source_csv_roundtrip": "roundtrip-identity",
    "q_source_json_roundtrip": "roundtrip-identity",
    "q_sink_partition_prune": "roundtrip-identity",
    "q_source_schema_evolution": "roundtrip-identity",
    # -- scalar-builtin (0: all replayed in r9 third wave — python stdlib as the third implementation) --
    # -- streaming-differential (11; anomaly/median/pipeline
    # additionally carry formula replays in test_recompute.py —
    # z-score, lower-median, traffic share — on top of the
    # stream-vs-batch equivalence that classifies them here) --
    "q_stream_median": "streaming-differential",
    "q_stream_pipeline": "streaming-differential",
    "q_stream_sliding": "streaming-differential",
    "q_stream_dedup": "streaming-differential",
    "q_stream_join": "streaming-differential",
    "q_stream_stream_join": "streaming-differential",
    "q_stream_bars": "streaming-differential",
    "q_stream_anomaly": "streaming-differential",
    "q_stream_python_source": "streaming-differential",
    "q_stream_cdc_apply": "streaming-differential",
    "q_stream_topk": "streaming-differential",
    # -- tpch-shape (0: q12 replayed in r9) --
    # -- udf-plumbing (7; pandas_agg/grouped_map additionally carry
    # formula replays in test_recompute.py — weighted mean, group
    # z-score — on top of the execution-surface contract that
    # classifies them here) --
    "q_udf_scalar": "udf-plumbing",
    "q_udf_pandas_scalar": "udf-plumbing",
    "q_udf_pandas_agg": "udf-plumbing",
    "q_udf_grouped_map": "udf-plumbing",
    "q_udf_map_batches": "udf-plumbing",
    "q_udf_map_arrow": "udf-plumbing",
    "q_udtf_arrow": "udf-plumbing",
    # -- window-builtin (0: all replayed in r9 second wave) --
}

# key -> where its independent check lives
_COVERED = {
    "q_abc_xyz": "recompute: test_stats.py",
    "q_price_elasticity": "recompute: test_stats.py",
    "q_basket_sequential": "recompute: test_stats.py",
    "q_events_burstiness": "recompute: test_stats.py",
    "q_forecast_mase": "recompute: test_stats.py",
    "q_text_compression": "recompute: test_stats.py",
    "q_seasonality_strength": "recompute: test_stats.py",
    "q_eval_calibration": "recompute: test_stats.py",
    "q_stats_qte": "recompute: test_stats.py",
    "q_stats_winsorized": "recompute: test_stats.py",
    "q_sample_kfold": "recompute: test_stats.py",
    "q_win_mfi": "recompute: test_stats.py",
    "q_doc_novelty": "recompute: test_stats.py",
    "q_embed_silhouette": "recompute: test_stats.py",
    "q_win_pairs_spread": "recompute: test_stats.py",
    "q_agg_geomean": "recompute: test_stats.py",
    "q_text_script_mix": "recompute: test_stats.py",
    "q_win_donchian": "recompute: test_stats.py",
    "q_win_keltner": "recompute: test_stats.py",
    "q_stats_levene": "recompute: test_stats.py",
    "q_dedup_span": "recompute: test_stats.py",
    "q_win_adx": "recompute: test_stats.py",
    "q_win_cci": "recompute: test_stats.py",
    "q_win_aroon": "recompute: test_stats.py",
    "q_win_williams_r": "recompute: test_stats.py",
    "q_stats_cramers_v": "recompute: test_stats.py",
    "q_win_vortex": "recompute: test_stats.py",
    "q_win_cmo": "recompute: test_stats.py",
    "q_win_dpo": "recompute: test_stats.py",
    "q_win_ultimate": "recompute: test_stats.py",
    "q_win_force_index": "recompute: test_stats.py",
    "q_stats_cohens_d": "recompute: test_stats.py",
    "q_stats_theil_u": "recompute: test_stats.py",
    "q_eval_confusion": "recompute: test_stats.py",
    "q_eval_brier": "recompute: test_stats.py",
    "q_embed_dim_stats": "recompute: test_stats.py",
    "q_vocab_coverage": "recompute: test_stats.py",
    "q_stats_bootstrap": "recompute: test_stats.py",
    "q_stats_permutation": "recompute: test_stats.py",
    "q_stats_mcnemar": "recompute: test_stats.py",
    "q_price_index": "recompute: test_stats.py",
    "q_graph_kcore": "recompute: test_stats.py",
    "q_tokenize_vocab_prune": "recompute: test_stats.py",
    "q_sim_mmr": "recompute: test_stats.py",
    "q_market_concentration": "recompute: test_stats.py",
    "q_embed_ivf_recall": "recompute: test_stats.py",
    "q_eval_gains": "recompute: test_stats.py",
    "q_embed_pq": "recompute: test_stats.py",
    "q_agg_ddsketch": "recompute: test_stats.py",
    "q_sim_pairwise": "contract: test_llm_ops.py, test_plans.py, test_registry.py",
    "q_embed_matryoshka": "recompute: test_stats.py",
    "q_dedup_jaccard": "contract: test_llm_ops.py, test_pipeline.py, test_registry.py",
    "q_dedup_ngram": "contract: test_llm_ops.py, test_registry.py",
    "q_dedup_containment": "contract: test_llm_ops.py, test_registry.py",
    "q_sample_weighted": "recompute: test_stats.py",
    "q_backtest_sma": "recompute: test_stats.py",
    "q_audit_duplicates": "recompute: test_stats.py",
    "q_embed_drift": "recompute: test_stats.py",
    "q_stats_shrinkage": "recompute: test_stats.py",
    "q_regime_transitions": "recompute: test_stats.py",
    "q_revenue_waterfall": "recompute: test_stats.py",
    "q_dedup_span_coverage": "recompute: test_stats.py",
    "q_text_fightin_words": "recompute: test_stats.py",
    "q_stats_fdr_bh": "recompute: test_stats.py",
    "q_quality_referential": "recompute: test_stats.py",
    "q_win_efficiency_ratio": "recompute: test_stats.py",
    "q_graph_assortativity": "recompute: test_stats.py",
    "q_stats_tost": "recompute: test_stats.py",
    "q_stats_kruskal_wallis": "recompute: test_stats.py",
    "q_stats_friedman": "recompute: test_stats.py",
    "q_eval_f1_sweep": "recompute: test_stats.py",
    "q_win_elder_ray": "recompute: test_stats.py",
    "q_win_heikin_ashi": "recompute: test_stats.py",
    "q_stats_bartlett": "recompute: test_stats.py",
    "q_orders_backlog": "recompute: test_stats.py",
    "q_privacy_ldiversity": "recompute: test_stats.py",
    "q_text_code_detection": "recompute: test_stats.py",
    "q_observe_metrics": "recompute: test_stats.py",
    "q_win_kama": "recompute: test_stats.py",
    "q_eval_ks": "recompute: test_stats.py",
    "q_funnel_latency": "recompute: test_stats.py",
    "q_segment_migration": "recompute: test_stats.py",
    "q_win_volume_profile": "recompute: test_stats.py",
    "q_stats_dunn": "recompute: test_stats.py",
    "q_eval_mrr": "recompute: test_stats.py",
    "q_win_choppiness": "recompute: test_stats.py",
    "q_source_text_roundtrip": "recompute: test_stats.py",
    "q_embed_kmeans": "recompute: test_stats.py",
    "q_graph_distances": "recompute: test_stats.py",
    "q_stats_wilcoxon": "recompute: test_stats.py",
    "q_stats_hill": "recompute: test_stats.py",
    "q_win_ulcer_index": "recompute: test_stats.py",
    "q_text_term_burstiness": "recompute: test_stats.py",
    "q_sink_compaction": "recompute: test_stats.py",
    "q_stats_jarque_bera": "recompute: test_stats.py",
    "q_graph_transitivity": "recompute: test_stats.py",
    "q_sample_neyman": "recompute: test_stats.py",
    "q_multimodal_jpeg": "contract: test_multimodal.py",
    "q_join_broadcast": "recompute: test_recompute.py",
    "q_join_sortmerge": "recompute: test_recompute.py",
    "q_project": "recompute: test_recompute.py",
    "q_filter": "recompute: test_recompute.py",
    "q_join_cross": "recompute: test_recompute.py",
    "q_agg_global": "recompute: test_recompute.py",
    "q_sort_multi": "recompute: test_recompute.py",
    "q_topk": "recompute: test_recompute.py",
    "q_limit_offset": "recompute: test_recompute.py",
    "q_agg_approx_distinct": "contract: test_plans.py, test_registry.py",
    "q_sim_topk": "recompute: test_recompute.py",
    "q_dedup_exact": "recompute: test_recompute.py",
    "q_dedup_embedding": "recompute: test_recompute.py",
    "q_sim_topk_lsh": "contract: test_llm_ops.py, test_plans.py, test_registry.py",
    "q_sim_join": "contract: test_llm_ops.py, test_registry.py",
    "q_text_stats": "recompute: test_recompute.py",
    "q_text_tfidf": "recompute: test_recompute.py",
    "q_text_quality": "recompute: test_recompute.py",
    # r13 additions
    "q_text_gopher_rules": "recompute: test_recompute.py",
    "q_dedup_semdedup": "recompute: test_recompute.py",
    "q_doc_dsir": "recompute: test_recompute.py",
    # r14 additions
    "q_text_repetition_rules": "recompute: test_recompute.py",
    "q_doc_domain_mixture": "recompute: test_recompute.py",
    "q_dedup_url_fuzzy": "recompute: test_recompute.py",
    # r15 additions
    "q_dedup_banding_sweep": "recompute: test_recompute.py",
    "q_text_pii_redact": "recompute: test_recompute.py",
    "q_dedup_cascade": "recompute: test_recompute.py",
    # r16 additions
    "q_text_gopher_lines": "recompute: test_recompute.py",
    "q_text_c4_rules": "recompute: test_recompute.py",
    "q_text_ccnet_buckets": "recompute: test_recompute.py",
    "q_tokenize": "recompute: test_recompute.py",
    "q_multimodal_struct": "recompute: test_recompute.py",
    "q_multimodal_binary": "contract: test_llm_ops.py",
    "q_multimodal_features": "contract: test_plans.py",
    "q_vwap": "recompute: test_recompute.py",
    "q_win_volatility": "recompute: test_recompute.py",
    "q_split_hash": "recompute: test_recompute.py",
    "q_sample_stratified": "recompute: test_recompute.py",
    "q_sessionize": "recompute: test_recompute.py",
    "q_pack_sequences": "recompute: test_recompute.py",
    "q_merge_upsert": "recompute: test_recompute.py",
    "q_fn_cond_null": "recompute: test_recompute.py",
    "q_fn_hash": "recompute: test_recompute.py",
    "q_fn_hash_native": "contract: test_registry.py",
    "q_udtf": "contract: test_plans.py",
    "q_stream_tumbling": "contract: test_streaming.py",
    "q_stream_session": "contract: test_streaming.py",
    "q_stream_watermark_late": "contract: test_streaming.py",
    "q_stream_stateful": "contract: test_streaming.py",
    "q_join_skew_salted": "recompute: test_recompute.py",
    "q_profile_table": "recompute: test_recompute.py",
    "q_funnel": "recompute: test_recompute.py",
    "q_sim_topk_ivf": "contract: test_llm_ops.py, test_registry.py",
    "q_join_asof": "recompute: test_recompute.py",
    "q_win_ntile": "recompute: test_recompute.py",
    "q_dedup_embedding_ann": "contract: test_llm_ops.py, test_registry.py",
    "q_agg_hll_sketch": "contract: test_plans.py, test_registry.py, test_relational.py",
    "q_retention": "recompute: test_recompute.py",
    "q_anomaly_zscore": "recompute: test_recompute.py",
    "q_win_corr": "recompute: test_recompute.py",
    "q_text_repetition": "recompute: test_recompute.py",
    "q_drawdown": "recompute: test_recompute.py",
    "q_twap": "recompute: test_recompute.py",
    "q_agg_kll_quantiles": "contract: test_plans.py, test_registry.py, test_relational.py",
    "q_agg_theta_sketch": "contract: test_plans.py, test_registry.py, test_relational.py",
    "q_text_entropy": "recompute: test_recompute.py",
    "q_rollup_time": "recompute: test_recompute.py",
    "q_doc_chunk": "recompute: test_recompute.py",
    "q_join_lateral": "recompute: test_recompute.py",
    "q_scd2": "recompute: test_recompute.py",
    "q_join_point_in_time": "recompute: test_recompute.py",
    "q_tpch_q5": "recompute: test_recompute.py",
    "q_tpch_q18": "recompute: test_recompute.py",
    "q_tpch_q3": "recompute: test_recompute.py",
    "q_tpch_q10": "recompute: test_recompute.py",
    "q_tpch_q6": "recompute: test_recompute.py",
    "q_tpch_q7": "recompute: test_recompute.py",
    "q_tpch_q14": "recompute: test_recompute.py",
    "q_tpch_q19": "recompute: test_recompute.py",
    "q_tpch_q4": "recompute: test_recompute.py",
    "q_tpch_q15": "recompute: test_recompute.py",
    "q_tpch_q17": "recompute: test_recompute.py",
    "q_tpch_q22": "recompute: test_recompute.py",
    "q_win_bollinger": "recompute: test_recompute.py",
    "q_win_rsi": "recompute: test_recompute.py",
    "q_win_ewma": "recompute: test_properties.py",
    "q_win_macd": "recompute: test_properties.py",
    "q_anomaly_mad": "recompute: test_recompute.py",
    "q_win_stochastic": "recompute: test_recompute.py",
    "q_dedup_edit": "recompute: test_recompute.py",
    "q_text_bm25": "recompute: test_recompute.py",
    "q_sim_hybrid_rrf": "recompute: test_recompute.py",
    "q_embed_centroids": "recompute: test_recompute.py",
    "q_agg_heavy_hitters": "contract: test_llm_ops.py, test_registry.py",
    "q_tokenize_bpe": "contract: test_llm_ops.py, test_registry.py",
    "q_sample_temperature": "recompute: test_recompute.py",
    "q_sample_reservoir": "recompute: test_recompute.py",
    "q_multimodal_decode": "contract: test_plans.py",
    "q_text_boilerplate": "recompute: test_recompute.py",
    "q_embed_knn": "recompute: test_stats.py",
    "q_shuffle_shard": "recompute: test_recompute.py",
    "q_event_paths": "recompute: test_recompute.py",
    "q_win_rolling_median": "recompute: test_recompute.py",
    "q_concurrency": "recompute: test_recompute.py",
    "q_join_range_banded": "recompute: test_recompute.py",
    "q_corr_matrix": "recompute: test_recompute.py",
    "q_win_cusum": "recompute: test_properties.py",
    "q_tpch_q2": "recompute: test_recompute.py",
    "q_tpch_q8": "recompute: test_recompute.py",
    "q_embed_quantize": "recompute: test_recompute.py",
    "q_tpch_q9": "recompute: test_recompute.py",
    "q_tpch_q11": "recompute: test_recompute.py",
    "q_tpch_q13": "recompute: test_recompute.py",
    "q_tpch_q16": "recompute: test_recompute.py",
    "q_tpch_q20": "recompute: test_recompute.py",
    "q_tpch_q21": "recompute: test_recompute.py",
    "q_win_atr": "recompute: test_recompute.py",
    "q_graph_triangles": "recompute: test_recompute.py",
    "q_text_hapax": "recompute: test_recompute.py",
    "q_join_bloom": "recompute: test_recompute.py",
    "q_stats_ttest": "recompute: test_stats.py",
    "q_stats_trend": "recompute: test_stats.py",
    "q_rfm_segments": "recompute: test_properties.py",
    "q_abc_pareto": "recompute: test_properties.py",
    "q_quality_rules": "recompute: test_recompute.py",
    "q_eval_auc": "recompute: test_stats.py",
    "q_time_intelligence": "recompute: test_recompute.py",
    "q_seasonality": "recompute: test_recompute.py",
    "q_resample_interpolate": "recompute: test_recompute.py",
    "q_rolling_active_users": "recompute: test_recompute.py",
    "q_cohort_ltv": "recompute: test_recompute.py",
    "q_user_overlap": "recompute: test_recompute.py",
    "q_benford": "recompute: test_recompute.py",
    "q_session_paths": "recompute: test_recompute.py",
    "q_text_perplexity": "recompute: test_recompute.py",
    "q_market_beta": "recompute: test_recompute.py",
    "q_skyline": "recompute: test_recompute.py",
    "q_funnel_windowed": "recompute: test_recompute.py",
    "q_stats_did": "recompute: test_recompute.py",
    "q_anomaly_seasonal": "recompute: test_recompute.py",
    "q_survival_km": "recompute: test_stats.py",
    "q_text_keywords": "recompute: test_recompute.py",
    "q_agg_gini": "recompute: test_properties.py",
    "q_win_autocorr": "recompute: test_recompute.py",
    "q_user_entropy": "recompute: test_recompute.py",
    "q_dataset_card": "recompute: test_recompute.py",
    "q_topk_movers": "recompute: test_recompute.py",
    "q_sql_api": "contract: test_registry.py",
    "q_embed_pca": "contract: test_llm_ops.py, test_plans.py, test_registry.py",
    "q_graph_pagerank": "recompute: test_recompute.py",
    "q_dedup_simhash": "recompute: test_recompute.py",
    "q_agg_count_min": "contract: test_plans.py",
    "q_eval_ndcg": "recompute: test_recompute.py",
    "q_eval_pr_at_k": "recompute: test_recompute.py",
    "q_sample_importance": "recompute: test_recompute.py",
    "q_agg_tdigest": "contract: test_registry.py, test_relational.py",
    "q_win_holt": "recompute: test_recompute.py",
    "q_stats_chisq": "recompute: test_recompute.py",
    "q_sim_range": "recompute: test_recompute.py",
    "q_text_readability": "recompute: test_recompute.py",
    "q_doc_quality_model": "recompute: test_recompute.py",
    "q_win_rolling_ols": "recompute: test_recompute.py",
    "q_text_collocations": "recompute: test_recompute.py",
    "q_text_zipf": "recompute: test_recompute.py",
    "q_stats_changepoint": "recompute: test_recompute.py",
    "q_basket_rules": "recompute: test_recompute.py",
    "q_stats_ks": "recompute: test_stats.py",
    "q_stats_mannwhitney": "recompute: test_stats.py",
    "q_stats_anova": "recompute: test_stats.py",
    "q_quality_drift": "recompute: test_stats.py",
    "q_win_theil_sen": "recompute: test_stats.py",
    "q_graph_components": "recompute: test_stats.py",
    "q_risk_metrics": "recompute: test_stats.py",
    "q_seasonal_decompose": "recompute: test_stats.py",
    "q_graph_link_predict": "recompute: test_stats.py",
    "q_text_heaps": "recompute: test_stats.py",
    "q_multimodal_frames": "recompute: test_stats.py",
    "q_dedup_minhash": "contract: test_llm_ops.py, test_registry.py",
    "q_dedup_cluster": "contract: test_pipeline.py",
    "q_join_spatial": "recompute: test_stats.py",
    "q_quality_freshness": "recompute: test_stats.py",
    "q_embed_outliers": "recompute: test_stats.py",
    "q_drawdown_duration": "recompute: test_stats.py",
    "q_variance_ratio": "recompute: test_stats.py",
    "q_growth_accounting": "recompute: test_stats.py",
    "q_win_hurst": "recompute: test_stats.py",
    "q_tpch_q1": "recompute: test_recompute.py",
    "q_sql_recursive": "recompute: test_stats.py",
    "q_win_ichimoku": "recompute: test_stats.py",
    "q_stats_spearman": "recompute: test_stats.py",
    "q_stats_kendall": "recompute: test_stats.py",
    "q_liquidity_metrics": "recompute: test_stats.py",
    "q_stats_regression_multi": "recompute: test_stats.py",
    "q_gdpr_erasure": "recompute: test_stats.py",
    "q_orderflow_imbalance": "recompute: test_stats.py",
    "q_sample_class_balance": "recompute: test_stats.py",
    "q_win_pivot_points": "recompute: test_stats.py",
    "q_stats_srm": "recompute: test_stats.py",
    "q_dedup_soft_weights": "recompute: test_stats.py",
    "q_user_lorenz": "recompute: test_stats.py",
    "q_stats_cuped": "recompute: test_stats.py",
    "q_stats_proportions": "recompute: test_stats.py",
    "q_roll_spread": "recompute: test_stats.py",
    "q_vol_estimators": "recompute: test_stats.py",
    "q_stats_jackknife": "recompute: test_stats.py",
    "q_stats_granger": "recompute: test_stats.py",
    "q_multimodal_phash": "recompute: test_stats.py",
    "q_text_bigram_entropy": "recompute: test_stats.py",
    "q_stats_power": "recompute: test_stats.py",
    "q_win_vpin": "recompute: test_stats.py",
    "q_attribution_markov": "recompute: test_stats.py",
    "q_dedup_threshold_sweep": "recompute: test_stats.py",
    "q_win_rolling_beta": "recompute: test_stats.py",
    "q_sequence_ngrams": "recompute: test_stats.py",
    "q_tokenize_fertility": "recompute: test_stats.py",
    "q_privacy_kanonymity": "recompute: test_stats.py",
    "q_feature_hashing": "recompute: test_stats.py",
    "q_anomaly_esd": "recompute: test_stats.py",
    "q_supplier_scorecard": "recompute: test_stats.py",
    "q_win_renko": "recompute: test_stats.py",
    "q_fn_variant": "recompute: test_stats.py",
    "q_stats_acf": "recompute: test_stats.py",
    "q_stats_runs_test": "recompute: test_stats.py",
    "q_sample_quota": "recompute: test_recompute.py",
    "q_split_contamination": "recompute: test_recompute.py",
    "q_pipeline_pretrain": "recompute: test_recompute.py",
    "q_sample_mixture": "recompute: test_recompute.py",
    "q_snapshot_diff": "recompute: test_recompute.py",
    "q_rollup_incremental": "recompute: test_recompute.py",
    "q_time_to_event": "recompute: test_recompute.py",
    "q_order_cadence": "recompute: test_recompute.py",
    "q_graph_degree": "recompute: test_recompute.py",
    "q_events_attribution": "recompute: test_recompute.py",
    "q_text_langid": "recompute: test_recompute.py",
    "q_text_fingerprint": "recompute: test_recompute.py",
    "q_text_pii": "recompute: test_recompute.py",
    "q_text_ngram_top": "recompute: test_recompute.py",
    "q_dedup_url": "recompute: test_recompute.py",
    "q_sample_negative": "recompute: test_recompute.py",
    "q_dedup_incremental": "recompute: test_recompute.py",
    "q_bars_ohlcv": "recompute: test_recompute.py",
    "q_bar_gaps": "recompute: test_recompute.py",
    "q_resample_ffill": "recompute: test_recompute.py",
    "q_win_obv": "recompute: test_recompute.py",
    "q_candle_patterns": "recompute: test_recompute.py",
    "q_events_heatmap": "recompute: test_recompute.py",
    # r9 reclassification: the media codec layer these two keys ride
    # carries real contract tests (PNG/JPEG roundtrips, WAV decode
    # cross-checked against stdlib wave), and the feature arithmetic
    # is pinned by a formula-recomputing oracle
    "q_multimodal_pixels": "contract: test_multimodal.py",
    "q_multimodal_wav_features": "contract: test_multimodal.py",
    "q_win_running": "recompute: test_recompute.py",
    "q_win_rank": "recompute: test_recompute.py",
    "q_win_lag_lead": "recompute: test_recompute.py",
    "q_win_moving_avg": "recompute: test_recompute.py",
    "q_win_range_frame": "recompute: test_recompute.py",
    "q_win_first_last": "recompute: test_recompute.py",
    "q_win_pct": "recompute: test_recompute.py",
    "q_fn_string": "recompute: test_recompute.py",
    "q_fn_date": "recompute: test_recompute.py",
    "q_fn_math": "recompute: test_recompute.py",
    "q_fn_array": "recompute: test_recompute.py",
    "q_fn_map": "recompute: test_recompute.py",
    "q_fn_explode": "recompute: test_recompute.py",
    "q_fn_json": "recompute: test_recompute.py",
    "q_fn_cast": "recompute: test_recompute.py",
    "q_fn_bitwise": "recompute: test_recompute.py",
    "q_fn_url": "recompute: test_recompute.py",
    "q_fn_explode_outer": "recompute: test_recompute.py",
    "q_fn_regexp": "recompute: test_recompute.py",
    "q_fn_try": "recompute: test_recompute.py",
    "q_fn_datetime_extra": "recompute: test_recompute.py",
    "q_fn_struct": "recompute: test_recompute.py",
    "q_fn_lambda": "recompute: test_recompute.py",
    "q_tpch_q12": "recompute: test_recompute.py",
    "q_agg_rollup": "recompute: test_recompute.py",
    "q_agg_cube": "recompute: test_recompute.py",
    "q_agg_grouping_sets": "recompute: test_recompute.py",
    "q_agg_grouping_id": "recompute: test_recompute.py",
    "q_join_null_safe": "recompute: test_recompute.py",
    "q_except_all": "recompute: test_recompute.py",
    "q_intersect_all": "recompute: test_recompute.py",
    "q_agg_weighted_median": "recompute: test_recompute.py",
    "q_agg_mode": "recompute: test_recompute.py",
    "q_win_gaps_islands": "recompute: test_recompute.py",
    "q_join_asof_tolerance": "recompute: test_recompute.py",
    "q_join_asof_forward": "recompute: test_recompute.py",
    "q_agg_skew_kurt": "recompute: test_recompute.py",
    "q_agg_argmax": "recompute: test_recompute.py",
    "q_agg_string_agg": "recompute: test_recompute.py",
    "q_agg_percentile": "recompute: test_recompute.py",
    "q_agg_histogram": "recompute: test_recompute.py",
    "q_agg_group": "recompute: test_recompute.py",
    "q_join_multiway": "recompute: test_recompute.py",
    "q_topk_per_group": "recompute: test_recompute.py",
    "q_agg_pivot": "recompute: test_recompute.py",
    "q_filter_date": "recompute: test_recompute.py",
    "q_case_when": "recompute: test_recompute.py",
    "q_join_left": "recompute: test_recompute.py",
    "q_join_outer": "recompute: test_recompute.py",
    "q_join_semi": "recompute: test_recompute.py",
    "q_join_anti": "recompute: test_recompute.py",
    "q_join_theta": "recompute: test_recompute.py",
    "q_join_range_interval": "recompute: test_recompute.py",
    "q_agg_distinct": "recompute: test_recompute.py",
    "q_agg_stats": "recompute: test_recompute.py",
    "q_agg_having": "recompute: test_recompute.py",
    "q_union_all": "recompute: test_recompute.py",
    "q_union_distinct": "recompute: test_recompute.py",
    "q_intersect": "recompute: test_recompute.py",
    "q_except": "recompute: test_recompute.py",
    "q_distinct": "recompute: test_recompute.py",
    "q_agg_collect": "recompute: test_recompute.py",
    "q_unpivot": "recompute: test_recompute.py",
    "q_agg_filter": "recompute: test_recompute.py",
    "q_win_nth_value": "recompute: test_recompute.py",
    "q_basket_pairs": "recompute: test_recompute.py",
    "q_source_python": "recompute: test_recompute.py",
    "q_join_interval_overlap": "recompute: test_recompute.py",
    "q_agg_bitmap_distinct": "recompute: test_recompute.py",
    "q_join_asof_nearest": "recompute: test_recompute.py",
    "q_pivot_dynamic": "recompute: test_recompute.py",
}


def test_every_key_has_a_coverage_class():
    """A new operator must declare its independent-check story in the
    same commit that registers it (recompute/contract test listed in
    _COVERED, or an explicit _DIFFERENTIAL_ONLY row)."""
    keys = set(all_queries())
    inventoried = set(_COVERED) | set(_DIFFERENTIAL_ONLY)
    unlisted = sorted(keys - inventoried)
    assert not unlisted, (
        f"keys registered without a coverage class: {unlisted} - add a"
        " recompute/contract test and a _COVERED row, or (only for an"
        " engine-primitive composition) an explicit _DIFFERENTIAL_ONLY"
        " row with a family justification"
    )
    stale = sorted(inventoried - keys)
    assert not stale, f"inventory rows for unregistered keys: {stale}"


def test_coverage_classes_are_disjoint():
    both = sorted(set(_COVERED) & set(_DIFFERENTIAL_ONLY))
    assert not both, f"keys in both classes: {both}"


def test_differential_only_set_is_frozen():
    """Silent growth tripwire (the rows-only precedent): the
    differential-only population and its per-family split are pinned.
    Growing either requires editing these literals - a reviewable
    diff carrying its own justification."""
    # r9 shrank the tail: 23 keys (all 10 hash-counting + 7 of 9
    # token-byte-counting, then all 6 counting-selection) gained recompute replays in
    # tests/test_recompute.py and moved to _COVERED
    assert len(_DIFFERENTIAL_ONLY) == 22
    from collections import Counter

    fams = Counter(_DIFFERENTIAL_ONLY.values())
    assert fams == {
        "streaming-differential": 11,
        "udf-plumbing": 7,
        "roundtrip-identity": 4,
    }


def test_differential_only_justifications_resolve():
    for k, fam in _DIFFERENTIAL_ONLY.items():
        assert fam in _FAMILY_JUSTIFICATION, (k, fam)
    for fam, prose in _FAMILY_JUSTIFICATION.items():
        assert len(prose) > 40, f"empty/thin justification for {fam}"


def test_covered_rows_name_real_test_files():
    import os

    here = os.path.dirname(__file__)
    for k, where in _COVERED.items():
        kind, _, files = where.partition(":")
        assert kind in ("recompute", "contract"), (k, where)
        for f in files.split(","):
            f = f.strip()
            assert os.path.exists(os.path.join(here, f)), (k, f)


def test_recompute_claims_have_a_matching_test():
    """Claim-vs-file audit (r9): every row that names a test file as
    its recompute home must actually appear in that file — a
    classification row without a replay is exactly the silent gap
    this inventory exists to prevent. The same rule covers contract
    rows. (Caught 10 dangling rows total: q_fn_map missed in the r9
    scalar wave; q_topk / q_join_interval_overlap / q_tokenize /
    q_funnel / q_drawdown / q_seasonality / q_fn_hash carried
    forward from the r8 inventory; the two media keys' codec tests
    did not name them.)"""
    import os
    import re

    here = os.path.dirname(__file__)
    blobs = {}
    missing = []
    for k, where in _COVERED.items():
        kind, _, files = where.partition(":")
        if kind not in ("recompute", "contract"):
            continue
        named = [f.strip() for f in files.split(",")]
        found = False
        for f in named:
            if f not in blobs:
                blobs[f] = open(os.path.join(here, f)).read()
            # bare-name mentions count: several property tests name
            # the key they certify in a docstring/comment while the
            # replay itself exercises the shared helper
            if re.search(rf"\b{k}\b", blobs[f]):
                found = True
                break
        if not found:
            missing.append((k, where))
    assert not missing, f"recompute claims without a matching test: {missing}"
