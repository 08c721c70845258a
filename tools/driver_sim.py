"""Simulate the driver harness: vanilla SparkSession (no engine configs),
import __spark_entry__, smoke entry(), then differential-check a sample.

The sample = a fixed cross-family anchor set + ROUND_CHANGED (every key
added or plan-rewritten in the current round — the r4 exit-seal blind
spot was sampling only the fixed set, which let a driver-red output
shape ship despite a "242/242" local sweep) + any extra keys passed on
the command line. Oracle-checked keys also run the complex-output gate
(driver's canonicalizer crashes on array/map/struct cells).

Usage: python tools/driver_sim.py [extra_key ...]
"""
import importlib.util
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
# Same row normalization as the hardened checker: floats rounded before
# keying the sort, so cross-engine rounding noise can't misalign rows.
from tools.check import complex_cols, normalize, rows_equal  # noqa: E402

# Keys added or plan-rewritten THIS round — every one must pass the
# vanilla-session differential before the exit seal. Maintained by the
# round builder; reset at round start.
ROUND_CHANGED = [
    "q_embed_quantize",   # r5: array<int> -> joined string (r04 ERR fix)
    "q_rfm_segments",     # r5: global ntile -> banded distributed rank
    "q_sim_pairwise",     # r5: norm-band second blocking key
    "q_embed_pca",        # r5: exploded co-moments -> mapInArrow partials
    "q_graph_pagerank",   # r5: quantized-integer recurrence, now oracle-checked
    "q_dedup_simhash",    # r5: md5 token hashes, now oracle-checked
    "q_agg_count_min",    # r5: md5-seeded rows + width 256, now oracle-checked
    "q_eval_ndcg",        # r5: new
    "q_eval_pr_at_k",     # r5: new
    "q_join_interval_overlap",  # r5: new
    "q_agg_tdigest",      # r5: new
    "q_win_holt",         # r5: new
    "q_stats_chisq",      # r5: new
    "q_sim_range",        # r5: new
    "q_agg_bitmap_distinct",  # r5: new
    "q_sample_importance",  # r5: new
    "q_graph_degree",     # r5: new
    "q_agg_skew_kurt",    # r5: new
    "q_join_asof_nearest",  # r5: new
    "q_text_readability",  # r5: new
    "q_fn_datetime_extra",  # r5: new
    "q_doc_quality_model",  # r5: new
    "q_stream_topk",      # r5: new
    "q_agg_argmax",       # r5: new
    "q_agg_string_agg",   # r5: new
    "q_win_rolling_ols",  # r5: new
    "q_fn_struct",        # r5: new
    "q_pivot_dynamic",    # r5: new
    "q_text_collocations",  # r5: new
    "q_text_zipf",        # r5: new
    "q_source_csv_roundtrip",  # r5: new (io sink->source gate)
    "q_source_json_roundtrip",  # r5: new
    "q_sink_partition_prune",  # r5: new
    "q_stats_changepoint",  # r5: new
    "q_udtf_arrow",       # r5: new
    "q_basket_rules",     # r5: new
    "q_events_attribution",  # r5: new
    "q_stats_ks",         # r5: new
    "q_stats_mannwhitney",  # r5: new
    "q_stats_anova",      # r5: new
    "q_quality_drift",    # r5: new
    "q_win_theil_sen",    # r5: new
    "q_graph_components",  # r5: new
    "q_risk_metrics",     # r5: new
    "q_seasonal_decompose",  # r5: new
    "q_graph_link_predict",  # r5: new
    "q_text_heaps",       # r5: new
    "q_multimodal_frames",  # r5: new
    "q_join_spatial",     # r5: new
    "q_quality_freshness",  # r5: new
    "q_embed_outliers",   # r5: new
    "q_drawdown_duration",  # r5: new
    "q_variance_ratio",   # r5: new
    "q_growth_accounting",  # r5: new
    "q_win_hurst",        # r5: new
    "q_source_schema_evolution",  # r5: new
    "q_tpch_q1",          # r5: new (verbatim Q1 report)
    "q_fn_lambda",        # r5: new
    "q_sql_recursive",    # r5: new (Spark 4 WITH RECURSIVE)
    "q_win_ichimoku",     # r5: new
    "q_stats_spearman",   # r5: new
    "q_stats_kendall",    # r5: new
    "q_liquidity_metrics",  # r5: new
    "q_stats_regression_multi",  # r5: new
    "q_gdpr_erasure",     # r5: new
    "q_orderflow_imbalance",  # r5: new
    "q_sample_class_balance",  # r5: new
    "q_embed_matryoshka",  # r5: new
    "q_win_pivot_points",  # r5: new
    "q_stats_srm",        # r5: new
    "q_dedup_soft_weights",  # r5: new
    "q_user_lorenz",      # r5: new
    "q_stats_cuped",      # r5: new
    "q_stats_proportions",  # r5: new
    "q_roll_spread",      # r5: new
    "q_vol_estimators",   # r5: new
    "q_stats_jackknife",  # r5: new
    "q_stats_granger",    # r5: new
    "q_multimodal_phash",  # r5: new
    "q_text_bigram_entropy",  # r5: new
    "q_stats_power",      # r5: new
    "q_win_vpin",         # r5: new
    "q_attribution_markov",  # r5: new
    "q_dedup_threshold_sweep",  # r5: new
    "q_win_rolling_beta",  # r5: new
    "q_sequence_ngrams",  # r5: new
    "q_tokenize_fertility",  # r5: new
    "q_privacy_kanonymity",  # r5: new
    "q_feature_hashing",  # r5: new
    "q_anomaly_esd",      # r5: new
    "q_supplier_scorecard",  # r5: new
    "q_win_renko",        # r5: new
    "q_fn_variant",       # r5: new
    "q_stats_acf",        # r5: new
    "q_stats_runs_test",  # r5: new
    "q_abc_xyz",          # r5: new
    "q_price_elasticity",  # r5: new
    "q_basket_sequential",  # r5: new
    "q_events_burstiness",  # r5: new
    "q_forecast_mase",    # r5: new
    "q_text_compression",  # r5: new (rows-only)
    "q_seasonality_strength",  # r5: new
    "q_eval_calibration",  # r5: new
    "q_stats_qte",        # r5: new
    "q_stats_winsorized",  # r5: new
    "q_sample_kfold",     # r5: new
    "q_win_mfi",          # r5: new
    "q_doc_novelty",      # r5: new
    "q_embed_silhouette",  # r5: new
    "q_win_pairs_spread",  # r5: new
    "q_agg_geomean",      # r5: new
    "q_text_script_mix",  # r5: new
    "q_win_donchian",     # r5: new
    "q_win_keltner",      # r5: new
    "q_stats_levene",     # r5: new
]

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

# 1. smoke: entry()
df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

# 2. correctness sample at sf0.01 (same protocol as driver)
qs, os_ = mod.queries(), mod.oracle_sql()
print(f"queries={len(qs)} oracles={len(os_)}")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
# fixed sample spans every family in the driver's graded window:
# relational/window anchors, scalar-fn tail, UDF surface, LLM ops,
# domain composites, and (rows-only) streaming + UDTF on the vanilla
# session — exactly where missing engine confs would surface.
sample = [
    "q_agg_group", "q_join_asof", "q_win_range_frame", "q_project",
    "q_agg_rollup", "q_agg_collect", "q_win_ntile", "q_fn_json",
    "q_fn_cast", "q_udf_pandas_scalar", "q_udf_grouped_map",
    "q_dedup_jaccard", "q_tokenize", "q_bars_ohlcv",
]
rows_only_sample = ["q_udtf", "q_dedup_minhash", "q_stream_tumbling", "q_stream_stateful"]
for k in ROUND_CHANGED + sys.argv[1:]:
    if k not in qs:
        print(f"{k}: not registered yet — skipping")
        continue
    (sample if k in os_ else rows_only_sample).append(k)
seen = set()
for k in rows_only_sample:
    if k in seen:
        continue
    seen.add(k)
    n = qs[k](spark, "/root/testdata/sf0.01").count()
    assert n >= 0
    print(f"{k}: ran on vanilla session ({n} rows)")
for k in sample:
    if k in seen:
        continue
    seen.add(k)
    sdf = qs[k](spark, "/root/testdata/sf0.01").toPandas()
    cc = complex_cols(sdf)
    assert not cc, (k, f"driver-unhashable output columns {cc}")
    odf = con.execute(os_[k]).fetchdf()
    assert len(sdf) == len(odf), (k, len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns), k
    a, b = normalize(sdf), normalize(odf)
    for i, (ra, rb) in enumerate(
        zip(a.itertuples(index=False, name=None), b.itertuples(index=False, name=None))
    ):
        assert rows_equal(ra, rb), (k, i, ra, rb)
    print(f"{k}: OK ({len(sdf)} rows)")
print("DRIVER-SIM PASS")
