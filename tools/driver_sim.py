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
from tools.check import complex_cols, decimal_cols, normalize, rows_equal  # noqa: E402

# Keys added or plan-rewritten THIS round — every one must pass the
# vanilla-session differential before the exit seal. Maintained by the
# round builder; reset at round start.
ROUND_CHANGED = [
    "q_sql_api",  # r6: shared SQL text CAST(cents AS DOUBLE) / 100.0
                  # (r05 hash-FAIL: Spark parsed the bare decimal
                  # literal division as DECIMAL, DuckDB as float64)
    "q_multimodal_phash",  # r6: exact-dup collapse + asymmetric
                  # multi-index hamming-ball join (flat codegen hash)
    "q_dedup_minhash",   # r6: signature collapse before the band join
    "q_dedup_cluster",   # r6: gid-level components + pointer jumping
    "q_dedup_soft_weights",  # r6: inherits the cluster rewrite
    "q_dedup_jaccard",   # r6: shared core refactored (_jaccard_group_pairs)
    "q_dedup_ngram",     # r6: same shared core
    "q_dedup_containment",  # r6: same shared core
    "q_graph_components",   # r6: pointer-jumping propagation loop
    "q_agg_tdigest",     # r6: vectorized merge pass (no per-point loop)
    "q_dedup_span",      # r6: new — shared-substring-run dedup
    "q_win_adx",         # r6: new — directional index (SMA form)
    "q_win_cci",         # r6: new — commodity channel index
    "q_win_aroon",       # r6: new — trend-freshness oscillator
    "q_win_williams_r",  # r6: new — %R oscillator
    "q_stats_cramers_v",  # r6: new — contingency effect size
    "q_win_vortex",      # r6: new — vortex trend-reversal indicator
    "q_win_cmo",         # r6: new — Chande momentum oscillator
    "q_win_dpo",         # r6: new — detrended price oscillator
    "q_win_ultimate",    # r6: new — 7/14/28 ultimate oscillator
    "q_win_force_index",  # r6: new — volume-weighted force index
    "q_stats_cohens_d",  # r6: new — pooled-SD effect size
    "q_stats_theil_u",   # r6: new — uncertainty coefficient
    "q_eval_confusion",  # r6: new — threshold confusion metrics
    "q_eval_brier",      # r6: new — Brier + skill score
    "q_embed_dim_stats",  # r6: new — per-dimension moment profile
    "q_vocab_coverage",  # r6: new — train-vocab OOV audit
    "q_stats_bootstrap",  # r6: new — Poisson-bootstrap mean CI
    "q_stats_permutation",  # r6: new — exact permutation test
    "q_stats_mcnemar",   # r6: new — paired-classifier test
    "q_price_index",     # r6: new — Laspeyres/Paasche/Fisher panel
    "q_graph_kcore",     # r6: new — coreness via h-index fixpoint
    "q_tokenize_vocab_prune",  # r6: new — vocab-size coverage curve
    "q_stream_median",   # r6: new — streaming exact median (two-layer)
    "q_sim_mmr",         # r6: new — MMR diversity re-rank
    "q_market_concentration",  # r6: new — HHI/CR4/DOJ-band panel
    "q_embed_ivf_recall",  # r6: new — IVF nprobe/recall curve
    "q_eval_gains",      # r6: new — cumulative gains/lift deciles
    "q_embed_pq",        # r6: new — product quantization + ADC
    "q_agg_ddsketch",    # r6: new — oracle-able DDSketch quantiles
    "q_stream_pipeline",  # r6: new — dedup+enrich+rollup stream ETL
    "q_sample_weighted",  # r6: new — E-S weighted sampling w/o repl.
    "q_backtest_sma",    # r6: new — vectorized SMA-crossover backtest
    "q_audit_duplicates",  # r6: new — banded duplicate-payment join
    "q_embed_drift",     # r6: new — per-dim two-sample drift monitor
    "q_stats_shrinkage",  # r6: new — empirical-Bayes rate shrinkage
    "q_regime_transitions",  # r6: new — 2-state volatility Markov chain
    "q_revenue_waterfall",  # r6: new — gross->billed bridge table
    "q_dedup_span_coverage",  # r6: new — span-duplication removal metric
    "q_text_fightin_words",  # r6: new — Monroe log-odds token drift
    "q_stats_fdr_bh",    # r6: new — BH correction over permutation p
    "q_quality_referential",  # r6: new — full-schema FK orphan panel
    "q_win_efficiency_ratio",  # r6: new — Kaufman trendiness screen
    "q_graph_assortativity",  # r6: new — degree-mixing Pearson r
    "q_stats_tost",      # r6: new — TOST equivalence test
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
    dc = decimal_cols(sdf) + [c + " (oracle)" for c in decimal_cols(odf)]
    assert not dc, (k, f"Decimal cells fail the driver's exact hash {dc}")
    assert len(sdf) == len(odf), (k, len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns), k
    a, b = normalize(sdf), normalize(odf)
    for i, (ra, rb) in enumerate(
        zip(a.itertuples(index=False, name=None), b.itertuples(index=False, name=None))
    ):
        assert rows_equal(ra, rb), (k, i, ra, rb)
    print(f"{k}: OK ({len(sdf)} rows)")
print("DRIVER-SIM PASS")
