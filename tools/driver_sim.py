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
    "q_audit_duplicates",  # r7: band base 1.01 -> 1.02 (ADVICE: 1.01
                  # bands can straddle 2 boundaries for a 1% pair)
    "q_stats_mcnemar",   # r7: significance cross-product in
                  # decimal(38,0)/HUGEINT (int64 overflow at |b-c|>3M)
    "q_eval_brier",      # r7: NULL skill on constant labels (exact
                  # zero-denominator guard, both engines)
    "q_agg_tdigest",     # r7: merge buckets on right-edge k crossings
                  # (midpoint bucketing was ~2 k-units loose)
    "q_dedup_span",      # r7: 60-bit md5-prefix anchor keys + bounded
                  # per-bucket pair expansion (no anchor self-join)
    "q_dedup_span_coverage",  # r7: shares _span_candidates
    "q_sim_pairwise",    # r7: SPARK_GRAFT_ANN_MODE scale cutover
                  # (banded SimHash candidates behind the knob;
                  # default/exact path unchanged)
    "q_embed_matryoshka",  # r7: query-sampling scale cutover
    "q_stream_watermark_late",  # r7: rows-only -> full oracle (the
                  # deterministic replay's watermark schedule is now
                  # mirrored in SQL)
    "q_multimodal_pixels",  # r7: new — real PNG pixel decode round-trip
    "q_stats_kruskal_wallis",  # r7: new — k-group rank test (tie-corrected)
    "q_stats_friedman",  # r7: new — blocked rank test over month blocks
    "q_eval_f1_sweep",   # r7: new — threshold sweep + exact best-F1 flag
    "q_win_elder_ray",   # r7: new — bull/bear power off EMA13 fold
    "q_win_heikin_ashi",  # r7: new — smoothed candle recursion fold
    "q_stats_bartlett",  # r7: new — variance homogeneity (ln-grid terms)
    "q_orders_backlog",  # r7: new — open-order aging report
    "q_privacy_ldiversity",  # r7: new — homogeneity-attack audit
    "q_text_code_detection",  # r7: new — code punctuation density filter
    "q_observe_metrics",  # r7: new — Observation API in-flight metrics
    "q_win_kama",        # r7: new — adaptive-coefficient MA fold
    "q_eval_ks",         # r7: new — classifier KS separation
    "q_funnel_latency",  # r7: new — stage-transition latency table
    "q_segment_migration",  # r7: new — lifecycle transition matrix
    "q_win_volume_profile",  # r7: new — value area / point of control
    "q_stats_dunn",      # r7: new — KW post-hoc pairwise z
    "q_eval_mrr",        # r7: new — first-relevant-rank / MRR inputs
    "q_win_choppiness",  # r7: new — trend-vs-chop regime index
    "q_source_text_roundtrip",  # r7: new — text-line sink/source gate
    "q_embed_kmeans",    # r7: new — fully-oracled deterministic Lloyd
    "q_graph_kcore",     # r7: rows-only -> full oracle (recursive-CTE
                  # fixed-round h-index replay)
    "q_graph_distances",  # r7: new — fully-oracled BFS hop histogram
    "q_stats_wilcoxon",  # r7: new — paired signed-rank test
    "q_stats_hill",      # r7: new — heavy-tail index (top-k ln grid)
    "q_win_ulcer_index",  # r7: new — RMS drawdown risk window
    "q_text_term_burstiness",  # r7: new — Church-Gale term VMR
    "q_sink_compaction", # r7: new — small-file compaction value gate
    "q_stats_jarque_bera",  # r7: new — JB normality gate
    "q_graph_transitivity",  # r7: new — global/avg-local clustering
    "q_sample_neyman",   # r7: new — Neyman-optimal allocation
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
