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
import os
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
    # (reset at r9 start; every key added or plan-rewritten this round
    # must be listed here and pass the vanilla-session differential
    # before the exit seal)
    # ADVICE r8 (medium): the r8 streaming block listed only 13 of the
    # 15 _run_to_memory callers — q_stream_python_source and
    # q_stream_cdc_apply (engine/streaming.py) also replay through the
    # shuffle-partition-pinned harness and were silently skipped by
    # the r8 vanilla-session gate. Close the gap this round:
    "q_stream_python_source", "q_stream_cdc_apply",
    # r9: _run_to_memory now restores the shuffle-partition pin right
    # after .start() (StreamExecution plans batches on its session
    # CLONE, so the pin is captured at start and the global session is
    # clean for the replay's lifetime — ADVICE r8); anomaly/median/
    # pipeline additionally replay 4 larger micro-batches
    # (files_per_trigger=2; results batch-boundary-invariant, comments
    # at the call sites). ALL _run_to_memory callers re-gated:
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_watermark_late", "q_stream_dedup", "q_stream_stateful",
    "q_stream_join", "q_stream_stream_join", "q_stream_bars",
    "q_stream_anomaly", "q_stream_median", "q_stream_topk",
    "q_stream_pipeline",
    "q_multimodal_jpeg",  # r9: marker walk now skips 0xFF fill bytes
                  # and length-less standalone markers (TEM/stray
                  # RSTn) per T.81 B.1.1.2 (ADVICE r8)
    "q_agg_tdigest",  # r9: lerp-stable quantile interpolation
                  # (hypothesis caught the 1-ulp walk past an exact
                  # data point at frac=1)
]

# ADVICE r8 (low): the scale-cutover env knobs switch graded-exact
# keys onto approximate candidate paths (documented recall <1.0 near
# threshold). A grading/sealing session must run the DEFAULT exact
# paths — fail loudly if any knob leaked into the environment.
_SCALE_KNOBS = [
    "SPARK_GRAFT_ANN_MODE", "SPARK_GRAFT_ANN_CUTOVER",
    "SPARK_GRAFT_DF_CAP", "SPARK_GRAFT_SPAN_CAP",
]
_leaked = [k for k in _SCALE_KNOBS if os.environ.get(k)]
assert not _leaked, (
    f"scale-cutover knobs set during a graded sweep: {_leaked} — "
    "unset them; driver grading must exercise the default exact paths"
)


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
