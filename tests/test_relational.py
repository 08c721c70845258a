"""Operator-level edge cases on tiny inline DataFrames (SURVEY §5.2.3)
plus approximate-aggregate accuracy bounds (§5.2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.io import load_table
from tests.conftest import SF_SMOKE


def test_join_null_keys_dont_match(spark):
    a = spark.createDataFrame([(1, "x"), (None, "y")], "k int, va string")
    b = spark.createDataFrame([(1, "p"), (None, "q")], "k int, vb string")
    joined = a.join(b, a.k.eqNullSafe(b.k)).count()
    plain = a.join(b, a.k == b.k).count()
    assert plain == 1  # null keys never equi-match
    assert joined == 2  # eqNullSafe matches null-null


def test_empty_group_aggregate(spark):
    df = spark.createDataFrame([], "k int, v double")
    out = df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert out == []
    glob = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    assert glob["n"] == 0 and glob["s"] is None


def test_semi_plus_anti_partition(spark):
    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    assert semi + anti == c.count()


def test_union_by_name_reorders_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, s string")
    b = spark.createDataFrame([("y", 2)], "s string, id int")
    u = a.unionByName(b).collect()
    assert {(r["id"], r["s"]) for r in u} == {(1, "x"), (2, "y")}


def test_dedup_idempotent(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_linestatus")
    once = li.distinct()
    assert once.count() == once.distinct().count()


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("n"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(3, 0.1 * ex), (k, ex, approx[k])


def test_ns_timestamp_truncation_matches_duckdb(spark, duck):
    ev = load_table(spark, SF_SMOKE, "events")
    s_min = ev.agg(F.min(F.unix_timestamp("ts")).alias("m")).collect()[0]["m"]
    d_min = duck.execute(
        "SELECT CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) FROM events"
    ).fetchone()[0]
    assert s_min == d_min


def test_broadcast_join_plan_has_no_fact_shuffle(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    p = load_table(spark, SF_SMOKE, "part")
    plan = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    plan = (
        o.orderBy(F.desc("o_totalprice")).limit(5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_hll_sketch_estimates_near_exact(spark):
    """q_agg_hll_sketch is rows-only (sketch estimates are approximate
    by design); pin its accuracy instead: every per-segment estimate and
    the sketch-merged TOTAL must sit within 5% of the exact COUNT
    DISTINCT (lgConfigK=12 -> ~1.6% relative standard error, so 5% is
    ~3 sigma)."""
    from engine.registry import all_queries
    from tests.conftest import SF_T2

    got = {
        r["c_mktsegment"]: r["approx_customers"]
        for r in all_queries()["q_agg_hll_sketch"](spark, SF_T2).collect()
    }
    o = spark.read.parquet(f"{SF_T2}/orders.parquet")
    c = spark.read.parquet(f"{SF_T2}/customer.parquet")
    from pyspark.sql import functions as F

    exact = {
        r["c_mktsegment"]: r["n"]
        for r in o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["TOTAL"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for seg, est in got.items():
        assert abs(est - exact[seg]) <= 0.05 * exact[seg], (seg, est, exact[seg])


def test_kll_quantile_estimates_near_exact(spark):
    """q_agg_kll_quantiles is rows-only (sketch estimates); pin its
    accuracy: each per-flag p50/p95/p99 and the sketch-merged TOTAL must
    sit within 2% of the exact percentile in RANK space — KLL bounds
    rank error (k=400 -> ~0.7% at 99% confidence), so value tolerance is
    checked by widening the exact rank +/-2% into a value interval."""
    from pyspark.sql import functions as F

    from engine.registry import all_queries
    from tests.conftest import SF_T2

    rows = all_queries()["q_agg_kll_quantiles"](spark, SF_T2).collect()
    li = spark.read.parquet(f"{SF_T2}/lineitem.parquet")
    eps = 0.02
    for r in rows:
        seg = li if r["l_returnflag"] == "TOTAL" else li.filter(
            F.col("l_returnflag") == r["l_returnflag"]
        )
        for q, col in [(0.5, "approx_p50"), (0.95, "approx_p95"), (0.99, "approx_p99")]:
            lo, hi = seg.select(
                F.percentile_approx("l_extendedprice", max(q - eps, 0.0), 10000),
                F.percentile_approx("l_extendedprice", min(q + eps, 1.0), 10000),
            ).first()
            assert lo <= r[col] <= hi, (r["l_returnflag"], col, r[col], lo, hi)


def test_theta_sketch_estimates_near_exact(spark):
    """q_agg_theta_sketch is rows-only; pin accuracy: per-type, union
    and intersection estimates within 5% of exact distinct-user counts
    (every fixture type covers all 150 users, so intersections are
    full-sized, not degenerate)."""
    from pyspark.sql import functions as F

    from engine.registry import all_queries
    from tests.conftest import SF_T2

    rows = all_queries()["q_agg_theta_sketch"](spark, SF_T2).collect()
    ev = spark.read.parquet(f"{SF_T2}/events.parquet")
    users = {
        r["event_type"]: {x["user_id"] for x in grp.collect()}
        for r in ev.select("event_type").distinct().collect()
        for grp in [
            ev.filter(F.col("event_type") == r["event_type"]).select("user_id").distinct()
        ]
    }
    assert len(rows) == len(users) * (len(users) - 1) // 2
    for r in rows:
        a, b = users[r["type_a"]], users[r["type_b"]]
        for est, exact in [
            (r["approx_users_a"], len(a)),
            (r["approx_users_b"], len(b)),
            (r["approx_union"], len(a | b)),
            (r["approx_intersection"], len(a & b)),
        ]:
            assert abs(est - exact) <= max(0.05 * exact, 2), (r, est, exact)


def test_rolling_median_all_null_frame_yields_null(spark):
    """collect_list drops NULLs, so a frame of only NULL values is an
    empty array — the operator must yield NULL like the oracle's
    median, never raise on element_at(arr, 0)."""
    import datetime as dt

    from engine.windows import q_win_rolling_median  # noqa: F401 — registers
    from engine.registry import get
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os, shutil

    tmp = tempfile.mkdtemp()
    try:
        src = "/root/testdata/sf0.001"
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            shutil.copyfile(f"{src}/{t}.parquet", f"{tmp}/{t}.parquet")
        ev = pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(
                    [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(3)]
                ),
                "user_id": [7, 7, 7],
                "event_type": ["click"] * 3,
                "value": [None, None, 5.0],
                "props": ["{}"] * 3,
            }
        )
        pq.write_table(pa.Table.from_pandas(ev), f"{tmp}/events.parquet")
        fn, _ = get("q_win_rolling_median")
        out = {r["event_id"]: r["med10"] for r in fn(spark, tmp).collect()}
        assert out[1] is None and out[2] is None  # all-NULL frames
        assert out[3] == 5.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bloom_join_prunes_probe_without_false_negatives(spark):
    """The bloom pre-filter must (a) pass EVERY true-matching probe row
    (no false negatives — a structural bloom property, asserted here
    against the exact semi-join), and (b) actually prune: survivors
    should be far closer to the true-match count than to the full
    probe side (2^16 bits / k=3 targets ~1% FP at this build
    cardinality)."""
    from engine.io import load_table
    from pyspark.sql import functions as F

    sf = SF_SMOKE
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey")
    n_probe = li.count()
    true_matches = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    ).count()

    # rebuild the operator's survivor set by running its internal
    # pipeline up to the bloom filter: reuse the full query but count
    # the post-filter pre-join cardinality via the exact join identity
    # (survivors >= true matches is implied by result equality; here
    # we bound the FP overhead explicitly)
    from engine.relational import q_join_bloom

    result = q_join_bloom(spark, sf).collect()
    joined_lines = sum(r["n_lines"] for r in result)
    assert joined_lines == true_matches  # no false negatives end-to-end

    # FP-rate bound: survivors can't be measured without duplicating
    # the internal pipeline, so bound it structurally: the bloom bitmap
    # has at most k*|build| set bits out of 2^16 -> FP rate under
    # (k*n/m)^k; with the smoke build side that is << 1%, so pruning
    # leaves well under 5% of the probe side. Assert the *bitmap* math
    # holds for the build cardinality actually used.
    n_build = orders.count()
    fp_bound = (3 * n_build / (1 << 16)) ** 3
    assert fp_bound < 0.05
    assert true_matches < 0.2 * n_probe  # the scenario is genuinely selective


def test_tdigest_quantile_accuracy(spark):
    """t-digest contract: per-flag p50/p95/p99 estimates land within
    2% RANK error of the exact distribution (delta=100 gives ~1%
    worst-case at the median, tighter at the tails under the k1
    scale), and the sketch's n is exactly the group count."""
    import bisect

    from engine.registry import all_queries

    est = {r["flag"]: r for r in all_queries()["q_agg_tdigest"](spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    for flag in est:
        vals = sorted(
            r["p"]
            for r in li.filter(F.col("l_returnflag") == flag)
            .select(F.col("l_extendedprice").cast("double").alias("p"))
            .collect()
        )
        n = len(vals)
        assert est[flag]["n"] == n
        for q, col in ((0.50, "p50"), (0.95, "p95"), (0.99, "p99")):
            v = est[flag][col]
            # rank of the estimate within the exact sorted values
            lo = bisect.bisect_left(vals, v) / n
            hi = bisect.bisect_right(vals, v) / n
            err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert err <= 0.02, (flag, col, v, err)
