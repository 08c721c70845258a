"""Statistical inference operators (SURVEY.md §2.12a adjacency, added
late r4): the experiment-analysis / trend-detection layer of an
analytics engine.

Reference parity: the reference repo has no code (SURVEY.md §0); these
implement the committed inventory — the A/B significance test and the
trend regression every product/market analytics stack ships.

Cross-engine float policy (engine/registry.py docstring): both
operators aggregate EXACT INTEGERS only (floor-cents values, day
indexes) — sums of bigints are order-independent, so the final
double-precision formulas (Welch t, OLS slope) evaluate on identical
inputs on both engines and round() is safe.

Scale design (100 TB intent):
- both collapse the fact table in ONE hash aggregate with map-side
  combine (t-test: conditional sums per event_type; trend: per
  (type, day) partials then a |types|x|days|-bounded re-aggregate);
  no windows, no joins, no per-row Python.
- the A/B assignment is the engine's standard content-addressed md5
  bucket (engine/pipeline.py convention) — deterministic, shard-stable,
  reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import register

# md5-hex first-8-hexit bucket, identical in Spark and DuckDB (the
# q_split_hash idiom): even bucket -> arm A, odd -> arm B. Built lazily
# -- Column construction requires an active SparkContext, which does
# not exist at import time.
def _spark_bucket() -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )


_SQL_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2"
)


@register(
    "q_stats_ttest",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             count(*) FILTER (WHERE {_SQL_BUCKET} = 0) AS n_a,
             count(*) FILTER (WHERE {_SQL_BUCKET} = 1) AS n_b,
             CAST(sum(CASE WHEN {_SQL_BUCKET} = 0
                           THEN CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT) AS s_a,
             CAST(sum(CASE WHEN {_SQL_BUCKET} = 1
                           THEN CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT) AS s_b,
             CAST(sum(CASE WHEN {_SQL_BUCKET} = 0
                           THEN CAST(floor(value * 100) AS BIGINT)
                              * CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT) AS ss_a,
             CAST(sum(CASE WHEN {_SQL_BUCKET} = 1
                           THEN CAST(floor(value * 100) AS BIGINT)
                              * CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT) AS ss_b
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           round(s_a / 100.0 / n_a, 4) AS mean_a,
           round(s_b / 100.0 / n_b, 4) AS mean_b,
           round(
             (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
             / sqrt(
                 ((ss_a - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1)) / n_a
               + ((ss_b - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1)) / n_b
               ), 4) + 0.0 AS t_stat
    FROM g WHERE n_a > 1 AND n_b > 1
    """,
)
def q_stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-statistic per event_type between two
    deterministic md5-hash user arms (the A/B experiment readout).

    ONE conditional hash aggregate computes both arms' (n, Σcents,
    Σcents²) exactly; mean/variance/t evaluate driver-free in codegen
    from those integers. Welch (unequal variances) rather than pooled —
    the form real experiment platforms report. The t close to 0 is the
    expected null result for a hash split, which is itself the A/A
    sanity check those platforms run.
    """
    cents = F.floor(F.col("value") * 100).cast("long")
    in_a, in_b = _spark_bucket() == 0, _spark_bucket() == 1
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.when(in_a, 1)).alias("n_a"),
            F.count(F.when(in_b, 1)).alias("n_b"),
            F.sum(F.when(in_a, cents)).alias("s_a"),
            F.sum(F.when(in_b, cents)).alias("s_b"),
            F.sum(F.when(in_a, cents * cents)).alias("ss_a"),
            F.sum(F.when(in_b, cents * cents)).alias("ss_b"),
        )
        .filter((F.col("n_a") > 1) & (F.col("n_b") > 1))
    )
    mean_a_d = F.col("s_a").cast("double") / F.col("n_a")
    mean_b_d = F.col("s_b").cast("double") / F.col("n_b")
    var_a = (F.col("ss_a") - F.col("s_a").cast("double") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b").cast("double") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    t = (mean_a_d - mean_b_d) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("s_a") / 100.0 / F.col("n_a"), 4).alias("mean_a"),
        F.round(F.col("s_b") / 100.0 / F.col("n_b"), 4).alias("mean_b"),
        (F.round(t, 4) + 0.0).alias("t_stat"),
    )


@register(
    "q_stats_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts))
               AS x,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 / 100.0, 4) + 0.0 AS slope_per_day,
           round((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * sy)
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) * sx)
                 / n / 100.0, 4) + 0.0 AS intercept
    FROM s WHERE n > 1
    ORDER BY event_type
    """,
)
def q_stats_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend: slope and intercept of daily revenue vs day
    index (drift/decay detection over the event stream).

    Two-level plan: the fact table collapses to |types|x|days| daily
    cents totals in ONE map-side-combined aggregate; the OLS moments
    (Σx, Σy, Σxy, Σx²) re-aggregate that bounded table as exact
    bigints, and slope/intercept are closed-form doubles from them —
    no window, no join, deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.lit("2024-01-01").cast("timestamp")
            ).alias("x"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).filter(F.col("n") > 1)
    slope = (
        F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "event_type",
        "n",
        (F.round(slope / 100.0, 4) + 0.0).alias("slope_per_day"),
        (F.round(intercept / 100.0, 4) + 0.0).alias("intercept"),
    ).orderBy("event_type")


@register(
    "q_stats_did",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             {_SQL_BUCKET} AS arm,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS post,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT event_type, arm, post, count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM g GROUP BY 1, 2, 3
    ),
    wide AS (
      SELECT event_type,
             max(CASE WHEN arm = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS a_pre,
             max(CASE WHEN arm = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS a_post,
             max(CASE WHEN arm = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS b_pre,
             max(CASE WHEN arm = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS b_post,
             CAST(sum(n) AS BIGINT) AS n_total
      FROM cells GROUP BY event_type
    )
    SELECT event_type, n_total,
           round(((a_post - a_pre) - (b_post - b_pre)) / 100.0, 4) + 0.0 AS did
    FROM wide
    WHERE a_pre IS NOT NULL AND a_post IS NOT NULL
      AND b_pre IS NOT NULL AND b_post IS NOT NULL
    ORDER BY event_type
    """,
)
def q_stats_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences per event_type: treatment (md5 arm A)
    vs control (arm B), before vs after a cutover date — the causal-
    inference readout for a launch without a randomized holdback
    (parallel-trends estimator). On a hash split with no real
    treatment the DiD ≈ 0, which is the placebo test run before
    trusting the estimator on real data.

    ONE hash aggregate builds the 4 (arm × period) cells per type from
    exact integer (n, Σcents); the 2×2 pivot and the DiD contrast are
    codegen arithmetic on those exact cell means — no joins, no
    windows, deterministic doubles.
    """
    cutover = F.lit("2024-01-16").cast("timestamp")
    cents = F.floor(F.col("value") * 100).cast("long")
    cells = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            _spark_bucket().alias("arm"),
            F.when(F.col("ts") >= cutover, 1).otherwise(0).alias("post"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "arm", "post")
        .agg(F.count("*").alias("n"), F.sum("cents").cast("long").alias("s"))
    )
    mean = F.col("s").cast("double") / F.col("n")
    cell = lambda a, p: F.max(  # noqa: E731
        F.when((F.col("arm") == a) & (F.col("post") == p), mean)
    )
    wide = cells.groupBy("event_type").agg(
        cell(0, 0).alias("a_pre"),
        cell(0, 1).alias("a_post"),
        cell(1, 0).alias("b_pre"),
        cell(1, 1).alias("b_post"),
        F.sum("n").cast("long").alias("n_total"),
    )
    did = (
        (F.col("a_post") - F.col("a_pre")) - (F.col("b_post") - F.col("b_pre"))
    ) / 100.0
    return (
        wide.filter(
            F.col("a_pre").isNotNull()
            & F.col("a_post").isNotNull()
            & F.col("b_pre").isNotNull()
            & F.col("b_post").isNotNull()
        )
        .select("event_type", "n_total", (F.round(did, 4) + 0.0).alias("did"))
        .orderBy("event_type")
    )


@register(
    "q_stats_chisq",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY pri, st
    ),
    rt AS (SELECT pri, CAST(sum(o) AS BIGINT) AS row_tot FROM cell GROUP BY pri),
    ct AS (SELECT st, CAST(sum(o) AS BIGINT) AS col_tot FROM cell GROUP BY st),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT pri) AS BIGINT) AS r,
                   CAST(count(DISTINCT st) AS BIGINT) AS c
            FROM cell),
    q AS (
      SELECT CAST(floor(
               pow(cell.o - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
               / (CAST(row_tot AS DOUBLE) * col_tot / n) * 1000000
             ) AS BIGINT) AS qterm, n, r, c
      FROM cell JOIN rt USING (pri) JOIN ct USING (st), tot
    )
    SELECT round(sum(qterm) / 1000000.0, 4) AS chi2,
           any_value((r - 1) * (c - 1)) AS dof,
           any_value(n) AS n
    FROM q
    """,
)
def q_stats_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the order-priority ×
    order-status contingency table — the categorical-association
    companion to the Welch t-test (q_stats_ttest).

    Scale shape: ONE hash aggregate collapses the fact table to the
    r×c cell table (map-side combine; ≤15 rows here, ≤|domains|²
    always); row totals, column totals, and the (n, r, c) scalar are
    re-aggregates of THAT table, broadcast back — the fact table is
    scanned once and nothing larger than the cell table ever joins.
    Float policy: expected counts e = row·col/n evaluate on exact
    bigints (deterministic double division on both engines), each
    cell's (o−e)²/e is quantized to a bigint before the final sum so
    the statistic is order-independent, and dof is pure integer
    arithmetic."""
    cell = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
        )
        .agg(F.count("*").cast("long").alias("o"))
        .persist()
    )
    rt = cell.groupBy("pri").agg(F.sum("o").cast("long").alias("row_tot"))
    ct = cell.groupBy("st").agg(F.sum("o").cast("long").alias("col_tot"))
    tot = cell.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("pri").cast("long").alias("r"),
        F.countDistinct("st").cast("long").alias("c"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    qterm = F.floor(F.pow(F.col("o") - e, 2) / e * 1000000).cast("long")
    joined = (
        cell.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(tot))
    )
    return joined.agg(
        F.round(F.sum(qterm) / 1000000.0, 4).alias("chi2"),
        F.any_value((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.any_value(F.col("n")).alias("n"),
    )


@register(
    "q_stats_changepoint",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS di,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT event_type, di, day, y,
             CAST(row_number() OVER win AS BIGINT) AS k,
             CAST(sum(y) OVER win AS BIGINT) AS s1k,
             CAST(sum(y * y) OVER win AS BIGINT) AS s2k,
             CAST(count(*) OVER tot AS BIGINT) AS n,
             CAST(sum(y) OVER tot AS BIGINT) AS s1,
             CAST(sum(y * y) OVER tot AS BIGINT) AS s2
      FROM d
      WINDOW
        win AS (PARTITION BY event_type ORDER BY di
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        tot AS (PARTITION BY event_type)
    ),
    c AS (
      SELECT event_type, day, n, s1, s2,
             CAST(floor(
               (s2k - CAST(s1k AS DOUBLE) * s1k / k)
               + ((s2 - s2k) - CAST(s1 - s1k AS DOUBLE) * (s1 - s1k) / (n - k))
             ) AS BIGINT) AS qcost,
             di
      FROM w WHERE k < n
    ),
    m AS (
      SELECT event_type,
             min(struct_pack(qcost := qcost, di := di, day := day)) AS mx,
             any_value(n) AS n_days,
             any_value(CAST(floor(CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * s1 / n) AS BIGINT))
               AS qsse_total
      FROM c GROUP BY event_type
    )
    SELECT event_type, mx.day AS split_day, n_days,
           round((qsse_total - mx.qcost) / 10000.0, 2) AS sse_drop
    FROM m ORDER BY event_type
    """,
)
def q_stats_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single changepoint per event type (binary segmentation, the
    first split of PELT/BinSeg): the day index k minimizing
    SSE(1..k) + SSE(k+1..n) of the daily-revenue series, with the
    variance-reduction the split buys — the structural-break screen
    behind regime detection and A/B cutover audits.

    Fully windowed, no iteration: one hash agg to the |types|×|days|
    daily table, then ONE event_type exchange carries the cumulative
    (k, Σy, Σy²) prefix AND the per-type totals; every candidate
    split's cost is closed-form from those exact bigints
    (SSE = Σy² − (Σy)²/k), quantized to a bigint so the per-type
    argmin is the portable lexicographic MIN over a (cost, day)
    struct (the q_agg_argmax trick, tie → earliest day). Cents² units
    divide back to dollars² only in the final rounded column."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
            .cast("long")
            .alias("di"),
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "di", "day")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    w = d.select(
        "event_type",
        "di",
        "day",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("di"))
        .cast("long")
        .alias("k"),
        F.sum("y").over(win).cast("long").alias("s1k"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("long").alias("s2k"),
        F.count("*").over(tot).cast("long").alias("n"),
        F.sum("y").over(tot).cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).over(tot).cast("long").alias("s2"),
    )
    k, s1k, s2k = F.col("k"), F.col("s1k"), F.col("s2k")
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    cost = (s2k - s1k.cast("double") * s1k / k) + (
        (s2 - s2k) - (s1 - s1k).cast("double") * (s1 - s1k) / (n - k)
    )
    c = w.filter(k < n).select(
        "event_type",
        "day",
        "di",
        "n",
        "s1",
        "s2",
        F.floor(cost).cast("long").alias("qcost"),
    )
    sse_total = F.floor(s2.cast("double") - s1.cast("double") * s1 / n).cast("long")
    m = c.groupBy("event_type").agg(
        F.min(
            F.struct(F.col("qcost"), F.col("di"), F.col("day"))
        ).alias("mx"),
        F.any_value(n).alias("n_days"),
        F.any_value(sse_total).alias("qsse_total"),
    )
    return m.select(
        "event_type",
        F.col("mx.day").alias("split_day"),
        "n_days",
        F.round((F.col("qsse_total") - F.col("mx.qcost")) / 10000.0, 2).alias(
            "sse_drop"
        ),
    ).orderBy("event_type")
