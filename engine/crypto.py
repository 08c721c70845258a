"""Crypto-ETL domain composites (SURVEY.md §1.1 [NAME] surface).

The reference's domain — a US-crypto / Zilliqa ETL pipeline — implies a
canonical set of market-data transforms beyond the generic operator
inventory: OHLCV bar construction, volume-weighted average price, and
rolling volatility. Each is a pure composition of already-verified
engine primitives (time-bucketed groupBy, min_by/max_by, range-frame
windows), registered with full DuckDB oracles.

Scale notes: bars and VWAP are single-shuffle hash aggregations on
(bucket, key); volatility is a partitioned range-frame window — none
funnels data through a single task and all run in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_bars_ohlcv",
    oracle="""
    SELECT DISTINCT
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bar_start,
           event_type,
           first_value(value) OVER w AS open,
           max(value) OVER w AS high,
           min(value) OVER w AS low,
           last_value(value) OVER w AS close,
           count(*) OVER w AS n_trades,
           round(sum(value) OVER w, 2) AS volume
    FROM events
    WINDOW w AS (PARTITION BY date_trunc('hour', ts), event_type
                 ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_bars_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLCV bars per event_type — the core market-data ETL
    transform. One hash aggregation: open/close via ``min_by``/``max_by``
    on the (ts, event_id) order key (no window, no second shuffle), so
    the plan is a single partial+final aggregate over (hour, type)."""
    ev = _t(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("bar_start", F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
        .groupBy("bar_start", "event_type")
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count("*").alias("n_trades"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
    )


@register(
    "q_vwap",
    oracle="""
    SELECT l_partkey,
           round(sum(l_extendedprice) / sum(l_quantity), 4) AS vwap,
           sum(l_quantity) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 3
    """,
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per part (lineitem's extendedprice
    is already price x quantity, TPC-H semantics): single hash agg +
    post-aggregation filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias("vwap"),
            F.sum("l_quantity").alias("total_qty"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 3)
        .drop("_n")
    )


@register(
    "q_win_volatility",
    oracle="""
    SELECT event_id, user_id,
           round(stddev_samp(value) OVER (PARTITION BY user_id ORDER BY epoch_s
                                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
               AS vol_1h
    FROM (SELECT event_id, user_id, value,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
          FROM events)
    """,
)
def q_win_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour volatility (sample stddev) per user over a RANGE
    frame — the tick-data risk metric. Partitioned window, no global
    sort; RANGE includes all peers at equal epoch_s so the result is
    deterministic without a unique tie-break."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn(
        "epoch_s", F.unix_timestamp(F.date_trunc("second", F.col("ts"))).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-3600, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.stddev_samp("value").over(w), 4).alias("vol_1h"),
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH s AS (SELECT event_id, user_id, value,
                      avg(value) OVER w AS mu,
                      stddev_samp(value) OVER w AS sigma
               FROM events
               WINDOW w AS (PARTITION BY user_id))
    SELECT event_id, user_id, round((value - mu) / sigma, 4) AS z
    FROM s
    WHERE abs((value - mu) / sigma) > 2.5
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier ticks: |z| > 2.5 against the user's own value
    distribution — the wash-trade / fat-finger surveillance primitive.
    Mean and stddev come from an unordered window over the user
    partition (no self-join, one shuffle); the z expression stays in
    codegen. At 100 TB this is the same single-exchange shape as
    q_win_volatility."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    z = (F.col("value") - mu) / sigma
    return (
        ev.select("event_id", "user_id", "value", mu.alias("mu"), sigma.alias("sigma"))
        .filter(F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 2.5)
        .select(
            "event_id",
            "user_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
    )


@register(
    "q_win_corr",
    oracle="""
    SELECT user_id,
           round(corr(value, epoch_us(ts) - 1704067200000000), 4) AS drift_corr,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 20
    """,
)
def q_win_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-vs-time correlation (price-drift detector): the
    co-moment aggregate ``corr`` with map-side partial aggregation —
    one shuffle of constant-size partial states per user, never the
    ticks themselves. Time is centered on the 2024-01-01 epoch before
    entering the co-moment sums so both engines do the arithmetic at
    the same (small) magnitude; HAVING suppresses degenerate tiny
    groups."""
    ev = _t(spark, sf_dir, "events")
    centered = (F.unix_micros("ts") - F.lit(1704067200000000)).cast("double")
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(F.corr(F.col("value"), centered), 4).alias("drift_corr"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("n_events") >= 20)
    )
