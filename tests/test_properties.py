"""Property-based invariants over random small tables (SURVEY §5.2.4,
hypothesis — the reference's intended dev stack per .gitignore:50)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
    min_size=0,
    max_size=60,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@_settings
def test_union_counts_add(spark, data):
    df = spark.createDataFrame(data, "k int, v double") if data else spark.createDataFrame([], "k int, v double")
    assert df.unionByName(df).count() == 2 * df.count()


@given(data=rows)
@_settings
def test_distinct_idempotent(spark, data):
    df = spark.createDataFrame(data, "k int, v double") if data else spark.createDataFrame([], "k int, v double")
    d1 = df.select("k").distinct()
    assert d1.count() == d1.distinct().count()


@given(data=rows, data2=rows)
@_settings
def test_semi_anti_partition(spark, data, data2):
    a = spark.createDataFrame(data, "k int, v double") if data else spark.createDataFrame([], "k int, v double")
    b = spark.createDataFrame(data2, "k int, v double") if data2 else spark.createDataFrame([], "k int, v double")
    semi = a.join(b, "k", "left_semi").count()
    anti = a.join(b, "k", "left_anti").count()
    assert semi + anti == a.count()


@given(data=rows)
@_settings
def test_groupby_sum_equals_global_sum(spark, data):
    df = spark.createDataFrame(data, "k int, v double") if data else spark.createDataFrame([], "k int, v double")
    per_group = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_a = per_group.agg(F.sum("s")).collect()[0][0]
    total_b = df.agg(F.sum("v")).collect()[0][0]
    if total_a is None or total_b is None:
        assert total_a is None and total_b is None
    else:
        assert abs(total_a - total_b) <= 1e-6 * max(1.0, abs(total_b))
