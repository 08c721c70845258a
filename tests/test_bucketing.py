"""Bucketed-table co-located join: write both join sides bucketed on
the key, then prove the join plan needs no Exchange and returns the
same rows as the plain join (engine/io.py::write_bucketed)."""

from __future__ import annotations

import contextlib
import io as _io

from engine.io import load_table, write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "li_bucketed", "l_orderkey", buckets=4, path=str(tmp_path / "li"))
    write_bucketed(o, "o_bucketed", "o_orderkey", buckets=4, path=str(tmp_path / "o"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = spark.table("li_bucketed"), spark.table("o_bucketed")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # identical result to the plain (shuffling) join
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
