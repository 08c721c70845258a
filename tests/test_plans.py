"""Physical-plan regression guards (SURVEY §4 scale requirements).

Correctness sweeps prove the answers; these tests pin the *plans* — the
properties that decide whether an operator survives a 100 TB scale-up:
filters reaching the parquet scan, column pruning, broadcast vs
sort-merge join choice, TakeOrderedAndProject for top-k, and the
absence of cartesian products and undocumented single-partition
windows anywhere in the registry."""

from __future__ import annotations

import contextlib
import io

import pytest

from engine.registry import all_queries
from tests.conftest import SF_SMOKE

# Streaming queries execute a full micro-batch replay when built, so
# explaining them here would re-run every stream; their semantics are
# covered by the oracle sweep and tests/test_streaming.py. Everything
# else is explained without execution.
_SKIP_PREFIX = "q_stream_"

# Queries allowed to contain a single-partition exchange/window, each
# with the documented reason.
_SINGLE_PARTITION_OK = {
    "q_agg_global",       # one output row by definition
    "q_agg_approx_distinct",
    "q_topk",             # TakeOrderedAndProject gathers k rows
    "q_limit_offset",     # global LIMIT/OFFSET contract
    "q_sort_multi",       # global ORDER BY contract (rangepartitioning)
    "q_win_ntile",        # 2-pass rank: window over the 32-row counts table
    "q_text_tfidf",       # broadcast 1-row corpus-size aggregate
    "q_sim_topk",         # global top-k gather after per-partition sort
    "q_sim_topk_lsh",     # MLlib approxNearestNeighbors internal gather
    "q_tokenize",         # global tail LIMIT for display contract
    "q_udtf",             # single lateral-join demo slice
    "q_fn_cond_null",     # ordered display contract
    "q_multimodal_features",  # 1-row total-bytes agg sizes the repartition
    "q_profile_table",    # whole-table profile reduces to one wide row
    "q_funnel",           # per-stage counts reduce to one row each
}

# Deliberate non-equi/broadcast-nested-loop shapes: q_join_cross is the
# 5x5 dim cross join; q_sim_topk and q_text_tfidf fold a broadcast
# ONE-ROW aggregate (query vector / corpus size) into the plan — a
# 1-row BroadcastNestedLoopJoin is the scalar-subquery pattern and is
# size-independent.
_CROSS_OK = {"q_join_cross", "q_sim_topk", "q_text_tfidf"}


@pytest.fixture(scope="module")
def plans(spark):
    out: dict[str, str] = {}
    for key, fn in all_queries().items():
        if key.startswith(_SKIP_PREFIX):
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_SMOKE).explain("formatted")
        out[key] = buf.getvalue()
    return out


def test_no_cartesian_products(plans):
    bad = [
        k
        for k, p in plans.items()
        if k not in _CROSS_OK
        and ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
    ]
    assert not bad, f"unplanned cartesian/nested-loop joins in: {bad}"


def test_single_partition_stages_are_documented(plans):
    bad = [
        k
        for k, p in plans.items()
        if "SinglePartition" in p and k not in _SINGLE_PARTITION_OK
    ]
    assert not bad, f"undocumented single-partition stages in: {bad}"


def test_filter_reaches_parquet_scan(plans):
    p = plans["q_filter"]
    assert "PushedFilters:" in p
    pushed = [l for l in p.splitlines() if "PushedFilters:" in l]
    assert any("[]" not in l for l in pushed), "q_filter pushed no predicates"


def test_column_pruning_in_projection(plans):
    # q_project needs 4 of lineitem's 11 columns; the scan must not
    # read the others
    scan = [l for l in plans["q_project"].splitlines() if "ReadSchema" in l]
    assert scan, "no parquet scan found"
    for unused in ("l_tax", "l_quantity", "l_shipdate", "l_returnflag"):
        assert unused not in scan[0], f"q_project scan reads unused {unused}"


def test_join_strategies(plans):
    assert "BroadcastHashJoin" in plans["q_join_broadcast"]
    # q_join_sortmerge leaves strategy to AQE: at smoke scale the tables
    # are under the broadcast threshold so BHJ is the right pick (SMJ
    # appears at sf0.1) — what must never appear is a nested loop.
    assert (
        "SortMergeJoin" in plans["q_join_sortmerge"]
        or "BroadcastHashJoin" in plans["q_join_sortmerge"]
    )
    # as-of join must stay an equi-anchored hash/merge join, never a
    # range-only nested loop
    assert (
        "SortMergeJoin" in plans["q_join_asof"]
        or "BroadcastHashJoin" in plans["q_join_asof"]
    )
    # the salted skew join must stay in the shuffled-hash regime (a
    # broadcast would make the salt meaningless)
    assert "ShuffledHashJoin" in plans["q_join_skew_salted"]


def test_topk_uses_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["q_topk"]


def test_map_only_ops_have_no_exchange(plans):
    # content-addressed split and stratified sample are pure map stages
    for k in ("q_split_hash", "q_sample_stratified"):
        assert "Exchange" not in plans[k], f"{k} shuffles but should be map-only"
