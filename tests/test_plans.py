"""Physical-plan regression tests: the scale properties SCALE.md claims
(pushdown, pruning, broadcast joins, no stray shuffles) asserted against
the actual executed plans so they can't silently regress."""

from __future__ import annotations

from chemharmony_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_pruning(spark):
    plan = _plan(Q.q01_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan schema must not include unused columns
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_q03_all_joins_broadcast(spark):
    plan = _plan(Q.q03_region_revenue(spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 5


def test_q14_having_filter_semi_join_broadcast(spark):
    plan = _plan(Q.q14_having_floor(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_q38_queries_broadcast_corpus_partitioned(spark):
    plan = _plan(Q.q38_cosine_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]" in plan


def test_q34_minhash_no_shuffle_before_unpivot(spark):
    # signature computation is array-native: the only exchange allowed is
    # AQE's final coalesce of the scan output (no aggregate exchange)
    plan = _plan(Q.q34_minhash_signatures(spark, SF))
    assert "HashAggregate" not in plan
