"""Plan-shape assertions: pushdown, pruning, broadcast, partial agg.

These encode the 100 TB design review (task brief: "after each
operator works, explain the plan and iterate until it's the plan you'd
want"): a filter that doesn't reach the scan, a dimension join that
shuffles instead of broadcasting, or an aggregate without map-side
combine would silently survive correctness tests — they fail here.
"""

from __future__ import annotations

from jobminer_spark import QUERIES, load_all_operators
from jobminer_spark.plans import physical_plan
from tests.conftest import SF_DIR

load_all_operators()


def _plan(spark, name):
    return physical_plan(QUERIES[name](spark, SF_DIR))


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    # two HashAggregate phases = map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_extendedprice" in read_schema
    # untouched fact columns must NOT be read
    assert "l_partkey" not in read_schema
    assert "l_returnflag" not in read_schema


def test_q3_broadcasts_customer(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dimension_chain(spark):
    plan = _plan(spark, "q5_region_nation_revenue")
    assert "BroadcastHashJoin" in plan


def test_skill_classification_broadcasts_dictionary(spark):
    plan = _plan(spark, "skill_token_classification")
    assert "BroadcastHashJoin" in plan
    # the corpus side must never be broadcast-collected; the dict is tiny
    assert "SortMergeJoin" not in plan


def test_semi_anti_join_shapes(spark):
    semi = _plan(spark, "semi_join_customers_with_open_orders")
    anti = _plan(spark, "anti_join_customers_without_orders")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_exact_dedup_partial_aggregates(spark):
    plan = _plan(spark, "dedup_exact_text")
    assert plan.count("HashAggregate") >= 2  # map-side combine on the hash key
