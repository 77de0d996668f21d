"""Physical-plan assertions: the properties that make these queries
scale are checked, not assumed (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans import QUERIES
from dados_publicos_etl_spark.plans import catalog  # noqa: F401


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    plan = _plan(QUERIES["q1_pricing_summary"].fn(spark, sf_dir))
    # column pruning: the 11-column lineitem scan reads only 7
    assert "l_orderkey" not in plan.split("FileScan")[1].split("]")[0]
    # filter pushdown reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_dimension(spark, sf_dir):
    plan = _plan(QUERIES["q3_shipping_priority"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the selective dim filter is pushed into the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(QUERIES["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semi_join_plans_semi(spark, sf_dir):
    plan = _plan(QUERIES["join_semi"].fn(spark, sf_dir))
    assert "LeftSemi" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """groupBy compiles to partial_ + final HashAggregate around one
    Exchange — map-side combine is what keeps 100 TB aggs feasible."""
    plan = _plan(
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_cnae_clean_is_shuffle_free(spark, sf_dir):
    """The reference-parity cleaning query is a narrow map: no
    Exchange anywhere in the plan."""
    plan = _plan(QUERIES["cnae_clean"].fn(spark, sf_dir))
    assert "Exchange" not in plan
