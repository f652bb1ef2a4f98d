"""Bucketed co-located join: the plan must contain NO Exchange on either
side — the whole point of paying the shuffle at write time (SURVEY.md §4,
`sources/bucketing.py`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.catalog import load_table
from hainan_big_data_recommend_system_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default spark-warehouse dir (spark.sql.warehouse.dir is a static conf);
    # tables are dropped on teardown and the dir is gitignored
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # forbid broadcast so the test proves bucket co-location, not a tiny-side
    # broadcast that would also avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey").count()
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert bucketed == plain
