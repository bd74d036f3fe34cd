"""Bucketed-table joins: the 100 TB layout lever — both sides written
with the same bucketing spec join with NO Exchange in the plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.sources.writers import write_bucketed_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cat = load_catalog(spark, SF_SMOKE)
    write_bucketed_table(
        cat.table("orders"), "orders_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        cat.table("lineitem"), "lineitem_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable auto-broadcast so the planner must consider co-location
    # (at real scale neither side would be broadcastable anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bkt")
        li = spark.table("lineitem_bkt")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).select("o_orderkey", "l_quantity")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # same join through the unbucketed parquet DOES shuffle
        cat = load_catalog(spark, SF_SMOKE)
        o2 = cat.table("orders")
        li2 = cat.table("lineitem")
        plain = o2.join(li2, o2.o_orderkey == li2.l_orderkey).select("o_orderkey", "l_quantity")
        plain.collect()
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o = spark.table("orders_bkt")
    li = spark.table("lineitem_bkt")
    n_bucketed = o.join(li, o.o_orderkey == li.l_orderkey).count()
    cat = load_catalog(spark, SF_SMOKE)
    n_plain = (
        cat.table("orders")
        .join(cat.table("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert n_bucketed == n_plain
