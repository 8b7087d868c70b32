"""Bucketed-storage co-located join: the 100 TB join strategy.

Writing both fact tables bucketed by the join key lets Spark plan the
join WITHOUT a shuffle exchange on either side — at scale this turns
the dominant cost of a fact-fact join into a local merge. This test
proves the plan shape, not just the result.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table

DB = "bucketing_test_db"


@pytest.fixture(scope="module", autouse=True)
def bucket_db(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    yield
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{DB}.li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{DB}.orders_bucketed")
    )
    a = spark.table(f"{DB}.li_bucketed")
    b = spark.table(f"{DB}.orders_bucketed")
    # hint the merge path: at this test scale Catalyst would broadcast
    # (trivially shuffle-free); the claim under test is that the
    # SORT-MERGE path needs no exchange thanks to bucketing
    joined = a.hint("merge").join(b.hint("merge"), "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not introduce a shuffle: no Exchange below
    # the SortMergeJoin (the final single-group agg has its own tiny
    # exchange, so count exchanges feeding the join instead)
    join_idx = plan.find("SortMergeJoin")
    assert join_idx != -1, f"expected SortMergeJoin in:\n{plan[:2000]}"
    below_join = plan[join_idx:]
    assert "Exchange hashpartitioning(l_orderkey" not in below_join, (
        "bucketed join still shuffles on the join key:\n" + below_join[:2000]
    )
    # and it must be correct
    row = joined.collect()[0]
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s"))
        .collect()[0]
    )
    assert row["n"] == expected["n"] and abs(row["s"] - expected["s"]) < 1e-6
