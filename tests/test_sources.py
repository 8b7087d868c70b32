"""Source/sink round-trips: CSV, JSON, parquet (SURVEY §2 Part C
sources/sinks)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_coefficient_maker_spark.sources.loaders import (
    load_table,
    read_csv,
    read_json,
    write_parquet,
)

TMP = "/root/repo/.tmp_test_sources"


@pytest.fixture(scope="module", autouse=True)
def cleanup():
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_csv_roundtrip(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", True).csv(f"{TMP}/nation_csv")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, f"{TMP}/nation_csv", schema)
    assert back.count() == nation.count()
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_json_roundtrip(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").json(f"{TMP}/region_json")
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    back = read_json(spark, f"{TMP}/region_json", schema)
    assert back.count() == region.count()


def test_parquet_sink_partitioned(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    write_parquet(orders, f"{TMP}/orders_part", partition_by=["yr"])
    back = spark.read.parquet(f"{TMP}/orders_part")
    assert back.count() == orders.count()
    # partition pruning: a filter on the partition column must prune
    pruned = back.filter(F.col("yr") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan or "yr#" in plan
    assert pruned.count() == orders.filter(F.col("yr") == 1996).count()


def test_q59_partition_pruning_plan(spark, sf_dir):
    """The registered q59 query's scan must prune by the partition
    column (directory-level skip), not row-filter the full table."""
    from ssb_coefficient_maker_spark.queries import q59_partition_pruning

    df = q59_partition_pruning(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the date predicate binds as a PartitionFilter on event_date...
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_date" in pf
    # ...and only 5 of the 30 daily directories are planned
    from ssb_coefficient_maker_spark.sources.derived import read_partitioned_events

    ev = read_partitioned_events(spark, sf_dir)
    sliced = ev.filter(F.col("event_date").between("2024-01-05", "2024-01-09"))
    n_files = sliced.select(F.input_file_name()).distinct().count()
    all_files = ev.select(F.input_file_name()).distinct().count()
    assert n_files < all_files
    dates = [r[0] for r in sliced.select("event_date").distinct().collect()]
    assert len(dates) == 5


def test_q60_q61_derived_scans(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q60_csv_scan, q61_json_scan

    orders = load_table(spark, sf_dir, "orders")
    got = {r["o_orderpriority"]: r["n_orders"] for r in q60_csv_scan(spark, sf_dir).collect()}
    exp = {
        r["o_orderpriority"]: r["n"]
        for r in orders.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp
    part = load_table(spark, sf_dir, "part")
    assert q61_json_scan(spark, sf_dir).count() == part.select("p_brand").distinct().count()


def test_q62_approx_percentile_matches_exact(spark, sf_dir):
    """At accuracy 1e6 the GK sketch's rank error is <1 row at test
    scale: result equals the exact discrete percentile."""
    from ssb_coefficient_maker_spark.queries import q62_approx_percentile

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["p"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile_approx(l_extendedprice, 0.5, 2147483647)").alias("p"))
        .collect()
    }
    got = {r["l_returnflag"]: r["p50"] for r in q62_approx_percentile(spark, sf_dir).collect()}
    for k, v in got.items():
        assert abs(v - round(exact[k], 4)) < 1e-9
