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
