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


def test_q64_bucketed_join_no_exchange(spark, sf_dir):
    """The bucketed fact-fact join must have NO shuffle under the
    SortMergeJoin: both sides' files are pre-hashed on the join key."""
    from ssb_coefficient_maker_spark.sources.derived import bucketed_tables

    t_orders, t_lineitem = bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # values still correct vs the plain join
    assert joined.count() == load_table(spark, sf_dir, "lineitem").count()


def test_q65_backfill_touches_only_target_partition(spark, sf_dir):
    """Dynamic partition overwrite must leave non-target partition
    files physically untouched and double only the target day."""
    import os

    from ssb_coefficient_maker_spark.sources.derived import (
        BACKFILL_DAY,
        backfilled_events_path,
        partitioned_events_path,
    )

    bpath = backfilled_events_path(spark, sf_dir)
    # non-target partitions: identical values to the un-backfilled copy
    plain = spark.read.parquet(partitioned_events_path(spark, sf_dir))
    backed = spark.read.parquet(bpath)
    for day, factor in ((BACKFILL_DAY, 2.0), ("2024-01-06", 1.0)):
        a = plain.filter(F.col("event_date") == day).agg(F.sum("value")).head()[0]
        b = backed.filter(F.col("event_date") == day).agg(F.sum("value")).head()[0]
        assert abs(b - a * factor) < 1e-6
    # the target partition dir exists and others were not rewritten
    # after it (mtime ordering: backfill ran last at build time)
    target = os.path.join(bpath, f"event_date={BACKFILL_DAY}")
    other = os.path.join(bpath, "event_date=2024-01-06")
    assert os.path.isdir(target) and os.path.isdir(other)
    t_new = max(os.path.getmtime(os.path.join(target, f)) for f in os.listdir(target))
    t_old = max(os.path.getmtime(os.path.join(other, f)) for f in os.listdir(other))
    assert t_new >= t_old


def test_loaded_ts_is_plain_timestamp(spark, sf_dir):
    """Schema-drift canary: the testdata generator has shipped events.ts
    as TIMESTAMP(NANOS)-read-as-long in one round and tz-less
    TIMESTAMP(MICROS) (= TIMESTAMP_NTZ) in another. load_table must
    normalize every variant to a session-UTC TimestampType — epoch
    math (unix_micros), window frames and streaming watermarks all
    assume it. If this fails, the generator changed again: extend the
    normalization in sources/loaders.py, not the downstream queries."""
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), ev.schema["ts"].dataType
    # streaming source must agree with the batch loader
    from ssb_coefficient_maker_spark.streaming.windows import stream_events

    sev = stream_events(spark, sf_dir)
    assert isinstance(sev.schema["ts"].dataType, T.TimestampType), sev.schema["ts"].dataType
    # and epoch math must resolve (this is what broke under NTZ)
    ev.select(F.unix_micros("ts")).limit(1).collect()


def test_stale_derived_siblings_evicted(tmp_path):
    """Regenerated testdata mints a new fingerprint; the old
    ``{base}-{key}`` derived dirs for the same sf_dir must be deleted
    (round-2 ADVICE: unbounded temp growth across rounds)."""
    import os
    import tempfile

    from ssb_coefficient_maker_spark.sources.derived import (
        _derived_root,
        source_fingerprint,
    )

    sf = tmp_path / "sfx"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"a")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_derived")
    stale = os.path.join(root, "sfx-deadbeef0000")
    os.makedirs(os.path.join(stale, "events_by_date"), exist_ok=True)
    live = _derived_root(str(sf), "events_by_date")
    key = source_fingerprint(str(sf))[:12]
    assert f"sfx-{key}" in live
    assert not os.path.exists(stale)
