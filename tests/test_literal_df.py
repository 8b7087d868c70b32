"""r11 optimization: literal lookup tables must stay in the JVM.

``spark.createDataFrame(small_list)`` parallelizes pickled Python rows
into defaultParallelism slices (one python worker per core to scan a
handful of literals); ``literal_df`` builds the same rows as an
inline'd array-of-structs literal — same values, same types, zero
Python in the plan. These tests pin the value/type equivalence and the
no-Python plan shape.
"""

from __future__ import annotations

import pytest

from ssb_coefficient_maker_spark.sources.loaders import literal_df


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_literal_df_matches_createdataframe_scalars(spark):
    rows = [("A", 0.02), ("N", 0.01), ("R", 0.03)]
    schema = "l_returnflag string, fee_rate double"
    ref = spark.createDataFrame(rows, schema)
    got = literal_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert _rows(got) == _rows(ref)


def test_literal_df_none_cells_and_ints(spark):
    rows = [("low", 1.0), ("high", 3.0), (None, 2.0)]
    schema = "band string, weight double"
    ref = spark.createDataFrame(rows, schema)
    got = literal_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert _rows(got) == _rows(ref)

    rows2 = [(2,), (5,), (10,)]
    got2 = literal_df(spark, rows2, "threshold int")
    ref2 = spark.createDataFrame(rows2, "threshold int")
    assert got2.schema == ref2.schema
    assert _rows(got2) == _rows(ref2)


def test_literal_df_array_columns(spark):
    rows = [(0, [1.0, 2.0]), (1, [3.5, -4.25])]
    schema = "bucket int, cent array<double>"
    ref = spark.createDataFrame(rows, schema)
    got = literal_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert _rows(got) == _rows(ref)


def test_literal_df_large_table_fallback(spark):
    """Past the cell-count guard the builder must fall back to a
    single-slice createDataFrame (giant inline expression trees cost
    more in the optimizer than a tiny Python scan; measured on q228's
    centroid table) — same values, same schema, one partition."""
    rows = [(i, [float(i), float(i) * 0.5] * 40) for i in range(10)]
    schema = "bucket int, cent array<double>"
    ref = spark.createDataFrame(rows, schema)
    got = literal_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert got.rdd.getNumPartitions() == 1
    assert _rows(got) == _rows(ref)


def test_literal_df_plan_is_jvm_only(spark):
    """No Python evaluation and no pickled-RDD scan in the plan."""
    df = literal_df(spark, [(1,), (2,)], "x int")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" not in plan


def test_rightsized_partition_counts(spark):
    import pandas as pd

    from ssb_coefficient_maker_spark.catalog import _rightsized

    pdf = pd.DataFrame({"v": range(300)})
    df = spark.createDataFrame(pdf)
    assert _rightsized(df, 300).rdd.getNumPartitions() == 1
    # a row count above the chunk target keeps multiple partitions
    # (coalesce never increases, so the cap is the incoming count)
    want = _rightsized(df, 25_000).rdd.getNumPartitions()
    assert 1 <= want <= max(3, df.rdd.getNumPartitions())
