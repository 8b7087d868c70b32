"""Round-4 operator tests: correlated-subquery decorrelation and
multi-feature windowing (plan shapes promised in the docstrings)."""

from __future__ import annotations


def test_q116_scalar_subquery_decorrelates(spark, sf_dir):
    """The correlated scalar subquery must compile to ONE per-part
    Aggregate joined to the outer scan — not a per-row re-scan. The
    optimized plan therefore contains an Inner Join whose right side
    is the grouped average, and no residual subquery node."""
    from ssb_coefficient_maker_spark.queries import q116_correlated_scalar_subquery

    plan = (
        q116_correlated_scalar_subquery(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join Inner" in plan, plan
    assert "avg(l_quantity)" in plan, plan
    assert "ScalarSubquery" not in plan, plan


def test_q118_universal_quantification_decorrelates(spark, sf_dir):
    """EXISTS / NOT EXISTS with an inequality correlation must become
    left-semi and left-anti joins (the ALL-ness is the anti join)."""
    from ssb_coefficient_maker_spark.queries import q118_universal_quantification

    plan = (
        q118_universal_quantification(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q120_single_window_operator(spark, sf_dir):
    """lag-1, the 7-day RANGE sum, and the running cumulative share
    one partitioning/ordering, so the physical plan runs them in a
    single Window operator over a single user_id exchange — three
    features, one shuffle, one sort for the window stage."""
    from ssb_coefficient_maker_spark.queries import q120_rolling_features

    plan = (
        q120_rolling_features(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1, plan
    # exchanges: daily groupBy, window repartition, final orderBy —
    # no EXTRA shuffle sneaks in between the window functions
    assert plan.count("Exchange") <= 3, plan


def test_q120_window_semantics_vs_pandas(spark, sf_dir):
    """RANGE frames over epoch days: a user's 7-day sum counts only
    days within 6 calendar days, not 6 preceding rows — verified
    against a direct pandas rolling computation."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q120_rolling_features

    got = q120_rolling_features(spark, sf_dir).toPandas()
    one_user = got[got.user_id == got.user_id.iloc[0]].reset_index(drop=True)
    days = pd.to_datetime(one_user.event_date)
    for i in range(len(one_user)):
        lo = days[i] - pd.Timedelta(days=6)
        exp = one_user.day_value[(days >= lo) & (days <= days[i])].sum()
        assert abs(one_user.sum_7d[i] - round(exp, 4)) < 1e-6


def test_q121_zorder_locality_both_dimensions(spark, sf_dir):
    """Z-order's whole point: point queries on EITHER clustered
    dimension touch ~sqrt(F) of F files — a single-key sort serves
    only one dimension. Measured via input_file_name(): which files
    actually contain rows for one user / one day (bucketed Morton
    keys; measured ~5-6 of 16 at these SFs, sqrt(16)=4 + boundary
    effects)."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.sources.derived import zordered_events_path

    ev = spark.read.parquet(zordered_events_path(spark, sf_dir, n_files=16))
    total = ev.select(F.input_file_name()).distinct().count()
    assert total >= 12  # range partitioner may merge a couple of ranges
    uid = ev.select("user_id").limit(1).collect()[0][0]
    day = ev.select(F.to_date("ts").alias("d")).limit(1).collect()[0][0]
    f_user = (
        ev.filter(F.col("user_id") == uid)
        .select(F.input_file_name()).distinct().count()
    )
    f_day = (
        ev.filter(F.to_date("ts") == F.lit(day))
        .select(F.input_file_name()).distinct().count()
    )
    assert f_user <= total // 2, (f_user, total)
    assert f_day <= total // 2, (f_day, total)


def test_q121_zorder_value_preserving(spark, sf_dir):
    """The rewrite must lose/duplicate nothing: full-row content hash
    of the z-ordered copy equals the original's."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.sources.derived import zordered_events_path
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    cols = ["event_id", "user_id", "event_type", "value"]
    def content_hash(df):
        return (
            df.select(F.xxhash64(*cols).alias("h"))
            .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )

    orig = content_hash(load_table(spark, sf_dir, "events"))
    zord = content_hash(spark.read.parquet(zordered_events_path(spark, sf_dir)))
    assert (orig["s"], orig["n"]) == (zord["s"], zord["n"])
