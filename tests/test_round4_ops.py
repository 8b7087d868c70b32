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
