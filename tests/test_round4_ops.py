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


def test_knuth_hash_overflow_safe_cross_engine(spark):
    """The ADVICE scenario made a test: ids beyond ~3.47e9 overflowed
    the naive id*M in int64 (Spark wrapped, DuckDB raised). The 16/16
    split form must agree bit-for-bit across Spark, DuckDB, and the
    Python reference at ANY int64 id — including the huge ids a
    100 TB corpus reaches."""
    import duckdb

    from ssb_coefficient_maker_spark.queries import (
        KNUTH_MOD,
        KNUTH_MULT,
        knuth_hash,
        knuth_hash_sql,
    )
    from pyspark.sql import functions as F

    ids = [0, 1, 12345, 3_470_000_000, 2**32 - 1, 2**32, 2**40 + 17,
           2**62 + 999_999_937, 2**63 - 1]
    expected = [(i * KNUTH_MULT) % KNUTH_MOD for i in (x % KNUTH_MOD for x in ids)]

    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    got_spark = [
        r["h"] for r in sdf.select(knuth_hash(F.col("id")).alias("h"))
        .collect()
    ]
    assert got_spark == expected

    con = duckdb.connect()
    expr = knuth_hash_sql("id")
    got_duck = [
        con.execute(f"SELECT {expr} AS h FROM (SELECT CAST({i} AS BIGINT) AS id)").fetchone()[0]
        for i in ids
    ]
    assert got_duck == expected


def test_zorder_key_matches_python_morton(spark):
    """zorder_key's shift/mask expression must equal a straight
    Python Morton interleave for every (a, b) in the bucket domain."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.sources.derived import zorder_key

    def morton(a, b, bits):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == morton(a, b, 4), (a, b)
