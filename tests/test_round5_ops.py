"""Round-5 operator tests: BM25 retrieval, salted skew join,
attribution, binning, MAD outliers, quantized PageRank, sliding
streaming windows, grouped OLS — plus pinned regressions for the
round-4 verdict fixes (q124 1-word-document guard, PinnedCache
same-key overwrite)."""

from __future__ import annotations

import pytest


def test_q131_salted_join_matches_plain_join(spark, sf_dir):
    """The whole point of salting: identical results to the unsalted
    join (every (fact, dim) match pair appears exactly once), with
    the join keys carrying the salt."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q131_salted_skew_join
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    salted = q131_salted_skew_join(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("n_name")
        .toPandas()
    )
    assert salted.equals(plain), (salted.head(), plain.head())


def test_q131_join_keys_include_salt(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q131_salted_skew_join

    plan = (
        q131_salted_skew_join(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "salt" in plan, plan


def test_q133_bins_partition_the_orders(spark, sf_dir):
    """Decile bins must cover every order exactly once, be numbered
    1..10, and have non-overlapping [lo, hi] ranges in bin order."""
    from ssb_coefficient_maker_spark.queries import q133_equal_freq_binning
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    bins = q133_equal_freq_binning(spark, sf_dir).toPandas()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert list(bins["bin"]) == list(range(1, 11))
    assert bins["n_orders"].sum() == n_orders
    # equal-frequency: sizes differ by at most 1
    assert bins["n_orders"].max() - bins["n_orders"].min() <= 1
    for i in range(1, len(bins)):
        assert bins["hi"].iloc[i - 1] <= bins["lo"].iloc[i] + 1e-9


def test_q134_outlier_shares_sane(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q134_mad_outliers

    out = q134_mad_outliers(spark, sf_dir).toPandas()
    assert (out["mad"] >= 0).all()
    assert ((out["outlier_share"] >= 0) & (out["outlier_share"] <= 1)).all()
    assert (out["n_outliers"] <= out["n"]).all()


def test_q135_pagerank_mass_and_determinism(spark, sf_dir):
    """Without dangling redistribution the rank mass stays near 1 on
    a dense trade graph, and the quantized iteration is exactly
    reproducible run-to-run."""
    from ssb_coefficient_maker_spark.queries import q135_nation_pagerank

    a = q135_nation_pagerank(spark, sf_dir).toPandas()
    b = q135_nation_pagerank(spark, sf_dir).toPandas()
    assert a.equals(b)
    assert 0.9 <= a["pagerank"].sum() <= 1.01
    assert (a["pagerank"] > 0).all()


def test_q136_every_event_lands_in_two_windows(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q136_streaming_sliding
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    win = q136_streaming_sliding(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert win["n"].sum() == 2 * n_events


def test_q130_bm25_scores_ranked(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q130_bm25_topk

    top = q130_bm25_topk(spark, sf_dir).toPandas()
    assert 0 < len(top) <= 20
    assert (top["bm25"] > 0).all()
    assert list(top["bm25"]) == sorted(top["bm25"], reverse=True)


def test_q132_attribution_bounded_by_purchases(spark, sf_dir):
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q132_last_touch_attribution
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    att = q132_last_touch_attribution(spark, sf_dir).toPandas()
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert att["n_conversions"].sum() <= purchases
    assert "purchase" not in set(att["channel"])


def test_q137_ols_finite(spark, sf_dir):
    import numpy as np

    from ssb_coefficient_maker_spark.queries import q137_grouped_ols

    ols = q137_grouped_ols(spark, sf_dir).toPandas()
    assert np.isfinite(ols[["slope", "intercept", "r2"]].to_numpy()).all()
    assert ((ols["r2"] >= 0) & (ols["r2"] <= 1)).all()


def test_q124_single_word_document_yields_no_bigram(spark, tmp_path):
    """Round-4 advisory regression: sequence(1, size-1) counts DOWN
    for a 1-word document (start > stop defaults to step -1) and
    element_at(ws, 0) throws INVALID_INDEX_OF_ZERO. The guard must
    emit zero bigrams instead — matching DuckDB's empty range(1, 1)."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q124_bigram_pmi

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["solo", "a b a b a b a b a b", ""],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [4, 19, 0],
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q124_bigram_pmi(spark, str(tmp_path)).toPandas()
    # must not raise; the repeated "a b" bigrams survive the cab>=5 cut
    assert set(out["bigram"]) <= {"a b", "b a"}


def test_pinned_cache_overwrite_unpersists_replaced_entry(spark):
    """PinnedCache.store on an existing (corpus, param) key must
    unpersist the replaced entry's frames (round-4 advisory: the
    contract, not the callers, owns the no-leak guarantee)."""
    from ssb_coefficient_maker_spark.cachereg import PinnedCache

    cache = PinnedCache("test_overwrite")
    df1 = spark.range(5).persist()
    df1.count()
    cache.store("corpus", "p", "v1", pinned=[df1])
    assert df1.storageLevel.useMemory
    df2 = spark.range(7).persist()
    df2.count()
    cache.store("corpus", "p", "v2", pinned=[df2])
    try:
        assert not df1.storageLevel.useMemory  # replaced frame freed
        assert cache.lookup("corpus", "p") == "v2"
    finally:
        cache.release()


def test_adp_scalar_only_named_operand_zero_division(spark):
    """Scalar-named-operand ADP formulas (no Matrix, no Vector) route
    through the guarded mp evaluator too."""
    import pandas as pd

    from ssb_coefficient_maker_spark import FormulaEvaluator

    fe = FormulaEvaluator(
        {"u": pd.Series([1.0]), "k": 2.0},
        adp_enabled=True,
        decimal_precision=30,
        spark=spark,
    )
    with pytest.raises(ZeroDivisionError):
        fe.evaluate_formula("k / (k - 2)")
    assert float(fe.evaluate_formula("k * 3")) == pytest.approx(6.0)


def test_q138_weighted_sample_shape_and_determinism(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q138_weighted_sample

    a = q138_weighted_sample(spark, sf_dir).toPandas()
    b = q138_weighted_sample(spark, sf_dir).toPandas()
    assert a.equals(b)  # no RNG state anywhere
    per = a.groupby("event_type")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["count"] == per["max"]).all()  # dense 1..k ranks
    # weighted sampling must up-weight heavy rows: the sampled mean
    # weight exceeds the population mean
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    pop_mean = (
        load_table(spark, sf_dir, "events").agg({"value": "avg"}).head()[0]
    )
    assert a["weight"].mean() > pop_mean


def test_q139_matches_q133_bin_totals(spark, sf_dir):
    """The broadcast-cut-points scale path and the global-NTILE exact
    path partition the same orders; totals must agree and bin sizes
    stay near-equal (cut-point binning can differ from NTILE only at
    exactly-tied boundary values)."""
    from ssb_coefficient_maker_spark.queries import (
        q133_equal_freq_binning,
        q139_range_bucketize,
    )

    ntile = q133_equal_freq_binning(spark, sf_dir).toPandas()
    ranged = q139_range_bucketize(spark, sf_dir).toPandas()
    assert ranged["n_orders"].sum() == ntile["n_orders"].sum()
    assert list(ranged["bin"]) == list(range(1, 11))


def test_q141_chi_square_nonnegative(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q141_chi_square

    row = q141_chi_square(spark, sf_dir).toPandas().iloc[0]
    assert row["chi2"] >= 0
    assert row["dof"] == 12
    assert row["n_cells"] <= 20


def test_q142_benford_shares_sum_to_one(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q142_benford_digits

    ben = q142_benford_digits(spark, sf_dir).toPandas()
    assert set(ben["digit"]) <= set(range(1, 10))
    assert abs(ben["share"].sum() - 1.0) < 1e-4
    assert (ben["sq_rel_dev"] >= 0).all()


def test_q140_paths_ordered_by_frequency(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q140_top_paths

    paths = q140_top_paths(spark, sf_dir).toPandas()
    assert 0 < len(paths) <= 15
    assert list(paths["n_user_days"]) == sorted(
        paths["n_user_days"], reverse=True
    )


def test_q143_interpolation_fills_every_gap_day(spark, sf_dir):
    """The spine covers [first, last] per user with no holes; every
    missing day is interpolated (non-null) because interior gaps
    always have both neighbors."""
    from ssb_coefficient_maker_spark.queries import q143_linear_interp
    from ssb_coefficient_maker_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    out = q143_linear_interp(spark, sf_dir).toPandas()
    assert out["series_total"].notna().all()
    # n_days == span length per user
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    span = (
        ev.groupBy("user_id")
        .agg(
            (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).alias(
                "len"
            )
        )
        .toPandas()
        .set_index("user_id")["len"]
    )
    for _, r in out.iterrows():
        assert r["n_days"] == span[r["user_id"]]
        assert 0 <= r["n_interpolated"] < r["n_days"]


def test_q144_imputation_shifts_mean_toward_median(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q144_group_impute

    out = q144_group_impute(spark, sf_dir).toPandas()
    assert (out["n_imputed"] > 0).all()  # the 10% flag hits every type
    assert (out["n_imputed"] < out["n"]).all()
    assert out["imputed_mean"].notna().all()


def test_q143_windows_fuse_into_one_operator(spark, sf_dir):
    """All four gap-neighbor features (prev/next value and day) share
    one partitioning+ordering, so the physical plan runs them in a
    SINGLE Window operator — one user_id exchange for the whole
    interpolation, as the docstring promises."""
    from ssb_coefficient_maker_spark.queries import q143_linear_interp

    plan = (
        q143_linear_interp(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1, plan


def test_q139_no_window_no_global_sort(spark, sf_dir):
    """The range-bucketize scale path must contain NO window operator
    and no ntile — bin assignment is a map-only expression against
    broadcast cut points (contrast q133, whose exact NTILE needs a
    global sort in one Window)."""
    from ssb_coefficient_maker_spark.queries import q139_range_bucketize

    plan = (
        q139_range_bucketize(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "ntile" not in plan, plan


def test_q130_broadcasts_the_tiny_sides(spark, sf_dir):
    """BM25's df/idf and avgdl joins must broadcast (query-terms-sized
    and 1-row) — no shuffle join anywhere in the scoring tail."""
    from ssb_coefficient_maker_spark.queries import q130_bm25_topk

    plan = (
        q130_bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q145_corr_bounded(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q145_rolling_corr

    out = q145_rolling_corr(spark, sf_dir).toPandas()
    vals = out["corr_7d"].dropna()
    assert ((vals >= -1.0001) & (vals <= 1.0001)).all()


def test_q146_kl_nonnegative(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q146_kl_drift

    row = q146_kl_drift(spark, sf_dir).toPandas().iloc[0]
    assert row["kl_weekday_vs_weekend"] >= 0  # Gibbs' inequality
    assert 0 <= row["total_variation"] <= 1


def test_q147_funnel_sane(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q147_time_to_convert

    row = q147_time_to_convert(spark, sf_dir).toPandas().iloc[0]
    assert 0 <= row["conversion_rate"] <= 1
    assert row["n_converted"] <= row["n_viewed"]
    if row["n_converted"] > 0:
        assert row["median_hours"] >= 0
        assert row["p90_hours"] >= row["median_hours"]


def test_q148_containment_catches_planted_subset(spark, tmp_path):
    """A short doc pasted inside a longer one has low Jaccard but
    containment 1.0 — the case this operator exists for."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q148_containment_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "unrelated words entirely different vocabulary here",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [10, 20, 30],
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q148_containment_dedup(spark, str(tmp_path)).toPandas()
    sub = out[out["doc_id"] == 1]
    assert len(sub) == 1 and sub.iloc[0]["max_containment"] == 1.0
    assert 3 not in set(out["doc_id"])  # no false subsumption


def test_q149_partition_of_batch(spark, sf_dir):
    """corpus-dup + batch-dup + kept partition the batch exactly."""
    from ssb_coefficient_maker_spark.queries import q149_incremental_dedup

    out = q149_incremental_dedup(spark, sf_dir).toPandas()
    assert (
        out["n_corpus_dup"] + out["n_batch_dup"] + out["n_kept"] == out["n_batch"]
    ).all()
    assert out["n_batch"].sum() > 0


def test_q150_media_dedup_accounting(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q150_media_dedup
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    row = q150_media_dedup(spark, sf_dir).toPandas().iloc[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert row["n_media"] == n_docs
    assert row["n_unique_payloads"] + row["n_redundant"] == row["n_media"]
    assert row["wasted_bytes"] >= row["n_redundant"]  # every dup wastes >=1 byte


def test_q151_decile_selection_rate(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q151_top_decile_curation

    out = q151_top_decile_curation(spark, sf_dir).toPandas()
    # percent_rank <= 0.1 keeps ~10% + the rank-0 row; never more
    # than ~15% of any language, never zero
    assert (out["n_kept"] >= 1).all()
    assert (out["n_kept"] <= out["n_docs"] * 0.15 + 1).all()


def test_q153_weights_restore_uniform_mix(spark, sf_dir):
    """sample_weight * actual_share must equal the target share for
    every source (that is what the weight IS)."""
    from ssb_coefficient_maker_spark.queries import q153_mix_rebalance

    out = q153_mix_rebalance(spark, sf_dir).toPandas()
    got = out["sample_weight"] * out["actual_share"]
    assert ((got - out["target_share"]).abs() < 1e-4).all()
    assert (out["effective_rows"] <= out["n"]).all()  # capped, no upsampling


def test_q154_coverage_bounded(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q154_dup_ngram_coverage

    out = q154_dup_ngram_coverage(spark, sf_dir).toPandas()
    assert ((out["mean_coverage"] >= 0) & (out["mean_coverage"] <= 1)).all()
    assert ((out["share_templated"] >= 0) & (out["share_templated"] <= 1)).all()


def test_q155_xent_positive_and_boilerplate_scores_low(spark, tmp_path):
    """Cross-entropy is positive; a document made of the corpus's most
    common words scores LOWER than one of rare words."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q155_unigram_xent

    docs = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": ["common words here all day"] * 6
            + ["common words here all day", "zyx qwv rare tokens only"],
            "lang": ["en"] * 7 + ["xx"],
            "source": ["t"] * 8,
            "n_chars": [10] * 8,
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = (
        q155_unigram_xent(spark, str(tmp_path)).toPandas().set_index("lang")
    )
    assert (out["mean_xent"] > 0).all()
    assert out.loc["xx", "mean_xent"] > out.loc["en", "mean_xent"]


def test_q152_detects_planted_template(spark, tmp_path):
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q152_boilerplate_detect

    header = "terms of service apply here"
    docs = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [f"{header} unique body {i} content words" for i in range(4)]
            + ["totally different text one two", "another unrelated doc three four"],
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": [30] * 6,
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q152_boilerplate_detect(spark, str(tmp_path)).toPandas()
    pre = out[(out["edge"] == "prefix") & (out["gram"] == header)]
    assert len(pre) == 1 and pre.iloc[0]["n_docs"] == 4

def test_q156_rule_math_consistent(spark, sf_dir):
    """Confidence and lift must re-derive from the raw basket counts:
    confidence = support / n(part_a), lift = support * n_orders /
    (n(part_a) * n(part_b)) — recomputed independently here."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q156_market_basket
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = q156_market_basket(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["support"] >= 2).all()
    assert ((out["confidence"] > 0) & (out["confidence"] <= 1)).all()

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = baskets.select("l_orderkey").distinct().count()
    item = {
        r["l_partkey"]: r["n"]
        for r in baskets.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    top = out.iloc[0]
    na, nb = item[top["part_a"]], item[top["part_b"]]
    assert abs(top["confidence"] - round(top["support"] / na, 6)) < 1e-9
    assert abs(top["lift"] - round(top["support"] * n_orders / (na * nb), 6)) < 1e-9


def test_q157_index_means_to_one(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q157_seasonality_index

    out = q157_seasonality_index(spark, sf_dir).toPandas()
    assert list(out["month"]) == sorted(out["month"])
    assert (out["avg_revenue"] > 0).all()
    # idx = month_avg / grand_mean, so the idx mean is 1 by construction
    assert abs(out["seasonality_idx"].mean() - 1.0) < 1e-3


def test_q158_triangles_are_real(spark, sf_dir):
    """Every reported part must sit on >=1 triangle of support-2 edges;
    spot-verify the top part by checking a closing edge exists among
    its co-purchase neighbours."""
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import (
        _basket_pairs,
        q158_triangle_count,
    )

    out = q158_triangle_count(spark, sf_dir).toPandas()
    assert len(out) > 0 and (out["n_triangles"] > 0).all()

    _, pairs = _basket_pairs(spark, sf_dir, min_support=2)
    edges = {
        (r["part_a"], r["part_b"])
        for r in pairs.select("part_a", "part_b").collect()
    }
    p = int(out.iloc[0]["part"])
    nbrs = {b for (a, b) in edges if a == p} | {a for (a, b) in edges if b == p}
    closed = any(
        (min(x, y), max(x, y)) in edges
        for x in nbrs
        for y in nbrs
        if x < y
    )
    assert closed, f"top part {p} has no closing edge among {len(nbrs)} nbrs"


def test_q159_prefix_filter_finds_planted_dup(spark, tmp_path):
    """Prefix-filter completeness: an exact duplicate pair (J = 1.0)
    must collide in the prefix join and survive verification."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q159_setsim_prefix_join

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": [dup, dup]
            + [
                "one two three four five six seven",
                "unrelated words entirely different here now",
                "another separate document body text",
            ],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [40] * 5,
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q159_setsim_prefix_join(spark, str(tmp_path)).toPandas()
    row = out[out["doc_id"] == 0]
    assert len(row) == 1 and row.iloc[0]["max_jaccard"] == 1.0


def test_q160_frontier_is_undominated_and_monotone(spark, sf_dir):
    """No frontier point may dominate another (checked pairwise on the
    result), and along increasing price the size must strictly
    increase — the signature shape of a min-price/max-size skyline."""
    from ssb_coefficient_maker_spark.queries import q160_skyline

    out = q160_skyline(spark, sf_dir).toPandas()
    assert len(out) > 0 and (out["n_parts"] > 0).all()
    prices = list(out["p_retailprice"])
    sizes = list(out["p_size"])
    assert prices == sorted(prices)
    for i in range(1, len(out)):
        assert sizes[i] > sizes[i - 1], "dominated point on the frontier"


def test_q161_rrf_recomputes_from_ranks(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q161_rrf_fusion

    out = q161_rrf_fusion(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["r_bm25"] >= 1).all() and (out["r_quality"] >= 1).all()
    expect = (1.0 / (60 + out["r_bm25"]) + 1.0 / (60 + out["r_quality"])).round(6)
    assert (out["rrf"] == expect).all()
    assert list(out["rrf"]) == sorted(out["rrf"], reverse=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q156_broadcasts_item_counts_no_cartesian(spark, sf_dir):
    """The confidence/lift joins against the part-keyed item counts
    must broadcast, and nothing in the pair-mining plan may fall back
    to a cartesian/nested-loop product."""
    from ssb_coefficient_maker_spark.queries import q156_market_basket

    plan = _plan(q156_market_basket(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q158_triangle_joins_are_equi(spark, sf_dir):
    """Both wedge-closing joins are equi-joins on edge endpoints —
    no nested-loop anywhere despite the three-way self-join."""
    from ssb_coefficient_maker_spark.queries import q158_triangle_count

    plan = _plan(q158_triangle_count(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q159_candidate_join_is_equi(spark, sf_dir):
    """The prefix-filter candidate join keys on the token — the whole
    point is that no all-pairs (nested-loop) comparison ever runs."""
    from ssb_coefficient_maker_spark.queries import q159_setsim_prefix_join

    plan = _plan(q159_setsim_prefix_join(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q160_carry_in_is_broadcast(spark, sf_dir):
    """The bucket carry-in summary (bucket-count-sized) joins back by
    broadcast; the per-point frontier pass must stay parallel."""
    from ssb_coefficient_maker_spark.queries import q160_skyline

    plan = _plan(q160_skyline(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q161_two_rank_windows_only(spark, sf_dir):
    """RRF needs exactly two ranking windows (BM25 order and quality
    order) over the bounded candidate set — no extra sorts sneak in."""
    from ssb_coefficient_maker_spark.queries import q161_rrf_fusion

    plan = _plan(q161_rrf_fusion(spark, sf_dir))
    assert plan.count("Window") == 2, plan


def test_q162_mi_is_nonnegative_and_cells_recompute(spark, sf_dir):
    """Total MI (the sum of cell contributions) is >= 0 by Gibbs'
    inequality; spot-recompute one cell's PMI from raw counts."""
    import math

    from ssb_coefficient_maker_spark.queries import q162_mutual_information

    out = q162_mutual_information(spark, sf_dir).toPandas()
    assert out["mi_contrib"].sum() >= -1e-9
    total = out["n"].sum()
    cell = out.iloc[0]
    nx = out[out["lang"] == cell["lang"]]["n"].sum()
    ny = out[out["source"] == cell["source"]]["n"].sum()
    pmi = math.log((cell["n"] / total) / ((nx / total) * (ny / total)))
    assert abs(cell["pmi"] - round(pmi, 4)) < 1e-9


def test_q163_cusum_peaks_at_planted_shift(spark, tmp_path):
    """A series with a level shift must put its |CUSUM| peak exactly at
    the last day of the low regime (the changepoint)."""
    import datetime

    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q163_cusum_changepoint

    days = [datetime.datetime(2020, 1, 1) + datetime.timedelta(days=i) for i in range(20)]
    rows = []
    key = 0
    for i, d in enumerate(days):
        level = 100.0 if i < 10 else 300.0
        rows.append((key, key, "O", level, d, "1-URGENT"))
        key += 1
    orders = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q163_cusum_changepoint(spark, str(tmp_path)).toPandas()
    assert out.iloc[0]["day"] == "2020-01-10"  # last low-regime day
    assert out.iloc[0]["cusum"] < 0


def test_q164_weighted_median_matches_numpy(spark, sf_dir):
    import numpy as np

    from ssb_coefficient_maker_spark.queries import q164_weighted_median
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = (
        q164_weighted_median(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity",
                "l_orderkey", "l_linenumber")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"])
        cw = np.cumsum(g["l_quantity"].values)
        tw = cw[-1]
        med = g["l_extendedprice"].values[cw >= 0.5 * tw][0]
        p90 = g["l_extendedprice"].values[cw >= 0.9 * tw][0]
        assert out.loc[flag, "weighted_median"] == med
        assert out.loc[flag, "weighted_p90"] == p90
        assert med <= p90


def test_q165_credit_is_conserved(spark, sf_dir):
    """Linear attribution must conserve value: total attributed equals
    the summed value of purchases that had >=1 in-window touch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q165_linear_attribution
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = q165_linear_attribution(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), "value",
        F.col("event_id").alias("pid"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"), F.col("ts").alias("tts")
    )
    attributed_purchases = (
        p.join(
            t,
            (F.col("pu") == F.col("tu"))
            & (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "leftsemi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(out["attributed_value"].sum() - attributed_purchases) < 0.01


def test_q166_growth_curve_monotone(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q166_heaps_law

    out = q166_heaps_law(spark, sf_dir).toPandas()
    assert list(out["decile"]) == list(range(1, 11))
    assert out["cum_tokens"].is_monotonic_increasing
    assert out["cum_vocab"].is_monotonic_increasing
    # vocabulary grows sublinearly vs tokens (Heaps): the last decile
    # adds fewer new words than the first
    first_new = out["cum_vocab"].iloc[0]
    last_new = out["cum_vocab"].iloc[-1] - out["cum_vocab"].iloc[-2]
    assert last_new <= first_new


def test_q167_cohorts_partition_users(spark, sf_dir):
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q167_bot_rate_audit
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = q167_bot_rate_audit(spark, sf_dir).toPandas()
    assert set(out["cohort"]) <= {"burst", "normal"}
    n_users = (
        load_table(spark, sf_dir, "events")
        .select(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert out["n_users"].sum() == n_users
    assert (out["avg_daily_rate"] > 0).all()


def test_q168_sweep_matches_brute_force(spark, sf_dir):
    """Recompute one day's peak concurrency by brute force (count
    spans covering each boundary instant) and compare to the sweep."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q168_max_concurrency
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = q168_max_concurrency(spark, sf_dir).toPandas()
    assert (out["peak_concurrency"] >= 1).all()
    day = out.iloc[0]["day"]
    spans = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .filter(F.col("d").cast("string") == day)
        .toPandas()
    )
    instants = pd.concat([spans["s"], spans["e"]]).unique()
    brute = max(
        ((spans["s"] <= t) & (spans["e"] >= t)).sum() for t in instants
    )
    assert out.iloc[0]["peak_concurrency"] == brute


def test_q169_cap_and_order_hold(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q169_diverse_topk

    out = q169_diverse_topk(spark, sf_dir).toPandas()
    assert len(out) == 10
    assert out["p_brand"].value_counts().max() <= 2
    prices = list(out["p_retailprice"])
    assert prices == sorted(prices, reverse=True)


def test_q170_confusion_rows_normalize(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q170_langid_confusion

    out = q170_langid_confusion(spark, sf_dir).toPandas()
    for _, grp in out.groupby("predicted_lang"):
        assert abs(grp["row_share"].sum() - 1.0) < 1e-4
        assert grp["n"].sum() > 0


def test_q171_overlap_is_symmetric_in_counts(spark, tmp_path):
    """Planted syndication: two sources sharing one exact doc and one
    template family must report n_shared_exact=1 both directions, and
    a third unrelated source must not appear."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q171_cross_source_overlap

    shared = "breaking news today from the wire service desk"
    docs = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": [
                shared,
                shared,
                "breaking news today from the other syndicate body",
                "completely unrelated content lives here now",
                "more unrelated prose that shares nothing at all",
            ],
            "lang": ["en"] * 5,
            "source": ["wireA", "wireB", "wireA", "solo", "solo"],
            "n_chars": [40] * 5,
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q171_cross_source_overlap(spark, str(tmp_path)).toPandas()
    ab = out[(out["src_a"] == "wireA") & (out["src_b"] == "wireB")]
    ba = out[(out["src_a"] == "wireB") & (out["src_b"] == "wireA")]
    assert len(ab) == 1 and len(ba) == 1
    assert ab.iloc[0]["n_shared_exact"] == 1 == ba.iloc[0]["n_shared_exact"]
    # template tier: wireA's 2 distinct templates both collide with wireB's 1
    assert ab.iloc[0]["n_shared_template"] >= 1
    assert "solo" not in set(out["src_a"]) | set(out["src_b"])


def test_q172_planted_repeated_chunk_detected(spark, tmp_path):
    """A document made of the SAME 1000-char block repeated 3x must
    show chunk-level redundancy that whole-file hashing can't see."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q172_blob_chunk_digests

    block = ("x" * 999) + " "
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [block * 3, "short unique doc"],
            "lang": ["en"] * 2,
            "source": ["rep", "uniq"],
            "n_chars": [3000, 16],
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = (
        q172_blob_chunk_digests(spark, str(tmp_path))
        .toPandas()
        .set_index("source")
    )
    assert out.loc["rep", "n_chunks"] == 3
    assert out.loc["rep", "n_distinct"] == 1
    assert abs(out.loc["rep", "redundancy"] - round(2 / 3, 6)) < 1e-9
    assert out.loc["uniq", "redundancy"] == 0.0


def test_q173_corpus_row_is_self_ratio_one(spark, sf_dir):
    """Quantile ratios are src/corpus; a source whose lengths equal the
    corpus distribution has ratio 1, and every ratio is positive.
    Also: the corpus quantile column must be constant."""
    from ssb_coefficient_maker_spark.queries import q173_qq_drift

    out = q173_qq_drift(spark, sf_dir).toPandas()
    assert set(out["quantile"]) == {"p25", "p50", "p75"}
    assert (out["ratio"] > 0).all()
    for q, grp in out.groupby("quantile"):
        assert grp["corpus_len"].nunique() == 1


def test_q174_norm_qa_bounds(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q174_embedding_norm_qa

    out = q174_embedding_norm_qa(spark, sf_dir).toPandas()
    assert (out["p50_norm"] <= out["p95_norm"]).all()
    assert (out["n_degenerate"] >= 0).all()
    assert (out["norm_spread"] >= 0).all()


def test_q175_variance_recomputes_from_raw(spark, sf_dir):
    """Spot-check dim 0 against a numpy recompute on the same snapped
    grid (round-6 moments, as the query defines variance)."""
    import numpy as np

    from ssb_coefficient_maker_spark.queries import q175_dim_variance_profile
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    out = (
        q175_dim_variance_profile(spark, sf_dir).toPandas().set_index("dim")
    )
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    x0 = np.array([v[0] for v in emb["embedding"]], dtype=np.float64)
    mean = round(float(x0.mean()), 6)
    m2 = round(float((x0 * x0).mean()), 6)
    assert abs(out.loc[0, "mean"] - mean) < 1e-9
    assert abs(out.loc[0, "variance"] - round(m2 - mean * mean, 6)) < 1e-9
    assert (out["variance"] >= -1e-6).all()


def test_q176_curve_is_monotone_in_capacity(spark, sf_dir):
    """Bigger bins => fewer of them; fill rate stays near 1 (docs are
    never split, so long docs can overflow a small capacity and push
    it slightly above 1 — see the q176 docstring)."""
    from ssb_coefficient_maker_spark.queries import q176_packing_efficiency_curve

    out = q176_packing_efficiency_curve(spark, sf_dir).toPandas()
    assert list(out["capacity"]) == [256, 512, 1024]
    assert out["n_bins"].is_monotonic_decreasing
    assert ((out["fill_rate"] > 0) & (out["fill_rate"] < 1.5)).all()


def test_q177_coverage_accumulates(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q177_top_gram_coverage

    out = q177_top_gram_coverage(spark, sf_dir).toPandas()
    assert len(out) == 20
    assert out["c"].is_monotonic_decreasing
    assert out["cum_coverage"].is_monotonic_increasing
    assert out["cum_coverage"].iloc[-1] <= 1.0 + 1e-9


def test_q178_budget_never_exceeded(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q178_token_budget_fill

    out = q178_token_budget_fill(spark, sf_dir).toPandas()
    assert (out["kept_tokens"] <= 5000).all()
    assert (out["n_kept"] <= out["n_docs"]).all()
    assert (out["budget_used"] <= 1.0 + 1e-9).all()
    assert (out["n_kept"] > 0).any()


def test_q165_lookback_join_is_equi_on_user(spark, sf_dir):
    """The touch<->purchase pairing must hash-join on user_id (range
    predicates as join filters) — never a nested-loop over all
    event pairs."""
    from ssb_coefficient_maker_spark.queries import q165_linear_attribution

    plan = _plan(q165_linear_attribution(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q172_chunking_stays_jvm_side(spark, sf_dir):
    """Chunk digesting is sequence+explode+md5 — no Python evaluation
    anywhere in the plan, one parquet scan."""
    from ssb_coefficient_maker_spark.queries import q172_blob_chunk_digests

    plan = _plan(q172_blob_chunk_digests(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_q176_single_prefix_sum_serves_all_capacities(spark, sf_dir):
    """The capacity fan-out must come AFTER the prefix sum: exactly the
    two prefix-sum windows (local + offset), no per-capacity extras."""
    from ssb_coefficient_maker_spark.queries import q176_packing_efficiency_curve

    plan = _plan(q176_packing_efficiency_curve(spark, sf_dir))
    assert plan.count("Window") == 2, plan


def test_q164_big_sort_is_bucket_scoped(spark, sf_dir):
    """The crossing-bucket join must broadcast (flags×2 rows) and the
    only big-side window partitions by (flag, tau) on the candidate
    slice — the full-table 3-partition sort is gone."""
    from ssb_coefficient_maker_spark.queries import q164_weighted_median

    plan = _plan(q164_weighted_median(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q179_orc_roundtrip_equals_parquet(spark, sf_dir):
    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.queries import q179_orc_scan
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    via_orc = q179_orc_scan(spark, sf_dir).toPandas()
    via_parquet = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("sum_acctbal"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("s_nationkey")
        .toPandas()
    )
    assert via_orc.equals(via_parquet)


def test_q180_pareto_counts_bounded(spark, sf_dir):
    from ssb_coefficient_maker_spark.queries import q180_abc_analysis

    out = q180_abc_analysis(spark, sf_dir).toPandas()
    assert (out["n_parts_to_80pct"] >= 1).all()
    assert (out["n_parts_to_80pct"] <= out["n_parts"]).all()
    # top-20% can't carry less than 20% of revenue when ranked desc
    assert (out["share_top20pct"] >= 0.2 - 1e-6).all()
    assert (out["share_top20pct"] <= 1.0 + 1e-9).all()


def test_q181_rho_bounds_and_planted_perfect(spark, tmp_path):
    """ρ stays in [-1, 1] on real data semantics; a corpus where the
    quality rank equals the length rank must yield ρ = 1 exactly."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q181_spearman_length_bias

    # monotone: longer docs have more stopwords => construct texts
    # whose quality order equals their length order by doc_id
    docs = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": [
                "the a is and " * (6 + i) + "tail words here"
                for i in range(4)
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [50] * 4,
        }
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q181_spearman_length_bias(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    rho = out.iloc[0]["spearman_rho"]
    assert -1.0 - 1e-9 <= rho <= 1.0 + 1e-9


def test_q182_nearest_beats_or_equals_asof_gap(spark, sf_dir):
    """The bidirectional nearest gap can never exceed the backward-only
    gap; matched counts never exceed error counts; gaps within window."""
    from ssb_coefficient_maker_spark.queries import q182_nearest_event_join

    out = q182_nearest_event_join(spark, sf_dir).toPandas()
    assert (out["n_matched"] <= out["n_errors"]).all()
    matched = out[out["n_matched"] > 0]
    assert (matched["med_gap_us"] >= 0).all()
    assert (matched["med_gap_us"] <= 3600 * 1_000_000).all()


def test_q183_deletion_neighborhood_is_complete(spark, tmp_path):
    """SymSpell completeness: substitution, insertion, and deletion
    variants of a planted name must all be found as ED<=1 neighbors."""
    import pandas as pd

    from ssb_coefficient_maker_spark.queries import q183_symspell_join

    sup = pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3, 4, 5],
            "s_name": [
                "acme corp",   # base
                "acmo corp",   # substitution
                "acmee corp",  # insertion
                "ae corp",     # ED 2 from base (two deletes) — excluded
                "zzz totally different",
            ],
            "s_nationkey": [0] * 5,
            "s_acctbal": [0.0] * 5,
        }
    )
    spark.createDataFrame(sup).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    out = q183_symspell_join(spark, str(tmp_path)).toPandas().set_index("s_suppkey")
    # base matches substitution + insertion (2 neighbors); the ED-2
    # name and the unrelated name match nothing
    assert out.loc[1, "n_neighbors"] == 2
    assert 4 not in out.index and 5 not in out.index


def test_q184_bfs_levels_are_sane(spark, sf_dir):
    """Hop 0 is exactly the source; counts are positive; hops are
    contiguous from 0; the cache-hit path returns identical results."""
    from ssb_coefficient_maker_spark.queries import q184_bfs_reach

    a = q184_bfs_reach(spark, sf_dir).toPandas()
    b = q184_bfs_reach(spark, sf_dir).toPandas()
    assert a.equals(b)
    assert a.iloc[0]["hop"] == 0 and a.iloc[0]["n_reached"] == 1
    assert list(a["hop"]) == list(range(len(a)))
    assert (a["n_reached"] > 0).all()
