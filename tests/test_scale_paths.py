"""Tests for the scale-path utilities: observe-based single-pass
validation, salted join, native-key alignment."""

from __future__ import annotations

import shutil
import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.api import FormulaEvaluator
from ssb_coefficient_maker_spark.operators.skew import salted_join
from ssb_coefficient_maker_spark.sources.loaders import load_table

TMP = "/root/repo/.tmp_test_scale"


@pytest.fixture(scope="module", autouse=True)
def cleanup():
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_evaluate_to_parquet_single_pass(spark):
    a = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [4.0, 0.0, 6.0]})
    b = pd.DataFrame({"x": [1.0, 1.0, 0.0], "y": [2.0, 2.0, 2.0]})
    fe = FormulaEvaluator({"a": a, "b": b}, fill_invalid=True, spark=spark)
    metrics = fe.evaluate_to_parquet("a / b", f"{TMP}/result")
    assert metrics["rows"] == 3 and metrics["cells"] == 6
    assert metrics["invalid"] == 1  # 3.0 / 0.0 -> inf
    back = spark.read.parquet(f"{TMP}/result").toPandas().sort_values("__row_id__")
    assert np.isfinite(back[["x", "y"]].to_numpy()).all()  # filled
    assert back["x"].tolist() == [1.0, 2.0, 0.0]


def test_evaluate_to_parquet_all_invalid_raises(spark):
    z = pd.DataFrame({"x": [0.0, 0.0]})
    fe = FormulaEvaluator({"z": z}, spark=spark)
    with pytest.raises(ValueError, match="All values"):
        fe.evaluate_to_parquet("z / z", f"{TMP}/bad")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s")
    ).collect()[0]
    salted = salted_join(li, orders, on="l_orderkey", salt=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"]
    assert abs(plain["s"] - salted["s"]) < 1e-6


def test_native_long_keys_no_string_cast(spark):
    # two Spark matrices keyed by long: the alignment join must keep
    # the long key (no unifying string cast)
    a = spark.range(5).select(
        F.col("id").alias("__row_id__"), (F.col("id") * 1.0).alias("v")
    )
    b = spark.range(5).select(
        F.col("id").alias("__row_id__"), (F.col("id") * 2.0).alias("v")
    )
    fe = FormulaEvaluator({"a": a, "b": b}, spark=spark)
    res = fe.evaluate_formula("a + b")
    assert res.schema["__row_id__"].dataType.simpleString() == "bigint"
    got = {r["__row_id__"]: r["v"] for r in res.collect()}
    assert got == {i: 3.0 * i for i in range(5)}


def test_mixed_key_types_unify(spark):
    a = spark.range(3).select(F.col("id").alias("__row_id__"), F.lit(1.0).alias("v"))
    b = pd.DataFrame({"v": [10.0, 20.0, 30.0]}, index=[0, 1, 2])
    fe = FormulaEvaluator({"a": a, "b": b}, spark=spark)
    res = fe.evaluate_formula("a + b")
    assert res.schema["__row_id__"].dataType.simpleString() == "string"
    got = {r["__row_id__"]: r["v"] for r in res.collect()}
    assert got == {"0": 11.0, "1": 21.0, "2": 31.0}


def _broadcast_hint_subtrees(df):
    """Stringified subtrees under every ResolvedHint node in the
    analyzed plan (py4j tree walk)."""
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "ResolvedHint":
            out.append(node.child().toString())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


def test_no_forced_broadcast_of_sf_scaled_tables(spark, sf_dir):
    """customer/supplier grow with scale factor: a hard broadcast hint
    on them forces an OOM at 100x where AQE would pick correctly from
    runtime stats. Only fixed-cardinality dims (nation/region) may
    carry hints."""
    from ssb_coefficient_maker_spark.operators import relational

    for q in (
        relational.q03_top_revenue_orders,
        relational.q05_regional_revenue,
        relational.q52_nation_volume,
        relational.q53_market_share,
        relational.q55_large_volume_orders,
    ):
        for subtree in _broadcast_hint_subtrees(q(spark, sf_dir)):
            assert "customer" not in subtree and "supplier" not in subtree, (
                f"{q.__name__} forces broadcast of an SF-scaled table:\n{subtree[:500]}"
            )


def test_fixed_dims_still_hinted(spark, sf_dir):
    from ssb_coefficient_maker_spark.operators import relational

    hints = _broadcast_hint_subtrees(relational.q05_regional_revenue(spark, sf_dir))
    assert any("nation" in h for h in hints)
    assert any("region" in h for h in hints)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_battery_pushdown_and_pruning(spark, sf_dir):
    """q02's filter must reach the parquet scan (PushedFilters) and
    the scan schema must shrink to the referenced columns."""
    from ssb_coefficient_maker_spark.queries import REGISTRY

    plan = _executed_plan(REGISTRY["q02_filter_project"].fn(spark, sf_dir))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert pushed.strip()  # non-empty: at least one predicate pushed
    schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_comment" not in schema  # untouched wide column pruned


def test_plan_battery_no_nested_loop_interval_join(spark, sf_dir):
    """q69's keyless interval join must run as a binned equi-join,
    never a BroadcastNestedLoopJoin."""
    from ssb_coefficient_maker_spark.queries import REGISTRY

    plan = _executed_plan(REGISTRY["q69_interval_join"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_plan_battery_fusion_scan_count(spark, sf_dir):
    """The fused 3-formula plan must scan lineitem exactly as often as
    the single-formula plan (2 pivots) — that IS the fusion claim."""
    from ssb_coefficient_maker_spark.queries import REGISTRY

    single = _executed_plan(REGISTRY["q24_formula_coeffmap"].fn(spark, sf_dir))
    fused = _executed_plan(REGISTRY["q58_fused_coeffmap"].fn(spark, sf_dir))
    assert single.count("Scan parquet") == fused.count("Scan parquet") == 2


def test_plan_battery_codegen(spark, sf_dir):
    """The hot aggregation path must run inside whole-stage codegen."""
    from ssb_coefficient_maker_spark.queries import REGISTRY

    df = REGISTRY["q01_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # executes THIS QueryExecution: AQE finalizes + codegens
    plan = _executed_plan(df)
    assert "isFinalPlan=true" in plan
    # codegen'd stages print as "*(n) Operator" in the final plan
    import re

    assert re.search(r"\*\(\d+\) HashAggregate", plan)


def test_plan_battery_funnel_slice_scans(spark, sf_dir):
    """q94's chained steps must each scan only their event-type slice:
    every events scan in the plan carries a pushed event_type filter
    or the IsNotNull pre-filter of the first full-step aggregation —
    no unfiltered full scan per step."""
    from ssb_coefficient_maker_spark.queries import REGISTRY

    plan = _executed_plan(REGISTRY["q94_funnel"].fn(spark, sf_dir))
    # the two chained steps push EqualTo(event_type, ...) to the scan
    assert plan.count("EqualTo(event_type,") >= 2, plan[:2000]


def test_q66_tfidf_builds_lazily_no_driver_count(spark, sf_dir):
    """q66's corpus size is a broadcast 1-row aggregate INSIDE the
    plan (round-2 VERDICT item 5), not a separate ``docs.count()``
    driver action: constructing the DataFrame must launch zero jobs."""
    from ssb_coefficient_maker_spark.operators.text import q66_tfidf_top_terms

    sc = spark.sparkContext
    # baseline: jobs a bare documents read costs (parquet schema read)
    sc.setJobGroup("q66_probe_base", "bare load_table")
    try:
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    finally:
        sc.setJobGroup(None, None)
    base = len(sc.statusTracker().getJobIdsForGroup("q66_probe_base"))
    sc.setJobGroup("q66_probe_build", "q66 plan construction")
    try:
        df = q66_tfidf_top_terms(spark, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    built = len(sc.statusTracker().getJobIdsForGroup("q66_probe_build"))
    # pre-fix this was base + 1 (the separate docs.count() action)
    assert built <= base, (built, base)
    # and the fused plan still evaluates (collect is allowed to job)
    assert df.limit(5).count() >= 0
