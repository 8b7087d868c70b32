"""Relational operator surface (SURVEY.md §2 Part C, GEN rows).

Each function is a declarative DataFrame program over the testdata
tables — filters reach the parquet scan (pushdown), small dimensions
are broadcast, aggregations use Catalyst's partial+final hash agg.
Column aliases here MUST match the oracle SQL in
``ssb_coefficient_maker_spark.queries`` (the driver's comparator
sorts columns by name before hashing).

Determinism for oracle comparison: every double aggregate is rounded
to 4 decimals (summation order differs between engines by design —
partial aggregation is the point), timestamps are emitted as strings
(Spark timestamps are session-TZ, DuckDB's are naive), and every
query has a total ORDER BY tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _ts(col: F.Column) -> F.Column:
    return F.date_format(col, TS_FMT)


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, 2 group cols × 8 aggs.

    Whole plan is one scan + partial/final hash agg — no joins, the
    shipdate filter pushes into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown showcase: the scan should read
    only 6 of lineitem's 11 columns and carry all three filters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 30)
            & (F.col("l_discount") > 0.05)
            & (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim filter → fact join → agg → top-k.

    customer scales with SF, so no forced broadcast hint — AQE picks
    broadcast vs shuffle from runtime stats (a hard hint would force
    an OOM at 100×); the orders⋈lineitem join is a shuffle on
    orderkey; top-10 is TakeOrderedAndProject (no global sort
    materialization).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", _ts("o_orderdate").alias("o_orderdate"), "revenue")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join, revenue per nation.

    Fixed-cardinality dimensions (region, nation) broadcast by hint;
    customer/supplier scale with SF so their join strategy is left to
    AQE runtime stats (forced broadcast would OOM at 100×). The
    orders⋈lineitem edge shuffles on orderkey.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q06_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-pass filtered global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: customers having a big-ticket order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join: customers with no order above
    400k, counted per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def q09_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — rank window + filter."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"), "rk")
        .orderBy("o_orderpriority", "rk")
    )


def q10_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: running revenue per user over the event stream.

    Both engines order identically (ts, event_id) so the running double
    sum is bit-reproducible; one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn("running_value", F.round(F.sum("value").over(w), 4))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    )


def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (approx variant:
    q44_approx_distinct, weaker rows-only check)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


def q14_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: high-balance customers who also placed a 400k+ order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 7000).select(F.col("c_custkey").alias("custkey"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


def q15_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: high-balance customers with no 400k+ order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 7000).select(F.col("c_custkey").alias("custkey"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b.distinct()).orderBy("custkey")


def q16_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + distinct count of both set-op inputs, tagged."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = (
        cust.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"), F.lit("high_balance").alias("src"))
    )
    b = (
        orders.filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("big_order").alias("src"))
        .distinct()
    )
    return a.unionByName(b).orderBy("src", "custkey")


def q17_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing: orders per (year, month) with revenue."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy("yr", "mo")
    )


def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.sum(k).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q19_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embedding vectors: size, element access, an
    aggregate lambda (L2 norm) — all JVM-side, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(norm, 4).alias("l2_norm"),
    ).orderBy("vec_id")


def q20_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the
    streaming aggregation in streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(_ts(F.col("w.start")).alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


def q21_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows every 1 hour (each event lands in 2)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(_ts(F.col("w.start")).alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


def q22_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: follow-up events within 24h of each signup, per
    user — equi-join on user_id carries the work, the time range is a
    post-join filter (no nested-loop explosion)."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su_user"), F.col("event_id").alias("signup_id"), F.col("ts").alias("su_ts")
    )
    return (
        ev.join(
            signups,
            (F.col("user_id") == F.col("su_user"))
            & (F.col("ts") > F.col("su_ts"))
            & (F.col("ts") <= F.col("su_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_followups"))
        .orderBy("signup_id")
    )


def q23_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE WHEN pivot-style counters)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 250000, 1).otherwise(0)).alias("n_big"),
            F.sum(F.when(F.col("o_totalprice") <= 250000, 1).otherwise(0)).alias("n_small"),
            F.round(
                F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 4
            ).alias("avg_finished_price"),
        )
        .orderBy("o_orderpriority")
    )


def q44_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct, made exactly oracle-checkable.

    The raw HLL estimate differs by engine, so the output pairs each
    estimate with an exact ``countDistinct`` twin (oracled exactly)
    and asserts the documented error bound in-query: with the default
    rsd=0.05, |approx - exact| / exact <= 0.25 (5 sigma) is emitted as
    an int flag. The HLL sketch still runs in the plan — the flag is
    deterministic because Spark's HLL is deterministic for fixed data
    — and the oracle pins the flag to 1, so a broken estimator or a
    violated bound fails the driver hash instead of hiding behind a
    rows-only check.

    100 TB: each exact distinct runs as a TWO-LEVEL aggregate
    (per-key dedupe with map-side partials, then a 3-group count)
    instead of asking one agg for two countDistincts — the latter
    compiles to an Expand that triples the shuffle volume (measured
    at sf1: 9.0 s Expand vs 1.3 s two-level). The HLL twin runs in
    its own single-pass agg; three 3-row results join at the end.
    At true scale you would drop the exact twins and keep the
    sketch — here the twins ARE the correctness instrument.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    orders = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("_approx_orders"),
    )
    agg = parts.join(orders, "l_returnflag").join(hll, "l_returnflag")
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.25)
    ).cast("int")
    return (
        agg.select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            within("_approx_parts", "exact_parts").alias("parts_within_bound"),
            within("_approx_orders", "exact_orders").alias("orders_within_bound"),
        )
        .orderBy("l_returnflag")
    )


def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — sort-based,
    bit-deterministic across engines unlike sum-based aggs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("p75"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("price_p90"),
        )
        .orderBy("l_returnflag")
    )


def q40_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 4).alias("var_disc"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_price_qty"),
        )
        .orderBy("l_linestatus")
    )


def q41_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube),
    via the SQL surface."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 4) AS total_price,
               count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


def q42_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: case, substring, pad, replace,
    position, LIKE."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("prefix_upper"),
        F.length(F.regexp_replace("text", " ", "_")).cast("long").alias("replaced_len"),
        F.lpad(F.col("lang"), 5, "*").alias("lang_padded"),
        F.instr(F.col("text"), "data").cast("long").alias("data_pos"),
        F.col("text").like("%query%").cast("int").alias("has_query"),
    ).orderBy("doc_id")


def q43_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values become columns."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 4).alias("qty_F"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 4).alias("qty_O"),
    ).orderBy("l_returnflag")


def q45_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the pivoted frame back to long form via stack."""
    piv = q43_pivot(spark, sf_dir)
    return (
        piv.selectExpr(
            "l_returnflag",
            "stack(2, 'F', qty_F, 'O', qty_O) AS (l_linestatus, sum_qty)",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q46_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic (the ADP analog inside Spark's native
    38-digit decimal range): sums are exact, no float rounding games."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(30,10)")
    # the SUM runs in exact decimal (order-insensitive, no float
    # drift); the output is cast to double because DuckDB's pandas
    # bridge degrades DECIMAL to float64 anyway — exactness lives in
    # the aggregation, the comparison stays representation-stable
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(dec).cast("double"), 4).alias("total_price_exact"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q47_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over embedding vectors: per-dimension-bucket stats."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    return (
        ex.groupBy((F.col("pos") % 8).alias("dim_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("val").cast("double")), 4).alias("total"),
        )
        .orderBy("dim_bucket")
    )


def q48_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling and bounded arithmetic: coalesce/nullif/greatest/least."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.greatest(F.col("o_totalprice") - 250000, F.lit(0.0))), 4).alias("sum_overage"),
            F.round(F.sum(F.least(F.col("o_totalprice"), F.lit(250000.0))), 4).alias("sum_capped"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))).alias("n_not_low"),
            F.round(F.coalesce(F.avg(F.when(F.col("o_totalprice") > 1e9, F.col("o_totalprice"))), F.lit(-1.0)), 4).alias("avg_huge_or_default"),
        )
        .orderBy("o_orderstatus")
    )


def q49_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user inter-event deltas and next type."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("value_delta"),
            F.lead("event_type", 1).over(w).alias("next_type"),
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)).alias(
                "micros_since_prev"
            ),
        )
        .orderBy("user_id", "event_id")
    )


def q52_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    nation (fixed 25 rows) broadcasts by hint into customer/supplier;
    the enriched customer/supplier sides scale with SF, so their joins
    into the fact stream are left to AQE. The symmetric pair filter
    keeps both directions.
    """
    n1, n2 = "NATION_1", "NATION_2"
    # Pre-filter the dim to the two nations BEFORE the fact joins: the
    # final OR-of-ANDs spans both join sides, so Catalyst can't derive
    # the per-side IN(n1,n2) constraint itself. With it, the enriched
    # customer/supplier sides shrink 25/2x before touching the fact
    # stream (classic TPC-H Q7 rewrite) — at scale that's the
    # difference between a broadcastable build side and a full shuffle.
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(n1, n2))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .filter(
            ((F.col("cust_nation") == n1) & (F.col("supp_nation") == n2))
            | ((F.col("cust_nation") == n2) & (F.col("supp_nation") == n1))
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("volume"))
        .orderBy("cust_nation", "supp_nation", "yr")
    )


def q53_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier share of regional revenue
    per year — conditional aggregation over a star join."""
    target = "NATION_3"
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target, rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 4).alias("total_rev"),
        )
        .orderBy("yr")
    )


def q54_pipeline_filter_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite LLM-data-pipeline: quality filter → exact dedup
    (keep lowest doc_id per content hash) → token stats per language.
    The canonical pre-training data flow as ONE lazy Spark plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), "\\s+")
    n_words = F.size(words).cast("long")
    quality = docs.filter(n_words >= 20).select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")).alias("h"),
    )
    w = W.partitionBy("h").orderBy("doc_id")
    deduped = quality.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.round(F.avg("n_words"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def q51_below_brand_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: parts priced below 95% of their brand's
    average — a correlated aggregate, decorrelated as agg + join-back
    (what Catalyst does to the subquery form anyway, written
    explicitly so the plan is one broadcast join on the tiny agg)."""
    part = load_table(spark, sf_dir, "part")
    brand_avg = part.groupBy(F.col("p_brand").alias("ba_brand")).agg(
        F.avg("p_retailprice").alias("brand_avg")
    )
    return (
        part.join(F.broadcast(brand_avg), part.p_brand == F.col("ba_brand"))
        .filter(F.col("p_retailprice") < 0.95 * F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 4).alias("price"),
            F.round("brand_avg", 4).alias("brand_avg"),
        )
        .orderBy("p_partkey")
    )


def q55_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, joined back to customers — GROUP BY + HAVING + join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "total_qty",
        )
        .orderBy("o_orderkey")
    )


def binned_interval_join(
    left: DataFrame,
    ts_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: int,
):
    """Keyless interval-containment join (ts in [start, end)) as an
    EQUI-join on time bins — the scale path for range joins with no
    shared key, which Spark would otherwise plan as a
    BroadcastNestedLoopJoin (quadratic work, single-broadcast memory).

    Each interval explodes into the bins it covers (constant factor =
    interval_len / bin_seconds, choose bin_seconds accordingly); each
    left row computes its ONE bin. The shuffle is a plain hash join on
    bin id, then the exact containment predicate refines candidates.
    A (left, right) pair can match in at most one bin — the left row's
    own — so no dedup pass is needed. Bin arithmetic is in integer
    microseconds (exact at boundary instants).
    """
    bin_us = F.lit(int(bin_seconds) * 1_000_000)
    lb = left.withColumn("__bin", F.floor(F.unix_micros(F.col(ts_col)) / bin_us))
    # guard degenerate intervals (end <= start): F.sequence(a, b) with
    # a > b steps DOWNWARD, so one corrupt inverted row would explode
    # into an unbounded descending bin list (filtered later, but the
    # work is real); empty/inverted intervals cost zero bins instead
    bins = F.when(
        F.col(end_col) > F.col(start_col),
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / bin_us),
            F.floor((F.unix_micros(F.col(end_col)) - 1) / bin_us),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    rb = right.withColumn("__bin", F.explode(bins))
    return (
        lb.join(rb, "__bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bin")
    )


def q69_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events landing in daily 06:00-12:00 maintenance windows,
    counted per window — a keyless interval join executed as a binned
    equi-join (``binned_interval_join``; the plan must contain NO
    BroadcastNestedLoopJoin, asserted in tests/test_scale_paths.py)."""
    ev = load_table(spark, sf_dir, "events")
    windows = spark.sql(
        """
        SELECT CAST(w_start AS DATE) AS w_day, w_start,
               w_start + INTERVAL 6 HOURS AS w_end
        FROM (
          SELECT explode(sequence(
            TIMESTAMP '2024-01-01 06:00:00', TIMESTAMP '2024-01-30 06:00:00',
            INTERVAL 1 DAY)) AS w_start
        )
        """
    )
    joined = binned_interval_join(ev, "ts", windows, "w_start", "w_end", bin_seconds=3600)
    return (
        joined.groupBy(F.col("w_day").cast("string").alias("w_day"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("w_day")
    )
