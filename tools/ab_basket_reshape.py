"""Order-swapped A/B: q156/q158's basket pair mining, self-join shape
vs collect_set reshape — at an arbitrary SF (round-12, VERDICT item 7).

Round 11 tried replacing `_basket_pairs`' distinct + orderkey
self-join with a `collect_set` groupBy + JVM nested-`transform` pair
expansion and REJECTED it at sf0.1 (equal within noise: the
self-join's second exchange is a ReusedExchange of the same
checkpointed frame). The VERDICT asked for the same A/B at sf1+,
where the extra exchange carries real bytes and AQE may stop reusing
it. This tool runs both shapes N times in alternating order on one
session, checksums the pair sets (they must match exactly), and
prints per-leg seconds.

Usage:
    python tools/ab_basket_reshape.py <sf_dir> [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def selfjoin_pairs(li: DataFrame, min_support: int = 2) -> DataFrame:
    """The shipped `_basket_pairs` shape (queries.py), minus the
    PinnedCache so every leg pays the full build."""
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    baskets_chk = baskets.localCheckpoint(eager=True)
    a = baskets_chk.alias("a")
    b = baskets_chk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def reshape_pairs(li: DataFrame, min_support: int = 2) -> DataFrame:
    """The rejected r11 reshape: one groupBy collect_set per order,
    pair expansion as a JVM nested transform + explode."""
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda a, i: F.transform(
                        F.slice("parts", i + 2, F.size("parts")),
                        lambda b: F.struct(
                            a.alias("part_a"), b.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def main() -> int:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from ssb_coefficient_maker_spark.session import get_spark
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    spark = get_spark(app_name="ab_basket_reshape")
    li = load_table(spark, sf_dir, "lineitem")

    def sink(df: DataFrame) -> None:
        df.write.mode("overwrite").format("noop").save()

    def checksum(df: DataFrame):
        return df.agg(
            F.count(F.lit(1)),
            F.sum(F.col("part_a") * 31 + F.col("part_b")),
            F.sum("support"),
        ).head()

    ca, cb = checksum(selfjoin_pairs(li)), checksum(reshape_pairs(li))
    print(f"checksum selfjoin={tuple(ca)} reshape={tuple(cb)} "
          f"match={tuple(ca) == tuple(cb)}")

    # warmup both shapes once, then alternate order per rep
    sink(selfjoin_pairs(li))
    sink(reshape_pairs(li))
    results: dict[str, list[float]] = {"selfjoin": [], "reshape": []}
    legs = [("selfjoin", selfjoin_pairs), ("reshape", reshape_pairs)]
    for r in range(reps):
        order = legs if r % 2 == 0 else legs[::-1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"ab_basket {name} rep{r}")
            t0 = time.time()
            sink(fn(li))
            results[name].append(round(time.time() - t0, 3))
    print(f"sf_dir={sf_dir} reps={reps}")
    for name, ts in results.items():
        print(f"  {name}: {ts} mean={sum(ts)/len(ts):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
