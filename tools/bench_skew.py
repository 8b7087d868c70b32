"""Demonstrate the salted-join remedy (q131) under ACTUAL skew.

q131's oracle equality proves salted == plain on TPC-H's near-uniform
l_suppkey. This harness plants a hot key — 20% of lineitem rows
remapped to one supplier — and measures the shuffle join three ways:

  plain          — sort-merge join, AQE skew mitigation OFF
  plain+aqe-skew — sort-merge join, AQE skewJoin ON (runtime split)
  salted         — q131's manual (key, salt) remedy, AQE skew OFF

Broadcast is disabled for the measurement: the point is the SHUFFLE
join path a 100 TB dim (too big to broadcast) would take; at local
scale supplier would otherwise broadcast and hide the skew entirely.

Prints wall times plus the max/median shuffle-partition row counts
the join key distribution induces — the quantity that pins one
reducer. Usage: python tools/bench_skew.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ssb_coefficient_maker_spark.session import get_spark  # noqa: E402
from ssb_coefficient_maker_spark.sources.loaders import load_table  # noqa: E402

N_SALT = 8
HOT_SUPP = 1


def skewed_lineitem(spark, sf_dir):
    """lineitem with ~20% of rows remapped to one hot supplier key —
    deterministic (xxhash of the row key), so runs are comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    hot = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(5)) == 0
    return li.withColumn(
        "l_suppkey", F.when(hot, F.lit(HOT_SUPP)).otherwise(F.col("l_suppkey"))
    )


def plain_join(li, sup):
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


def salted_join(li, sup):
    li = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALT))
    )
    sup = sup.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(N_SALT)]))
    )
    return (
        li.join(sup, (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


def partition_profile(df, keys, partitions=32):
    """Rows per shuffle partition if `df` is exchanged on `keys` —
    the distribution the join's Exchange produces; max/median is the
    skew a reducer task sees."""
    counts = [
        r["c"]
        for r in df.repartition(partitions, *keys)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    counts += [0] * (partitions - len(counts))
    counts.sort()
    return counts[-1], counts[len(counts) // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="bench-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = skewed_lineitem(spark, sf_dir).persist()
    n = li.count()
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    hot_n = li.filter(F.col("l_suppkey") == HOT_SUPP).count()
    print(f"rows={n} hot_key_rows={hot_n} ({100 * hot_n / n:.1f}%)")

    li_salt = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALT))
    )
    for parts in (32, 256):
        mx, md = partition_profile(li, ["l_suppkey"], parts)
        mx_s, md_s = partition_profile(li_salt, ["l_suppkey", "salt"], parts)
        print(
            f"exchange @{parts} partitions: plain max {mx} (median {md}) | "
            f"salted max {mx_s} (median {md_s})"
        )
    # the scale argument: raising the partition count can NEVER shrink
    # the plain max below the hot key's row count (one key = one
    # reducer), while the salted max keeps dropping toward hot/N_SALT

    def timed(name, make, skew_flag):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_flag).lower())
        times = []
        for i in range(reps + 1):
            t0 = time.monotonic()
            rows = make(li, sup).collect()
            dt = time.monotonic() - t0
            if i:
                times.append(dt)
        print(
            f"{name}: warm min {min(times):.2f}s avg {sum(times)/len(times):.2f}s "
            f"({len(rows)} rows)"
        )
        return rows

    r1 = timed("plain (aqe-skew off)", plain_join, False)
    r2 = timed("plain (aqe-skew on) ", plain_join, True)
    r3 = timed("salted (aqe-skew off)", salted_join, False)

    def norm(rows):
        # counts compare exactly; the float revenue sum is
        # order-dependent across strategies — compare on a cent grid
        # scaled by magnitude (relative 1e-12 is beyond the drift)
        return sorted(
            (r["s_nationkey"], r["n_li"], round(r["revenue"], 0)) for r in rows
        )

    assert norm(r1) == norm(r2) == norm(r3), "all three joins must agree"
    print("results identical across all three strategies")
    li.unpersist()


if __name__ == "__main__":
    main()
