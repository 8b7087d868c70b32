"""Generate an sf1-scale dataset by replicating sf0.1 with shifted keys.

Round-2 VERDICT item 1: the scale arguments are design-level until a
10x run converts them to evidence. The driver only ships
sf{0.001,0.01,0.1}, so this tool manufactures the 10x input from the
largest shipped tier, preserving the properties the queries rely on:

- **Referential integrity**: every foreign key is shifted by the SAME
  per-replica offset as its primary key (customer->orders->lineitem,
  part/supplier->lineitem), so join fan-outs scale linearly instead of
  becoming cross-replica cartesian noise.
- **Fixed dimensions stay fixed**: region/nation are NOT replicated
  (they are genuinely fixed-cardinality dims; the engine broadcast-hints
  them on that basis, operators/relational.py).
- **Horizontal user growth**: events get 10x the users (user_id
  shifted), each with an unchanged per-user event stream — the shape a
  10x production day actually has (more keys, similar per-key density).
  Timestamps are untouched so window/sessionization spans are constant.
- **Documents/embeddings replicate VERBATIM** (ids shifted, content
  identical): sf1 models a heavily duplicated crawl — every source doc
  becomes a 10-clique of exact duplicates. Dedup/similarity outputs
  therefore grow ~45x (pairs within each clique), which is the honest
  stress for the candidate-generation tiers; noted in SCALE_NOTES.md
  when comparing per-query times against 10x-linear.

Usage:  python tools/make_scale_data.py [src_sf_dir] [dest_dir] [factor] [tables_csv]
Default: /root/testdata/sf0.1 -> <repo>/.scale/sf1, factor 10, all tables.
``tables_csv`` (round 10) limits generation to the named tables — the
sf10 heavy-family ladder only needs documents/embeddings/part, and
generating 10x lineitem/orders for queries that never read them would
waste most of the disk and wall-clock budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.session import get_spark
from ssb_coefficient_maker_spark.sources.loaders import TABLES, load_table

# key column -> table owning it (offset = factor-invariant max+1 of the
# OWNING table, applied identically wherever the key appears)
KEY_OWNERS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

FIXED_DIMS = {"region", "nation"}


def replicate(spark: SparkSession, df: DataFrame, factor: int, offsets: dict[str, int]) -> DataFrame:
    """factor copies of df; key columns shifted by replica * (max+1)."""
    rep = df.crossJoin(spark.range(factor).select(F.col("id").alias("__rep")))
    for col in df.columns:
        if col in offsets:
            rep = rep.withColumn(
                col, (F.col(col) + F.col("__rep") * F.lit(offsets[col])).cast("long")
            )
    return rep.drop("__rep")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scale", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    wanted = (
        [t.strip() for t in sys.argv[4].split(",") if t.strip()]
        if len(sys.argv) > 4
        else list(TABLES)
    )
    unknown = set(wanted) - set(TABLES)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")

    spark = get_spark(app_name="make_scale_data")

    # one offset per OWNED key: max over the owning table, +1
    offsets: dict[str, int] = {}
    for col, (owner, owner_col) in KEY_OWNERS.items():
        cache_key = (owner, owner_col)
        if cache_key not in offsets:
            mx = load_table(spark, src, owner).agg(F.max(owner_col)).collect()[0][0]
            offsets[cache_key] = int(mx) + 1
        offsets[col] = offsets[cache_key]

    os.makedirs(dest, exist_ok=True)
    for name in wanted:
        df = load_table(spark, src, name)
        out = df if name in FIXED_DIMS else replicate(spark, df, factor, offsets)
        # enough output files that a map-only scan parallelizes: the
        # round-10 sf10 ladder showed 2-file documents starving
        # local[32] (q90's shuffle-free pass ran 17.5x on 10x rows
        # purely from 2 scan partitions). Scale the file count with
        # the replication factor, capped to keep files non-tiny.
        base_files = 8 if name in ("lineitem", "orders", "events") else 2
        n_files = base_files if name in FIXED_DIMS else min(
            32, base_files * factor
        )
        out.repartition(n_files).write.mode(
            "overwrite"
        ).parquet(os.path.join(dest, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)
    print(f"done -> {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
