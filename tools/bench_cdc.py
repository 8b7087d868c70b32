"""Measure the CDC boundary-finding seam: per-position md5 window
(JVM expression, cdc_bounds_expr) vs Arrow-vectorized gear rolling
hash (pandas_udf, cdc_bounds_gear_udf). Runs the full q185-shaped job
(bounds -> chunk digests -> source rollup) with each boundary rule on
SPARK_GRAFT_SF_DIR and prints warm timings.

Usage: python tools/bench_cdc.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ssb_coefficient_maker_spark.operators.dedup import (  # noqa: E402
    cdc_bounds_expr,
    cdc_bounds_gear_udf,
)
from ssb_coefficient_maker_spark.session import get_spark  # noqa: E402
from ssb_coefficient_maker_spark.sources.loaders import load_table  # noqa: E402


def rollup(docs, bounds_col):
    chunks = (
        docs.select("source", "text", bounds_col.alias("b"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "zip_with(slice(b, 1, size(b) - 1),"
                    "         slice(b, 2, size(b) - 1),"
                    "  (a, c) -> named_struct("
                    "    'd', md5(substring(text, a + 1, c - a)),"
                    "    'clen', c - a))"
                )
            ).alias("ch"),
        )
        .select("source", F.col("ch.d").alias("d"), F.col("ch.clen").alias("clen"))
    )
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("d").alias("n_distinct"),
        F.round(F.avg("clen"), 4).alias("avg_chunk_len"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="bench-cdc")
    docs = load_table(spark, sf_dir, "documents")
    variants = {
        "md5_expr": lambda: rollup(docs, cdc_bounds_expr("text")),
        "gear_arrow": lambda: rollup(docs, cdc_bounds_gear_udf()(F.col("text"))),
    }
    for name, make in variants.items():
        times = []
        for i in range(reps + 1):
            t0 = time.monotonic()
            make().collect()
            dt = time.monotonic() - t0
            if i:  # first rep is the cold run
                times.append(dt)
        print(
            f"{name}: warm min {min(times):.2f}s "
            f"avg {sum(times)/len(times):.2f}s (cold {dt:.2f}s last) sf={sf_dir}"
        )


if __name__ == "__main__":
    main()
