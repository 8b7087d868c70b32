"""As-of join — Spark lacks a native one; this is the scalable
union + window construction (SURVEY.md §2 Part C joins, EXT row).

Semantics: for each left row, attach the latest right row with
``right.ts <= left.ts`` within the same ``by`` key (pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

Why union+window instead of a range join: a range join on (key,
ts-interval) either explodes (nested loop) or needs bucketizing with
an arbitrary bucket width. The union construction is ONE shuffle on
the by-key, then a sort within each partition — wall-clock scales
linearly with rows and is skew-safe under AQE. This is the shape to
keep at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right.on <= left.on per by-key.

    ``left`` keeps all its columns; right value columns arrive as
    ``<col><suffix>`` (null when no right row precedes).
    """
    l_tag = left.withColumn("__is_left__", F.lit(1))
    r_tag = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__is_left__"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    left_cols = [c for c in left.columns]
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts (<= semantics): the
    # last_value(ignore nulls) seen by a left row then includes a right
    # row at the exact same timestamp.
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left__").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        F.col("__is_left__"),
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    return filled.filter(F.col("__is_left__") == 1).drop("__is_left__")
