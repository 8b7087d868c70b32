"""Vector functions over array<float|double> columns — JVM lambda
expressions (zip_with/aggregate), no Python in the loop."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_const(a: Column, q: Column, q_norm: float) -> Column:
    """Cosine against a CONSTANT query vector whose norm was computed
    once driver-side: higher-order functions are not constant-folded,
    so ``cosine(a, lit_q)`` re-aggregates the literal's norm on every
    row. The driver-side norm must be accumulated strictly
    sequentially (see ``seq_l2_norm``) to stay bit-identical to the
    engines' ordered list reductions."""
    return dot(a, q) / (l2_norm(a) * F.lit(q_norm))


def seq_l2_norm(vals) -> float:
    """L2 norm with strictly sequential left-to-right accumulation —
    bit-identical to Spark's ``F.aggregate`` and DuckDB's
    ``list_sum`` evaluation order (numpy's pairwise summation is
    NOT)."""
    import math

    acc = 0.0
    for x in vals:
        fx = float(x)
        acc += fx * fx
    return math.sqrt(acc)
