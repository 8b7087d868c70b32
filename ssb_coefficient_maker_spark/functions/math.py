"""Scalar math functions with numpy/pandas semantics.

Spark's arithmetic differs from numpy exactly where the reference's
formulas rely on IEEE behavior (SURVEY.md §7 risk 1): division by
zero is NULL in Spark but ±Inf/NaN in numpy; ``%`` follows the
dividend's sign in Spark but the divisor's in numpy. These shims are
plain ``when()`` expression trees — they stay inside whole-stage
codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INF = float("inf")


def _nan() -> Column:
    return F.lit(float("nan"))


def safe_div(n: Column, d: Column) -> Column:
    """Division with numpy semantics: x/0 → ±Inf, 0/0 → NaN.

    (Verified against the reference's all-zero-denominator fixture,
    reference tests/test_FormulaEvaluator_pt1.py:140-156.)
    """
    return (
        F.when(F.isnan(n) | F.isnan(d), _nan())
        .when(d != 0, n / d)
        .when(n > 0, F.lit(INF))
        .when(n < 0, F.lit(-INF))
        .otherwise(_nan())
    )


def safe_mod(n: Column, d: Column) -> Column:
    """numpy mod: result takes the divisor's sign; x % 0 → NaN."""
    raw = ((n % d) + d) % d
    return F.when(F.isnan(n) | F.isnan(d) | (d == 0), _nan()).otherwise(raw)


def safe_floordiv(n: Column, d: Column) -> Column:
    """numpy floor_divide: floor(n/d); n/0 → ±Inf survives the floor."""
    return F.floor(safe_div(n, d))
