"""Long/triplet matrix form: ``(__row_id__, __col_id__, value)``.

The wide form (one Spark column per matrix column) stresses Catalyst
beyond a few thousand columns — every formula projection is O(width)
expressions (SURVEY.md §7 risk 3). The triplet form makes width a
ROW dimension: a matrix of any width is three columns, formulas
become joins on ``(__row_id__, __col_id__)``, and the same numpy
semantics shims apply to the single ``value`` column.

Trade-offs, by design:
- frame∘frame: full-outer join on the composite key — one shuffle per
  operand, identical shape to the wide path's row join.
- vector broadcast is **label-based** here (map-literal lookup on
  ``__col_id__``, zero shuffle) — positional order doesn't exist in
  an unordered long form. The wide path keeps the reference's
  positional semantics; the triplet path documents this deviation.
- results stay in triplet form; ``triplet_to_wide`` pivots back for
  moderate widths (it must enumerate columns).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.catalog import Matrix, Vector
from ssb_coefficient_maker_spark.formula.parser import (
    FormulaExpr,
    extract_variables,
)
from ssb_coefficient_maker_spark.plans.alignment import NAN, _to_column
from ssb_coefficient_maker_spark.session import ROW_ID

COL_ID = "__col_id__"
VALUE = "value"


class TripletMatrix:
    """A matrix in long form: DataFrame (__row_id__, __col_id__, value)."""

    def __init__(self, df: DataFrame):
        missing = {ROW_ID, COL_ID, VALUE} - set(df.columns)
        if missing:
            raise ValueError(f"triplet matrix missing column(s) {missing}")
        self.df = df.select(
            F.col(ROW_ID),
            F.col(COL_ID).cast("string").alias(COL_ID),
            F.col(VALUE).cast("double").alias(VALUE),
        )


def wide_to_triplet(m: Matrix) -> TripletMatrix:
    """Unpivot a wide Matrix via stack() — a narrow, shuffle-free
    transform (each input row yields `width` output rows)."""
    width = len(m.value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in m.value_cols)
    df = m.df.selectExpr(
        ROW_ID, f"stack({width}, {pairs}) AS ({COL_ID}, {VALUE})"
    )
    return TripletMatrix(df)


def transpose_triplet(t: TripletMatrix) -> TripletMatrix:
    """``m.T`` in long form: swap the (row, col) key — one projection,
    no shuffle, any width. (The wide form would need a full unpivot +
    re-pivot; this is why transpose routes formulas onto the triplet
    path.)"""
    return TripletMatrix(
        t.df.select(
            F.col(COL_ID).alias(ROW_ID),
            F.col(ROW_ID).cast("string").alias(COL_ID),
            F.col(VALUE),
        )
    )


def triplet_to_wide(t: TripletMatrix, columns: list[str] | None = None) -> DataFrame:
    """Pivot back to wide form (requires enumerable columns)."""
    if columns is None:
        columns = sorted(r[0] for r in t.df.select(COL_ID).distinct().collect())
    return (
        t.df.groupBy(ROW_ID)
        .pivot(COL_ID, columns)
        .agg(F.first(VALUE))
    )


def _rewrite_transposes(
    expr: FormulaExpr,
    datasets: dict[str, TripletMatrix | Matrix | Vector | float],
) -> tuple[FormulaExpr, dict[str, TripletMatrix]]:
    """Replace every ``Transpose(Var(m))`` with a synthetic variable
    bound to the key-swapped triplet of ``m``. Transpose of anything
    but a matrix variable refuses loudly (the reference's pd.eval
    surface never exercises compound transposes; supporting them
    would mean materializing intermediate results mid-formula)."""
    from ssb_coefficient_maker_spark.formula.parser import (
        BinOp,
        Call,
        FormulaError,
        Transpose,
        UnaryOp,
        Var,
    )

    extra: dict[str, TripletMatrix] = {}

    def rw(node: FormulaExpr) -> FormulaExpr:
        if isinstance(node, Transpose):
            if not isinstance(node.operand, Var):
                raise FormulaError(
                    "transpose ('.T') is supported directly on a matrix "
                    "variable (m.T), not on compound expressions — bind "
                    "the subexpression to a name first"
                )
            name = node.operand.name
            d = datasets[name]  # KeyError parity with unknown variables
            if isinstance(d, Matrix):
                t = wide_to_triplet(d)
            elif isinstance(d, TripletMatrix):
                t = d
            else:
                raise FormulaError(
                    f"transpose of non-matrix operand {name!r} "
                    f"({type(d).__name__}) is not defined"
                )
            tname = f"{name}__T"
            while tname in datasets:  # avoid user-name collisions
                tname += "_"
            extra[tname] = transpose_triplet(t)
            return Var(tname)
        if isinstance(node, BinOp):
            return BinOp(node.op, rw(node.left), rw(node.right))
        if isinstance(node, UnaryOp):
            return UnaryOp(node.op, rw(node.operand))
        if isinstance(node, Call):
            return Call(node.func, tuple(rw(a) for a in node.args))
        return node

    return rw(expr), extra


def compile_formula_triplet(
    expr: FormulaExpr,
    datasets: dict[str, TripletMatrix | Matrix | Vector | float],
) -> DataFrame:
    """Compile a formula over triplet matrices into one lazy plan.

    Same construction as the wide path (plans/alignment.py): all frame
    operands meet in a chained full-outer join — here on the composite
    (row, col) key — and the whole arithmetic lands in one projection
    over the single value column.

    ``m.T`` is rewritten FIRST: each ``Transpose(Var)`` becomes a
    synthetic operand bound to the key-swapped triplet
    (transpose_triplet — a projection), after which the join/project
    machinery below needs no transpose awareness. Pandas-parity
    alignment falls out of the full-outer join: ``a + b.T`` aligns
    a(r,c) with b(c,r) on labels, NaN where either side is absent —
    exactly pd.eval's union alignment.
    """
    expr, transposed = _rewrite_transposes(expr, datasets)
    if transposed:
        datasets = {**datasets, **transposed}
    names = extract_variables(expr)
    frames: dict[str, TripletMatrix] = {}
    vectors: dict[str, Vector] = {}
    scalars: dict[str, float] = {}
    for n in names:
        d = datasets[n]
        if isinstance(d, Matrix):
            frames[n] = wide_to_triplet(d)
        elif isinstance(d, TripletMatrix):
            frames[n] = d
        elif isinstance(d, Vector):
            vectors[n] = d
        elif isinstance(d, (int, float)):
            scalars[n] = float(d)
        else:
            raise TypeError(f"unsupported operand {n!r}: {type(d)}")
    if not frames:
        raise ValueError("triplet compilation needs at least one matrix operand")

    prefixed = []
    for name, t in frames.items():
        prefixed.append(
            t.df.select(
                F.col(ROW_ID).cast("string").alias(ROW_ID),
                COL_ID,
                F.col(VALUE).alias(f"{name}__v"),
            )
        )
    joined = reduce(
        lambda a, b: a.join(b, on=[ROW_ID, COL_ID], how="full_outer"), prefixed
    )

    def resolve(var: str) -> Column:
        if var in frames:
            return F.coalesce(F.col(f"{var}__v"), NAN())
        if var in vectors:
            vec = vectors[var]
            # label-based broadcast: map literal keyed by column label
            kv = []
            for label, value in zip(vec.labels, vec.values):
                kv.append(F.lit(str(label)))
                kv.append(F.lit(float(value)))
            return F.coalesce(F.create_map(*kv)[F.col(COL_ID)], NAN())
        return F.lit(scalars[var])

    out = _to_column(expr, resolve).cast("double").alias(VALUE)
    return joined.select(ROW_ID, COL_ID, out)
