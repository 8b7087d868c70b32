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


def matmul_triplet(a: TripletMatrix, b: TripletMatrix) -> TripletMatrix:
    """``a @ b`` in long form: contract a's column labels against b's
    row labels — an equi-join on the contraction key followed by a
    sum aggregate on the output key. ONE shuffle for the join (keyed
    on the contraction label; b's side is broadcast when small) plus
    a partially-aggregated (map-side combine) sum — the same shape at
    any matrix width, which is why ``@`` routes formulas onto the
    triplet path rather than the wide one (a wide matmul would be a
    width² expression explosion Catalyst can't survive).

    Semantics: label-based INNER contraction — an output cell
    (r, c) = Σ_k a[r,k]·b[k,c] over the contraction labels k present
    on BOTH sides; labels on one side only contribute nothing, and an
    (r, c) with no shared k is absent from the result (a deliberate,
    documented deviation from pandas ``DataFrame.dot``, which raises
    unless the label sets match exactly — checking set equality here
    would cost an eager job per evaluation). NaN propagates through
    the sum exactly as in pandas: any NaN term poisons its cell.
    """
    kl = "__mm_k__"
    # a NULL value in a present triplet row is an invalid/NaN cell
    # (the elementwise compiler coalesces identically) — it must
    # poison its sums, not be silently skipped by SUM's null-skipping
    left = a.df.select(
        F.col(ROW_ID),
        F.col(COL_ID).alias(kl),
        F.coalesce(F.col(VALUE), NAN()).alias("__mm_a__"),
    )
    right = b.df.select(
        F.col(ROW_ID).cast("string").alias(kl),
        F.col(COL_ID),
        F.coalesce(F.col(VALUE), NAN()).alias("__mm_b__"),
    )
    prod = left.join(right, kl).select(
        ROW_ID,
        COL_ID,
        (F.col("__mm_a__") * F.col("__mm_b__")).alias("__mm_p__"),
    )
    out = prod.groupBy(ROW_ID, COL_ID).agg(F.sum("__mm_p__").alias(VALUE))
    return TripletMatrix(out)


def identity_triplet(a: TripletMatrix) -> TripletMatrix:
    """The identity matrix over ``a``'s label universe (union of its
    row and column labels), in triplet form — the ``I`` of the
    Leontief construction ``(I - A)^-1``. One map-side-combined
    distinct over two narrow projections; for a coefficient matrix
    the label set is the sector vocabulary, small by construction at
    any data scale. Row ids come back as STRING (the label type) so
    the result unions cleanly with matmul outputs."""
    lbl = "__lbl__"
    labels = (
        a.df.select(F.col(ROW_ID).cast("string").alias(lbl))
        .union(a.df.select(F.col(COL_ID).alias(lbl)))
        .distinct()
    )
    return TripletMatrix(
        labels.select(
            F.col(lbl).alias(ROW_ID),
            F.col(lbl).alias(COL_ID),
            F.lit(1.0).alias(VALUE),
        )
    )


def neumann_series(a: TripletMatrix, terms: int) -> TripletMatrix:
    """Truncated Neumann series ``I + A + A² + ... + A^terms`` on the
    triplet path — the distributed form of the Leontief
    total-requirements construction (the reference's domain is
    input-output coefficient matrices, reference
    ``coeff_maker.py:1-13``; total requirements = ``(I - A)^-1``,
    whose convergent expansion is exactly this series). A dense
    inverse does not distribute; the series is ``terms`` contraction
    joins (matmul_triplet — one shuffle each, map-side-combined sums)
    plus ONE final union + groupBy-sum, the plan a 1000-executor
    cluster actually runs.

    SEMANTICS — sparse linear algebra, not pandas alignment: an
    absent triplet cell is ZERO here (so terms with disjoint support
    add, not poison), unlike the elementwise formula path where
    absence is NaN under pd.eval union alignment. A present-but-NaN
    cell still poisons every sum it touches (matmul_triplet coalesces
    NULL→NaN, and the final F.sum propagates NaN). Row ids are
    returned as STRING labels — the series mixes matmul outputs with
    the identity's label column, so the common label type wins.

    Fixed ``terms`` keeps the whole series ONE lazy plan (no driver
    actions); for the convergence-checked variant see
    ``leontief_total_requirements``.
    """
    if terms < 0:
        raise ValueError(f"neumann_series needs terms >= 0, got {terms}")
    parts = [identity_triplet(a).df]
    term = a
    for _ in range(terms):
        parts.append(
            term.df.select(
                F.col(ROW_ID).cast("string").alias(ROW_ID),
                COL_ID,
                F.coalesce(F.col(VALUE), NAN()).alias(VALUE),
            )
        )
        term = matmul_triplet(term, a)
    total = (
        reduce(lambda x, y: x.unionByName(y), parts)
        .groupBy(ROW_ID, COL_ID)
        .agg(F.sum(VALUE).alias(VALUE))
    )
    return TripletMatrix(total)


def leontief_total_requirements(
    a: TripletMatrix,
    *,
    tol: float = 1e-10,
    max_terms: int = 100,
) -> TripletMatrix:
    """Leontief total-requirements matrix ``(I - A)^-1`` via the
    convergence-checked Neumann iteration: accumulate ``A^k`` terms
    until the largest remaining entry falls under ``tol`` (the
    dropped tail is then bounded by ``tol / (1 - ‖A‖)``). Converges
    iff A's spectral radius < 1 — for a technical-coefficient matrix
    that is the standard productive-economy condition (column sums
    < 1); raises after ``max_terms`` otherwise, naming the last
    term's magnitude.

    Execution contract: each term is materialized once via an eager
    ``localCheckpoint`` — it feeds both the running union and the
    next contraction, and checkpointing CUTS THE LINEAGE, without
    which the k-deep join chain's logical plan grows until the driver
    chokes on it (a tol of 1e-12 on a 0.55-spectral-radius matrix is
    ~46 terms). One scalar ``max(abs(value))`` action runs per
    iteration — the driver sees k scalars, never a matrix. Terms
    shrink geometrically, so the checkpoint footprint is a small
    multiple of nnz(A), reclaimed by the context cleaner when the
    result is dropped. (localCheckpoint blocks are executor-local and
    non-replicated; a long-lived production run on a real cluster
    would checkpoint terms to a reliable store / materialized table
    instead — same plan shape.)
    """
    if max_terms < 1:
        raise ValueError(f"max_terms must be >= 1, got {max_terms}")
    parts = [identity_triplet(a).df]
    term = a
    for _ in range(max_terms):
        term_df = term.df.select(
            F.col(ROW_ID).cast("string").alias(ROW_ID),
            COL_ID,
            F.coalesce(F.col(VALUE), NAN()).alias(VALUE),
        ).localCheckpoint()
        peak = term_df.agg(F.max(F.abs(F.col(VALUE)))).first()[0]
        if peak is None or peak < tol:
            break
        if peak != peak:  # NaN peak: an invalid cell reached this term
            raise ValueError(
                "leontief_total_requirements: NaN entry encountered — "
                "fill or drop invalid cells before inverting"
            )
        parts.append(term_df)
        term = matmul_triplet(TripletMatrix(term_df), a)
    else:
        raise ValueError(
            f"leontief_total_requirements did not converge within "
            f"{max_terms} terms (last term max |value| = {peak:.3g}) — "
            "is the spectral radius < 1 (column sums < 1)?"
        )
    total = (
        reduce(lambda x, y: x.unionByName(y), parts)
        .groupBy(ROW_ID, COL_ID)
        .agg(F.sum(VALUE).alias(VALUE))
    )
    return TripletMatrix(total)


def triplet_to_wide(t: TripletMatrix, columns: list[str] | None = None) -> DataFrame:
    """Pivot back to wide form (requires enumerable columns)."""
    if columns is None:
        columns = sorted(r[0] for r in t.df.select(COL_ID).distinct().collect())
    return (
        t.df.groupBy(ROW_ID)
        .pivot(COL_ID, columns)
        .agg(F.first(VALUE))
    )


def _rewrite_matrix_ops(
    expr: FormulaExpr,
    datasets: dict[str, TripletMatrix | Matrix | Vector | float],
) -> tuple[FormulaExpr, dict[str, TripletMatrix]]:
    """Replace every matrix-shaped subtree — ``Transpose``,
    ``MatMul``, and ``Neumann`` over matrix operands — with a synthetic variable bound
    to its triplet result, after which the elementwise join/project
    machinery needs no matrix-op awareness. Compositions of the
    matrix ops among themselves are supported (``a.T @ b``,
    ``(a @ b).T``, ``a @ b @ c``); transpose/matmul of an ELEMENTWISE
    compound (e.g. ``(a + b).T``) refuses loudly — supporting that
    would mean materializing intermediate results mid-formula."""
    from ssb_coefficient_maker_spark.formula.parser import (
        BinOp,
        Call,
        FormulaError,
        Leontief,
        MatMul,
        Neumann,
        Transpose,
        UnaryOp,
        Var,
    )

    extra: dict[str, TripletMatrix] = {}
    # structural memos: MatMul/Transpose are frozen dataclasses with
    # value equality, so '(a @ b) * 2 - a @ b' binds ONE synthetic
    # operand for both '@' subtrees — one contraction join instead of
    # two, and no extra alignment join between identical results.
    # tmemo dedupes at the TripletMatrix level so NESTED repeats
    # ('(a @ b).T - a @ b') reuse the contraction too; vmemo dedupes
    # the synthetic variable binding at elementwise positions.
    tmemo: dict[FormulaExpr, TripletMatrix] = {}
    vmemo: dict[FormulaExpr, FormulaExpr] = {}

    def as_matrix(node: FormulaExpr, ctx: str) -> TripletMatrix:
        """Resolve a matrix-shaped subtree to a TripletMatrix."""
        if node in tmemo:
            return tmemo[node]
        t = _as_matrix_uncached(node, ctx)
        tmemo[node] = t
        return t

    def _as_matrix_uncached(node: FormulaExpr, ctx: str) -> TripletMatrix:
        if isinstance(node, Var):
            d = datasets[node.name]  # KeyError parity with unknown variables
            if isinstance(d, Matrix):
                return wide_to_triplet(d)
            if isinstance(d, TripletMatrix):
                return d
            hint = (
                " — for a matrix-vector product, register the Series "
                "as a single-COLUMN DataFrame when it is the right "
                "operand (m @ v) or a single-ROW DataFrame when it is "
                "the left (v @ m); the contraction joins the left's "
                "column labels against the right's row labels"
                if isinstance(d, Vector)
                else ""
            )
            raise FormulaError(
                f"{ctx} of non-matrix operand {node.name!r} "
                f"({type(d).__name__}) is not defined{hint}"
            )
        if isinstance(node, Transpose):
            return transpose_triplet(as_matrix(node.operand, "transpose ('.T')"))
        if isinstance(node, MatMul):
            return matmul_triplet(
                as_matrix(node.left, "matmul ('@')"),
                as_matrix(node.right, "matmul ('@')"),
            )
        if isinstance(node, Neumann):
            return neumann_series(
                as_matrix(node.operand, "neumann()"), node.terms
            )
        if isinstance(node, Leontief):
            # NOTE: unlike every other matrix op this runs DRIVER-SIDE
            # actions at compile time (one scalar max per term + a
            # localCheckpoint lineage cut) — the convergence depth is
            # data-dependent by definition; see
            # leontief_total_requirements's execution contract.
            return leontief_total_requirements(
                as_matrix(node.operand, "leontief()"), tol=node.tol
            )
        raise FormulaError(
            f"{ctx} is supported on matrix variables and compositions of "
            ".T/@/neumann()/leontief() over them, not on elementwise "
            "compound expressions — bind the subexpression to a name first"
        )

    def bind(t: TripletMatrix, base: str) -> FormulaExpr:
        tname = base
        while tname in datasets or tname in extra:  # avoid name collisions
            tname += "_"
        extra[tname] = t
        return Var(tname)

    def rw(node: FormulaExpr) -> FormulaExpr:
        if isinstance(node, (Transpose, MatMul, Neumann, Leontief)):
            if node in vmemo:
                return vmemo[node]
            if isinstance(node, Transpose):
                base = (
                    f"{node.operand.name}__T"
                    if isinstance(node.operand, Var)
                    else f"__T{len(extra)}__"
                )
                var = bind(as_matrix(node, "transpose ('.T')"), base)
            elif isinstance(node, Neumann):
                var = bind(as_matrix(node, "neumann()"), f"__neu{len(extra)}__")
            elif isinstance(node, Leontief):
                var = bind(as_matrix(node, "leontief()"), f"__leo{len(extra)}__")
            else:
                var = bind(as_matrix(node, "matmul ('@')"), f"__mm{len(extra)}__")
            vmemo[node] = var
            return var
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

    ``m.T`` and ``a @ b`` are rewritten FIRST: each matrix-op subtree
    becomes a synthetic operand bound to its triplet result
    (transpose_triplet — a projection; matmul_triplet — a
    contraction join + sum), after which the join/project machinery
    below needs no matrix-op awareness. Pandas-parity alignment falls
    out of the full-outer join: ``a + b.T`` aligns a(r,c) with b(c,r)
    on labels, NaN where either side is absent — exactly pd.eval's
    union alignment.
    """
    expr, rewritten = _rewrite_matrix_ops(expr, datasets)
    if rewritten:
        datasets = {**datasets, **rewritten}
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
