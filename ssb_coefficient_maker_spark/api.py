"""Public API parity layer: ``FormulaEvaluator`` and
``CoefficientCalculator``.

Signature parity targets (SURVEY.md §2.1; reference
coeff_maker.py:589-597 and :885-896). Differences, by design:

- Results are **lazy Spark DataFrames** (``__row_id__`` + double
  columns), not eager pandas frames. ``evaluate_to_pandas`` collects
  for tests/small results.
- Vector∘vector formulas return a labeled pandas Series instead of
  the reference's accidental raw ndarray (SURVEY.md §1.3 wart).
- ``adp_enabled`` defaults to False in BOTH classes (the reference's
  defaults disagree with each other and with its docs — SURVEY.md
  §2.1); ADP division actually works here (the reference's is broken
  under pandas ≥2.x).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ssb_coefficient_maker_spark import adp as adp_mod
from ssb_coefficient_maker_spark.catalog import (
    Matrix,
    Vector,
    matrix_from_pandas,
    matrix_from_spark,
    matrix_to_pandas,
    vector_from_pandas,
)
from ssb_coefficient_maker_spark.formula.parser import (
    FormulaError,
    FormulaExpr,
    extract_variables,
    parse_formula,
)
from ssb_coefficient_maker_spark.plans.alignment import compile_formula
from ssb_coefficient_maker_spark.session import get_spark
from ssb_coefficient_maker_spark.validation import validate as _validate


class FormulaEvaluator:
    """Evaluate formula strings over named datasets, Spark-side.

    Reference: ``FormulaEvaluator`` (coeff_maker.py:572-840).
    """

    def __init__(
        self,
        data_dict: Mapping[str, Any],
        adp_enabled: bool = False,
        decimal_precision: int = 35,
        fill_invalid: bool = False,
        verbose: bool = False,
        spark: SparkSession | None = None,
        validation: str = "eager",
    ):
        """``validation='eager'`` (default) reproduces the reference's
        behavior: every evaluation immediately audits the result (one
        aggregate job) and warns/raises. ``validation='defer'`` skips
        that action: with ``fill_invalid`` the fill is fused lazily
        into the plan and the result computes exactly once at the
        consumer's action — the scale-friendly mode (pair with
        ``evaluate_to_parquet`` for audited writes)."""
        if decimal_precision <= 0:
            raise ValueError("decimal_precision must be positive")
        if validation not in ("eager", "defer"):
            raise ValueError("validation must be 'eager' or 'defer'")
        self.spark = spark or get_spark()
        self.adp_enabled = adp_enabled
        self.decimal_precision = decimal_precision
        self.fill_invalid = fill_invalid
        self.validation = validation
        self.verbose = verbose
        self.datasets: dict[str, Matrix | Vector | float] = {}
        for name, value in data_dict.items():
            self._register(name, value)
        if self.verbose:
            # reference trace shapes, coeff_maker.py:640-645
            print(
                f"FormulaEvaluator initialized with {len(data_dict)} variables"
            )
            print(
                f"Settings: precision_mode="
                f"{'mpmath' if adp_enabled else 'numpy'}, "
                f"fill_invalid={fill_invalid}"
            )

    def _register(self, name: str, value: Any) -> None:
        if not str(name).isidentifier():
            raise ValueError(f"dataset name {name!r} is not a valid identifier")
        if self.adp_enabled:
            if isinstance(value, pd.DataFrame):
                self.datasets[name] = adp_mod.adp_matrix_from_pandas(
                    self.spark, value, self.decimal_precision
                )
                return
            if isinstance(value, pd.Series):
                self.datasets[name] = adp_mod.adp_vector_from_pandas(
                    value, self.decimal_precision
                )
                return
        from ssb_coefficient_maker_spark.catalog import WIDE_MATRIX_THRESHOLD
        from ssb_coefficient_maker_spark.plans.triplet import (
            COL_ID,
            VALUE,
            TripletMatrix,
            wide_to_triplet,
        )

        if isinstance(value, pd.DataFrame):
            self.datasets[name] = matrix_from_pandas(self.spark, value)
        elif isinstance(value, pd.Series):
            self.datasets[name] = vector_from_pandas(value)
        elif isinstance(value, DataFrame):
            if COL_ID in value.columns and VALUE in value.columns:
                self.datasets[name] = TripletMatrix(value)
            elif len(value.columns) - 1 > WIDE_MATRIX_THRESHOLD:
                # wide matrices switch to the long/triplet form
                # automatically (SURVEY.md §7 risk 3)
                self.datasets[name] = wide_to_triplet(
                    matrix_from_spark(value, on_wide="allow")
                )
            else:
                self.datasets[name] = matrix_from_spark(value)
        elif isinstance(value, (Matrix, Vector, TripletMatrix)):
            self.datasets[name] = value
        elif isinstance(value, (int, float)):
            self.datasets[name] = float(value)
        else:
            raise TypeError(
                f"cannot register {name!r}: unsupported type {type(value)}; "
                f"use pandas DataFrame/Series, Spark DataFrame (with "
                f"__row_id__), or a scalar"
            )

    # -- parity surface (reference coeff_maker.py:673, :700, :800) --------

    def parse_formula(self, formula: str) -> FormulaExpr:
        if self.verbose:
            print(f"Parsing formula: {formula}")
        expr = parse_formula(formula)
        if self.verbose:
            print(f"Parsed expression: {expr}")
        return expr

    def extract_variables(self, expr: FormulaExpr | str) -> list[str]:
        variables = extract_variables(expr)
        if self.verbose:
            print(f"Variables in expression: {variables}")
        return variables

    def evaluate_formula(self, formula: str | FormulaExpr) -> Any:
        """Evaluate a formula; returns a lazy Spark DataFrame for matrix
        results, a pandas Series for vector-only results, a float for
        scalar-only formulas.

        Verbose traces mirror the reference's message shapes
        (coeff_maker.py:812-841): the evaluation banner, the division
        note, and the completion line. One documented deviation: a
        lazy Spark result prints ``lazy (Spark DataFrame)`` where the
        reference prints the pandas shape — forcing a count() to
        report a shape would defeat the lazy contract.
        """
        if self.verbose:
            shown = formula if isinstance(formula, str) else "<parsed>"
            print(f"Evaluating formula: {shown}")
            if "/" in str(shown):
                print(
                    "Note: Formula contains division. Invalid values will "
                    + (
                        "be replaced with zeros."
                        if self.fill_invalid
                        else "trigger warnings or errors."
                    )
                )
        result = self._evaluate_formula(formula)
        if self.verbose:
            if isinstance(result, DataFrame):
                shape: Any = "lazy (Spark DataFrame)"
            elif hasattr(result, "shape"):
                shape = result.shape
            else:
                shape = "scalar"
            print(f"Formula evaluation complete. Result shape: {shape}")
        return result

    def _evaluate_formula(self, formula: str | FormulaExpr) -> Any:
        if isinstance(formula, FormulaExpr):
            expr = formula
            formula_str = "<parsed>"
        else:
            formula_str = formula
            expr = self.parse_formula(formula)
        names = self.extract_variables(expr)
        missing = [n for n in names if n not in self.datasets]
        if missing:
            raise KeyError(
                f"formula '{formula_str}' references unknown dataset(s): {missing}"
            )
        mixed = any(isinstance(self.datasets[n], Vector) for n in names) and any(
            isinstance(self.datasets[n], Matrix) for n in names
        )

        from ssb_coefficient_maker_spark.formula.parser import (
            contains_matmul as _has_mm,
        )
        from ssb_coefficient_maker_spark.formula.parser import (
            contains_transpose as _has_t2,
        )

        # ADP matrix-op guards: .T/@ evaluate on the float64 triplet
        # path only, so they must refuse DRIVER-SIDE whenever a
        # string-carried ADP Matrix operand is present (otherwise the
        # ADP compiler's unknown-node error surfaces only inside the
        # executor UDF). TripletMatrix-only formulas stay allowed —
        # triplet inputs under ADP are the documented float64
        # demotion (test_adp_triplet_operand_routes_to_triplet_path),
        # so no precision is lost that wasn't already.
        _adp_matrix = self.adp_enabled and any(
            isinstance(self.datasets[n], Matrix) for n in names
        )
        if _adp_matrix and _has_mm(expr):
            raise NotImplementedError(
                "matmul ('@') / neumann() / leontief() is not supported in ADP "
                "mode: the "
                "contraction computes in float64, which would silently "
                "demote the arbitrary-precision operands. Evaluate with "
                "adp_enabled=False."
            )
        if _adp_matrix and _has_t2(expr):
            raise NotImplementedError(
                "transpose ('.T') is not supported in ADP mode: it "
                "evaluates on the float64 triplet path, which would "
                "silently demote the arbitrary-precision operands. "
                "Transpose the input pandas frame before registering, "
                "or evaluate with adp_enabled=False."
            )

        if self.adp_enabled and any(
            isinstance(self.datasets[n], Matrix) for n in names
        ):
            df, cols = adp_mod.compile_adp_formula(
                expr, self.datasets, self.decimal_precision
            )
            df, count = adp_mod.validate_adp(
                df,
                cols,
                formula_str,
                fill=self.fill_invalid,
                verbose=self.verbose,
            )
            self._last_value_cols = cols
            self.last_invalid_count = count
            return df

        if self.adp_enabled and all(
            isinstance(self.datasets[n], (int, float)) for n in names
        ):
            # Literal/scalar-only ADP formula (every operand int/float;
            # Matrix handled above). The guard must be "all scalars",
            # not "no Vector": a TripletMatrix operand is neither
            # Matrix nor Vector and must fall through to the triplet
            # path below, not into the scalar resolver (which only
            # holds int/float and would KeyError). The float
            # fallthrough would silently produce inf for
            # '(2 / (2 - 2))' (numpy errstate ignores the divide); the
            # reference's ADP mode raises its zero-division diagnostic
            # for ANY operand shape (coeff_maker.py ADP guard;
            # reference tests/test_FormulaEvaluator_pt2.py:470-488),
            # so route through _mp_eval which carries the guard. The
            # mpf result is coerced to float AFTER the guard ran, to
            # honour this method's "float for scalar-only" contract
            # regardless of adp_enabled.
            return float(
                adp_mod.adp_eval_scalar(
                    expr,
                    {n: float(self.datasets[n]) for n in names},
                    self.decimal_precision,
                )
            )

        if (
            self.adp_enabled
            and any(isinstance(self.datasets[n], Vector) for n in names)
            and all(
                isinstance(self.datasets[n], (Vector, int, float))
                for n in names
            )
        ):
            # Series-only (or Series∘scalar) ADP formula: the operands
            # were registered as string-carried ADP Vectors, so the
            # numeric driver path would operate on strings. Evaluate
            # through _mp_eval at full precision instead.
            vectors = {
                n: self.datasets[n]
                for n in names
                if isinstance(self.datasets[n], Vector)
            }
            scalars = {
                n: float(self.datasets[n])
                for n in names
                if isinstance(self.datasets[n], (int, float))
            }
            return adp_mod.adp_eval_vectors(
                expr, vectors, scalars, self.decimal_precision
            )

        from ssb_coefficient_maker_spark.plans.triplet import (
            VALUE,
            TripletMatrix,
            compile_formula_triplet,
        )

        from ssb_coefficient_maker_spark.formula.parser import (
            contains_transpose as _has_t,
        )

        # transpose and matmul route here even when every operand is
        # wide: in triplet form m.T is a key-swap projection
        # (plans/triplet.transpose_triplet) and a @ b is a contraction
        # join + sum (matmul_triplet); in wide form the former would
        # be an unpivot + re-pivot and the latter a width² expression
        # explosion
        if (_has_t(expr) or _has_mm(expr)) and not any(
            isinstance(self.datasets[n], (Matrix, TripletMatrix)) for n in names
        ):
            raise FormulaError(
                "transpose ('.T'), matmul ('@'), and neumann() are only defined "
                "for matrix operands"
            )
        if _has_t(expr) or _has_mm(expr) or any(
            isinstance(self.datasets[n], TripletMatrix) for n in names
        ):
            if self.adp_enabled and any(
                isinstance(self.datasets[n], Vector) for n in names
            ):
                # The Vector was registered string-carried for ADP;
                # feeding it into the float64 triplet plan would
                # silently yield all-NaN. Same deliberate refusal as
                # the ADP-fusion guard: never demote precision
                # silently.
                raise NotImplementedError(
                    "ADP formulas mixing a TripletMatrix with a Series "
                    "operand are not supported: triplet plans compute "
                    "in float64, which would silently demote the ADP "
                    "Series. Re-register the Series with "
                    "adp_enabled=False or convert the triplet operand "
                    "to a pandas DataFrame."
                )
            tdf = compile_formula_triplet(expr, self.datasets)
            if self.validation == "defer":
                # same contract as the wide path below: no eager audit
                # job; fill (if requested) fuses lazily into the plan
                from ssb_coefficient_maker_spark.validation import (
                    fill_invalid as _fill,
                )

                if self.fill_invalid:
                    tdf = _fill(tdf, [VALUE])
                self._last_value_cols = [VALUE]
                self.last_invalid_count = None  # not audited in defer mode
                self._last_is_triplet = True
                return tdf
            tdf, count = _validate(
                tdf,
                [VALUE],
                formula_str,
                fill=self.fill_invalid,
                mixed_operands=mixed,
                verbose=self.verbose,
            )
            self._last_value_cols = [VALUE]
            self.last_invalid_count = count
            self._last_is_triplet = True
            return tdf
        self._last_is_triplet = False

        compiled = compile_formula(expr, self.datasets)
        if compiled.is_scalar:
            return compiled.scalar
        if compiled.vector is not None:
            return pd.Series(
                compiled.vector.values, index=compiled.vector.labels, dtype=np.float64
            )
        if self.validation == "defer":
            from ssb_coefficient_maker_spark.validation import fill_invalid as _fill

            df = (
                _fill(compiled.df, compiled.value_cols)
                if self.fill_invalid
                else compiled.df
            )
            self._last_value_cols = compiled.value_cols
            self.last_invalid_count = None  # not audited in defer mode
            return df
        df, count = _validate(
            compiled.df,
            compiled.value_cols,
            formula_str,
            fill=self.fill_invalid,
            mixed_operands=mixed,
            verbose=self.verbose,
        )
        self._last_value_cols = compiled.value_cols
        self.last_invalid_count = count
        return df

    def _adp_evaluate_to_parquet(self, expr: Any, formula: str, path: str) -> dict:
        """ADP variant of the single-pass production sink: the
        string-carried mpf result writes while the invalid metrics
        (``'nan'/'±inf'`` strings, adp.py:291) ride the same action
        via ``observe`` — one mapInPandas evaluation, one write, no
        separate audit scan (the reference's ADP fill loops per cell,
        coeff_maker.py:274-279)."""
        import pyspark.sql.functions as F
        from pyspark.sql import Observation

        from ssb_coefficient_maker_spark.adp import adp_fill_select, adp_invalid_cond

        df, cols = adp_mod.compile_adp_formula(
            expr, self.datasets, self.decimal_precision
        )
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(adp_invalid_cond(c).cast("long")).alias(f"inv_{c}") for c in cols
        ]
        out = df.observe(obs, *metrics)
        if self.fill_invalid:
            out = adp_fill_select(out, cols)
        out.write.mode("overwrite").parquet(path)
        got = obs.get
        n_invalid = sum(got[f"inv_{c}"] or 0 for c in cols)
        n_cells = got["rows"] * len(cols)
        if n_cells and n_invalid == n_cells:
            raise ValueError(
                f"All values in the result of formula '{formula}' are invalid "
                f"(written to {path} before post-hoc validation)."
            )
        if n_invalid and not self.fill_invalid:
            import warnings

            warnings.warn(
                f"Result of formula '{formula}' contains {n_invalid} invalid "
                f"value(s) ({100.0 * n_invalid / n_cells:.1f}% of {n_cells} cells).",
                UserWarning,
                stacklevel=3,
            )
        return {"rows": got["rows"], "cells": n_cells, "invalid": n_invalid, "path": path}

    def evaluate_to_parquet(self, formula: str, path: str) -> dict:
        """Production path: evaluate + validate + write in ONE pass.

        The interactive ``evaluate_formula`` runs a separate audit
        aggregate before returning (reference-parity eager warnings).
        Here the invalid-count metrics ride the SAME action that
        writes the result, via ``DataFrame.observe`` — each cell is
        touched exactly once (the reference re-scans results up to 3
        times, reference coeff_maker.py:93,101,106). Fill (when
        enabled) is fused into the write projection. Raises after the
        write if every cell was invalid; returns the metrics dict.
        """
        from pyspark.sql import Observation

        from ssb_coefficient_maker_spark.validation import fill_invalid as _fill
        from ssb_coefficient_maker_spark.validation import invalid_cond

        from ssb_coefficient_maker_spark.formula.parser import (
            contains_matmul as _has_mm,
        )
        from ssb_coefficient_maker_spark.formula.parser import (
            contains_transpose as _has_t,
        )

        expr = self.parse_formula(formula)
        if self.adp_enabled:
            if _has_mm(expr) or _has_t(expr):
                # same driver-side refusal as evaluate_formula — without
                # it the node would only fail inside the executor UDF,
                # an opaque job error after the overwrite-mode write has
                # already clobbered the destination
                op = (
                    "matmul ('@') / neumann() / leontief()"
                    if _has_mm(expr)
                    else "transpose ('.T')"
                )
                raise NotImplementedError(
                    f"{op} is not supported in ADP mode: it evaluates in "
                    "float64, which would silently demote the "
                    "arbitrary-precision operands. Evaluate with "
                    "adp_enabled=False."
                )
            return self._adp_evaluate_to_parquet(expr, formula, path)
        from ssb_coefficient_maker_spark.plans.triplet import (
            VALUE,
            TripletMatrix,
            compile_formula_triplet,
        )

        names = self.extract_variables(expr)
        missing = [n for n in names if n not in self.datasets]
        if missing:
            raise KeyError(
                f"formula '{formula}' references unknown dataset(s): {missing}"
            )
        # same routing as _evaluate_formula: .T / @ / triplet operands
        # compile on the triplet path; the observe/fill/write tail is
        # shared — the production path supports the full grammar
        if (
            _has_t(expr)
            or _has_mm(expr)
            or any(isinstance(self.datasets[n], TripletMatrix) for n in names)
        ):
            result_df = compile_formula_triplet(expr, self.datasets)
            value_cols = [VALUE]
        else:
            compiled = compile_formula(expr, self.datasets)
            if compiled.df is None:
                raise ValueError(
                    "evaluate_to_parquet needs at least one matrix operand"
                )
            result_df, value_cols = compiled.df, compiled.value_cols
        import pyspark.sql.functions as F

        obs = Observation()
        metrics_exprs = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(invalid_cond(F.col(c)).cast("long")).alias(f"inv_{c}")
            for c in value_cols
        ]
        observed = result_df.observe(obs, *metrics_exprs)
        out = _fill(observed, value_cols) if self.fill_invalid else observed
        out.write.mode("overwrite").parquet(path)
        got = obs.get
        n_invalid = sum(got[f"inv_{c}"] or 0 for c in value_cols)
        n_cells = got["rows"] * len(value_cols)
        if n_cells and n_invalid == n_cells:
            raise ValueError(
                f"All values in the result of formula '{formula}' are invalid "
                f"(written to {path} before post-hoc validation)."
            )
        if n_invalid and not self.fill_invalid:
            import warnings

            warnings.warn(
                f"Result of formula '{formula}' contains {n_invalid} invalid "
                f"value(s) ({100.0 * n_invalid / n_cells:.1f}% of {n_cells} cells).",
                UserWarning,
                stacklevel=2,
            )
        return {"rows": got["rows"], "cells": n_cells, "invalid": n_invalid, "path": path}

    def evaluate_to_pandas(self, formula: str | FormulaExpr) -> Any:
        """Evaluate and collect to pandas (tests / small results)."""
        result = self.evaluate_formula(formula)
        if not isinstance(result, DataFrame):
            return result
        if self.adp_enabled:
            return adp_mod.adp_to_pandas(
                result, self._last_value_cols, self.decimal_precision
            )
        if getattr(self, "_last_is_triplet", False):
            from ssb_coefficient_maker_spark.plans.triplet import (
                TripletMatrix,
                triplet_to_wide,
            )
            from ssb_coefficient_maker_spark.session import ROW_ID

            wide = triplet_to_wide(TripletMatrix(result))
            cols = [c for c in wide.columns if c != ROW_ID]
            return matrix_to_pandas(Matrix(df=wide, value_cols=cols))
        return matrix_to_pandas(Matrix(df=result, value_cols=self._last_value_cols))


class FusedGroup:
    """One fused-evaluation plan: ``df`` holds ``__row_id__`` plus
    ``{result}_{col}`` columns for every formula in the group (one scan
    of each shared input); ``result_cols`` maps result name → its
    column list."""

    def __init__(self, df: DataFrame, result_cols: dict[str, list[str]]):
        self.df = df
        self.result_cols = result_cols


class CoefficientCalculator:
    """Batch driver over a coefficient map (reference
    coeff_maker.py:843-1016).

    The map is metadata (a handful of rows) — it stays driver-side;
    every formula becomes an independent lazy Spark plan. Results do
    NOT feed back into the dataset catalog (same no-chaining rule as
    the reference, coeff_maker.py:987-1012).
    """

    def __init__(
        self,
        data_dict: Mapping[str, Any],
        coefficient_map: pd.DataFrame,
        result_name_col: str,
        formula_name_col: str,
        adp_enabled: bool = False,
        decimal_precision: int = 35,
        fill_invalid: bool = False,
        verbose: bool = False,
        spark: SparkSession | None = None,
        validation: str = "eager",
    ):
        if isinstance(coefficient_map, DataFrame):
            coefficient_map = coefficient_map.toPandas()
        self._validate_headers(coefficient_map, [result_name_col, formula_name_col])
        self.coefficient_map = coefficient_map
        self.result_name_col = result_name_col
        self.formula_name_col = formula_name_col
        self.verbose = verbose
        self.evaluator = FormulaEvaluator(
            data_dict,
            adp_enabled=adp_enabled,
            decimal_precision=decimal_precision,
            fill_invalid=fill_invalid,
            verbose=verbose,
            spark=spark,
            validation=validation,
        )

    @staticmethod
    def _validate_headers(cmap: pd.DataFrame, mandatory: list[str]) -> None:
        # reference _validate_coefficient_map_headers (coeff_maker.py:938-954)
        missing = [c for c in mandatory if c not in cmap.columns]
        if missing:
            raise KeyError(
                f"coefficient map is missing mandatory column(s): {missing}; "
                f"has {list(cmap.columns)}"
            )

    def compute_coefficients(self) -> dict[str, Any]:
        """Evaluate every mapped formula; skip empty formulas and
        formulas with unknown variables (reference
        coeff_maker.py:989-1012 fail-soft loop)."""
        results: dict[str, Any] = {}
        for _, row in self.coefficient_map.iterrows():
            name = row[self.result_name_col]
            formula = row[self.formula_name_col]
            if (
                formula is None
                or (isinstance(formula, float) and np.isnan(formula))
                or not str(formula).strip()
            ):
                if self.verbose:
                    # reference shape, coeff_maker.py:994 (the reference
                    # prints unconditionally; gating on verbose is the
                    # documented deviation — batch runs must not spam)
                    print(f"Skipping coefficient {name}: No formula provided")
                continue
            try:
                expr = self.evaluator.parse_formula(str(formula))
            except Exception as exc:
                if self.verbose:
                    print(f"Skipping coefficient {name}: unparseable formula {formula!r}: {exc}")
                continue
            variables = self.evaluator.extract_variables(expr)
            unknown = [v for v in variables if v not in self.evaluator.datasets]
            if unknown:
                if self.verbose:
                    # reference shape, coeff_maker.py:1005
                    print(f"Skipping coefficient {name}: Missing variables {unknown}")
                continue
            results[name] = self.evaluator.evaluate_formula(str(formula))
            if self.verbose:
                # reference shape, coeff_maker.py:1014
                print(f"Successfully computed coefficient: {name}")
        return results

    def compute_coefficients_fused(
        self,
    ) -> tuple[list["FusedGroup"], dict[str, Any]]:
        """Batch evaluation with shared-operand fusion.

        Map rows are grouped by their frame-operand set; each group
        compiles to ONE plan (``plans.alignment.compile_formulas_fused``)
        — one scan of each shared input, all of the group's formulas
        projected from the same aligned join. The reference's loop
        (coeff_maker.py:989-1012) re-evaluates shared operands once per
        formula; at 100 TB fusing N formulas over one operand set
        divides the input-scan volume by N.

        Returns ``(groups, extras)``: each ``FusedGroup`` carries the
        fused DataFrame (``__row_id__`` + ``{result}_{col}`` columns)
        and the result→columns mapping; ``extras`` holds results
        evaluated through the standard single-formula path instead:
        vector/scalar-only formulas (driver-cheap), formulas with
        non-fusable operands (TripletMatrix wide-form), and matrix-op
        (``.T``/``@``) formulas — the latter two are LAZY Spark
        DataFrames, which ``compute_coefficients_fused_to_parquet``
        writes alongside the fused groups. Raises
        NotImplementedError under ADP (fusing would silently demote
        decimal strings to doubles). Skip rules (empty formula,
        unknown variable, unparseable) match ``compute_coefficients``.
        """
        from ssb_coefficient_maker_spark.plans.alignment import (
            compile_formulas_fused,
        )
        from ssb_coefficient_maker_spark.validation import fill_invalid as _fill

        if self.evaluator.adp_enabled:
            # ADP matrices carry decimal STRINGS; the fused compiler
            # emits double arithmetic and would silently destroy the
            # precision the mode exists for
            raise NotImplementedError(
                "compute_coefficients_fused supports standard mode only; "
                "ADP batches go through compute_coefficients"
            )

        extras: dict[str, Any] = {}
        by_frames: dict[frozenset, dict[str, Any]] = {}
        for _, row in self.coefficient_map.iterrows():
            name = row[self.result_name_col]
            formula = row[self.formula_name_col]
            if formula is None or (isinstance(formula, float) and np.isnan(formula)):
                continue
            if not str(formula).strip():
                continue
            try:
                expr = self.evaluator.parse_formula(str(formula))
            except Exception as exc:
                if self.verbose:
                    print(f"Skipping coefficient {name}: unparseable formula {formula!r}: {exc}")
                continue
            variables = self.evaluator.extract_variables(expr)
            unknown = [v for v in variables if v not in self.evaluator.datasets]
            if unknown:
                if self.verbose:
                    print(f"Skipping coefficient {name}: Missing variables {unknown}")
                continue
            from ssb_coefficient_maker_spark.formula.parser import (
                contains_matmul as _has_mm,
            )
            from ssb_coefficient_maker_spark.formula.parser import (
                contains_transpose as _has_t,
            )

            frame_names = frozenset(
                v
                for v in variables
                if isinstance(self.evaluator.datasets[v], Matrix)
            )
            fusable = (
                frame_names
                and all(
                    isinstance(
                        self.evaluator.datasets[v], (Matrix, Vector, int, float)
                    )
                    for v in variables
                )
                # .T/@ compile on the triplet path only — the wide
                # fused compiler would hard-fail the whole batch on
                # the first such node; route them to the standard
                # (auto-routing) path instead, like other non-fusable
                # rows
                and not _has_t(expr)
                and not _has_mm(expr)
            )
            if not fusable:
                # vector/scalar-only formulas (no scan to share),
                # formulas touching non-fusable operands (TripletMatrix
                # wide-form), and matrix-op (.T/@) formulas evaluate
                # through the standard single-formula path and land in
                # extras
                extras[name] = self.evaluator.evaluate_formula(str(formula))
                continue
            by_frames.setdefault(frame_names, {})[name] = expr

        groups: list[FusedGroup] = []
        for _frames, exprs in by_frames.items():
            df, result_cols = compile_formulas_fused(exprs, self.evaluator.datasets)
            if self.evaluator.fill_invalid:
                all_cols = [c for cols in result_cols.values() for c in cols]
                df = _fill(df, all_cols)
            groups.append(FusedGroup(df=df, result_cols=result_cols))
        return groups, extras

    def compute_coefficients_fused_to_parquet(self, base_path: str) -> dict[str, Any]:
        """Batch production path: fused evaluation + parquet sink, ONE
        write action per operand-sharing GROUP (not per formula).

        The reference's batch loop writes/collects each formula's
        result separately, re-evaluating shared operands every time
        (coeff_maker.py:989-1016); here a group of N formulas over the
        same operands costs one scan of each input and one write.
        Returns a manifest: result name → {"path", "columns"} (plus
        driver-cheap vector/scalar results under "extras").
        Invalid-count metrics ride each write via ``observe`` — no
        post-hoc audit scan. Extras that are themselves Spark
        DataFrames (matrix-op ``.T``/``@`` formulas and TripletMatrix
        operands route through the standard path, not the wide fused
        compiler) are WRITTEN too — one parquet sink per such result
        at ``{base_path}/extra={name}`` with the same observed
        metrics — so no coefficient in the map is silently dropped
        from the batch sink.
        """
        import pyspark.sql.functions as F
        from pyspark.sql import Observation

        from ssb_coefficient_maker_spark.validation import invalid_cond as _invalid_cond

        groups, extras = self.compute_coefficients_fused()
        manifest: dict[str, Any] = {"extras": {}}
        for name, value in extras.items():
            if not isinstance(value, DataFrame):
                manifest["extras"][name] = value  # driver-cheap Series/scalar
                continue
            path = f"{base_path}/extra={name}"
            vcols = [c for c in value.columns if c not in ("__row_id__", "__col_id__")]
            obs = Observation()
            metrics = [F.count(F.lit(1)).alias("rows")] + [
                F.sum(_invalid_cond(F.col(c)).cast("long")).alias(f"inv_{c}")
                for c in vcols
            ]
            value.observe(obs, *metrics).write.mode("overwrite").parquet(path)
            got = obs.get
            manifest[name] = {
                "path": path,
                "columns": vcols,
                "rows": got["rows"],
                "invalid": sum(got[f"inv_{c}"] or 0 for c in vcols),
            }
        for gi, g in enumerate(groups):
            path = f"{base_path}/group={gi}"
            obs = Observation()
            all_cols = [c for cols in g.result_cols.values() for c in cols]
            metrics = [F.count(F.lit(1)).alias("rows")] + [
                F.sum(_invalid_cond(F.col(c)).cast("long")).alias(f"inv_{c}")
                for c in all_cols
            ]
            g.df.observe(obs, *metrics).write.mode("overwrite").parquet(path)
            got = obs.get
            for rname, cols in g.result_cols.items():
                manifest[rname] = {
                    "path": path,
                    "columns": cols,
                    "rows": got["rows"],
                    "invalid": sum(got[f"inv_{c}"] or 0 for c in cols),
                }
        return manifest

    def compute_coefficients_to_pandas(self) -> dict[str, Any]:
        out = {}
        for name, value in self.compute_coefficients().items():
            if isinstance(value, DataFrame):
                cols = [c for c in value.columns if c != "__row_id__"]
                out[name] = matrix_to_pandas(Matrix(df=value, value_cols=cols))
            else:
                out[name] = value
        return out
