"""Differential parity: run the ACTUAL reference package side by side
with this engine on identical inputs and compare numbers cell-for-cell.

The property suite already pins our semantics to pandas `eval` (the
reference's execution engine), but this is the direct evidence: same
`data_dict`, same formula string, same `fill_invalid` flag, reference
`FormulaEvaluator` vs ours. Skipped cleanly if the read-only reference
checkout is absent (e.g. running this repo standalone).

Deliberately NOT covered here (documented divergences, SURVEY.md §1.3):
Series∘Series (reference leaks a raw ndarray and skips validation; we
return a labeled Series), and ADP division (broken upstream under
pandas ≥2 — ours works, asserted in test_adp.py).
"""

from __future__ import annotations

import os
import sys
import warnings

import numpy as np
import pandas as pd
import pytest

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def reference_evaluator_cls():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF_SRC)
    try:
        from ssb_coefficient_maker import FormulaEvaluator as RefFE
    except Exception as exc:  # missing upstream deps — environment, not us
        pytest.skip(f"reference not importable: {exc}")
    finally:
        sys.path.remove(REF_SRC)
    return RefFE


FRAME_FORMULAS = [
    "a + b",
    "(a - b) / b",
    "a * b - a",
    "a / (a + b)",
    "a ** 2 + b",
    # caret → power: the reference converts '^' only in parse_formula
    # (sympy convert_xor); a raw caret STRING crashes its pd.eval
    # (no visit_BitXor), so the reference path is parse-then-evaluate
    ("2 * a ^ 2", "parse_first"),
    "-a + abs(b)",
    "a > b",
    "a % b",
    "a // b",
]


def _data():
    rng = np.random.default_rng(11)
    a = pd.DataFrame(rng.uniform(1, 9, (4, 3)), columns=list("xyz"))
    b = pd.DataFrame(rng.uniform(1, 9, (4, 3)), columns=list("xyz"))
    return {"a": a, "b": b}


@pytest.mark.parametrize("formula", FRAME_FORMULAS)
def test_frame_formula_matches_reference(spark, reference_evaluator_cls, formula):
    from ssb_coefficient_maker_spark.api import FormulaEvaluator

    data = _data()
    parse_first = isinstance(formula, tuple)
    if parse_first:
        formula = formula[0]
    ref = reference_evaluator_cls(data_dict={k: v.copy() for k, v in data.items()})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_input = ref.parse_formula(formula) if parse_first else formula
        expected = ref.evaluate_formula(ref_input)
    ours = FormulaEvaluator(data_dict=data, spark=spark)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = ours.evaluate_to_pandas(formula)
    exp = expected.astype(float) if expected.dtypes.iloc[0] == bool else expected
    g = got.astype(float) if got.dtypes.iloc[0] == bool else got
    pd.testing.assert_frame_equal(
        g.sort_index(), exp.sort_index(), check_dtype=False, rtol=1e-12, atol=1e-12
    )


def test_fill_invalid_matches_reference(spark, reference_evaluator_cls):
    """Division by zero: reference fills ±Inf/NaN with 0 under
    fill_invalid=True; ours must produce the identical frame."""
    from ssb_coefficient_maker_spark.api import FormulaEvaluator

    a = pd.DataFrame({"x": [1.0, 2.0, 0.0]})
    b = pd.DataFrame({"x": [0.0, 4.0, 0.0]})
    ref = reference_evaluator_cls(
        data_dict={"a": a.copy(), "b": b.copy()}, fill_invalid=True
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = ref.evaluate_formula("a / b")
    ours = FormulaEvaluator(data_dict={"a": a, "b": b}, fill_invalid=True, spark=spark)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = ours.evaluate_to_pandas("a / b")
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_label_alignment_matches_reference(spark, reference_evaluator_cls):
    """Shifted row indexes: reference aligns on labels (union of rows,
    NaN → 0 under fill); ours joins on __row_id__ — same answer."""
    from ssb_coefficient_maker_spark.api import FormulaEvaluator

    a = pd.DataFrame({"x": [1.0, 2.0]}, index=[0, 1])
    b = pd.DataFrame({"x": [3.0, 4.0]}, index=[1, 2])
    ref = reference_evaluator_cls(
        data_dict={"a": a.copy(), "b": b.copy()}, fill_invalid=True
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = ref.evaluate_formula("a + b")
    ours = FormulaEvaluator(data_dict={"a": a, "b": b}, fill_invalid=True, spark=spark)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = ours.evaluate_to_pandas("a + b")
    pd.testing.assert_frame_equal(
        got.sort_index(), expected.sort_index(), check_dtype=False
    )


def test_batch_calculator_matches_reference(spark, reference_evaluator_cls):
    """CoefficientCalculator parity on a 4-row map (one valid, one
    empty formula, one with a missing variable, one more valid):
    the reference and this engine must compute the same result SET
    (same skips) and the same numbers."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF_SRC)
    try:
        from ssb_coefficient_maker import CoefficientCalculator as RefCC
    finally:
        sys.path.remove(REF_SRC)

    from ssb_coefficient_maker_spark.api import CoefficientCalculator

    data = _data()
    cmap = pd.DataFrame(
        {
            "result_name": ["sum_ab", "skipped_empty", "skipped_missing", "ratio"],
            "formula": ["a + b", "", "a + nosuch", "a / (a + b)"],
        }
    )
    # adp_enabled=False: the reference DEFAULTS to True, and in that
    # default mode its own batch loop crashes ('"**" in formula_str'
    # on a sympy Add — coeff_maker.py:744, SURVEY §2 warts); upstream's
    # tests also only exercise the calculator with ADP off.
    ref = RefCC(
        coefficient_map=cmap.copy(),
        data_dict={k: v.copy() for k, v in data.items()},
        result_name_col="result_name",
        formula_name_col="formula",
        adp_enabled=False,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = ref.compute_coefficients()
    ours = CoefficientCalculator(
        coefficient_map=cmap,
        data_dict=data,
        result_name_col="result_name",
        formula_name_col="formula",
        spark=spark,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = ours.compute_coefficients_to_pandas()
    assert set(got) == set(expected) == {"sum_ab", "ratio"}
    for name in got:
        pd.testing.assert_frame_equal(
            got[name].sort_index(),
            expected[name].sort_index(),
            check_dtype=False,
            rtol=1e-12,
            atol=1e-12,
        )
