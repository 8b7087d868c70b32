"""Property-based tests: random formulas × random matrices, Spark
result vs direct pandas evaluation (the reference's own oracle style,
SURVEY.md §5, upgraded with hypothesis)."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ssb_coefficient_maker_spark.api import FormulaEvaluator

NAMES = ["a", "b", "c"]


@st.composite
def formulas(draw, depth: int = 0):
    """Random arithmetic formulas over a/b/c with literals."""
    if depth >= 2:
        return draw(st.sampled_from(NAMES + ["2", "0.5", "3.0"]))
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(st.sampled_from(NAMES))
    if kind == 1:
        return draw(st.sampled_from(["1", "2", "0.5"]))
    op = draw(st.sampled_from(["+", "-", "*", "/"]))
    left = draw(formulas(depth=depth + 1))
    right = draw(formulas(depth=depth + 1))
    return f"({left} {op} {right})"


@pytest.fixture(scope="module")
def matrices():
    rng = np.random.default_rng(seed=123)
    return {
        n: pd.DataFrame(rng.integers(-5, 6, (4, 3))).astype(float) for n in NAMES
    }


@pytest.fixture(scope="module")
def shared_evaluator(spark, matrices):
    return FormulaEvaluator(matrices, fill_invalid=True, spark=spark)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(formula=formulas())
def test_random_formula_matches_pandas(shared_evaluator, matrices, formula):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            got = shared_evaluator.evaluate_to_pandas(formula)
        except ValueError:
            # all-invalid result raises by policy when every cell is
            # invalid; pandas oracle must agree it is all-invalid
            import re as _re

            env = {k: v for k, v in matrices.items()}
            env["__builtins__"] = {}
            np_f = _re.sub(r"(?<![\w.])(\d+(?:\.\d+)?)", r"np.float64(\1)", formula)
            with np.errstate(divide="ignore", invalid="ignore"):
                exp = eval(np_f, {"np": np}, env)
            if np.isscalar(exp):
                return
            assert (~np.isfinite(exp.to_numpy())).all()
            return
    env = {k: v for k, v in matrices.items()}
    # literals in the oracle must be numpy scalars: the engine is IEEE
    # everywhere (scalar 1/0 -> inf, like the matrix path), while plain
    # Python int division raises
    env["__builtins__"] = {}
    import re as _re

    np_formula = _re.sub(r"(?<![\w.])(\d+(?:\.\d+)?)", r"np.float64(\1)", formula)
    with np.errstate(divide="ignore", invalid="ignore"):
        exp = eval(np_formula, {"np": np}, env)
    if np.isscalar(exp) or not hasattr(exp, "replace"):
        assert got == pytest.approx(float(exp), nan_ok=True)
        return
    exp = exp.replace([np.inf, -np.inf, np.nan], 0)
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9, atol=1e-12)
