"""Result validation: NaN/Inf audit, fill, warn, raise.

Reference behavior being reproduced (``_ResultValidator``, reference
coeff_maker.py:39-569):

- invalid = NaN, +Inf, -Inf (and missing values) — reference
  coeff_maker.py:260,295 replace-list.
- ``fill_invalid=True`` → replace invalid cells with 0.0 and warn with
  a count (reference coeff_maker.py:104-112).
- otherwise: all cells invalid → ``ValueError`` (message varies when
  the formula mixed Series and DataFrame operands — the classic
  misalignment cause, reference coeff_maker.py:446-507); some cells
  invalid → ``UserWarning`` with percentage and likely cause
  (reference coeff_maker.py:509-569).

Execution shape: the reference scans the full result 1-3 times on the
driver (status, count, fill — reference coeff_maker.py:93,101,106).
Here the audit is ONE distributed aggregate over all value columns
(a single job, partial aggregation map-side), and the fill is a lazy
``when()`` projection fused into the result plan by Catalyst — at
100 TB the audit is the only extra action and touches each cell once.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.session import ROW_ID

INF = float("inf")


def invalid_cond(c: Column) -> Column:
    return F.isnull(c) | F.isnan(c) | (F.abs(c) == INF)


@dataclass
class InvalidStatus:
    """Mirror of reference ``_check_invalid_status`` (coeff_maker.py:315-375)."""

    n_cells: int
    n_invalid: int
    n_nan: int
    n_inf: int

    @property
    def all_invalid(self) -> bool:
        return self.n_cells > 0 and self.n_invalid == self.n_cells

    @property
    def some_invalid(self) -> bool:
        return 0 < self.n_invalid < self.n_cells

    @property
    def has_nan(self) -> bool:
        return self.n_nan > 0

    @property
    def has_inf(self) -> bool:
        return self.n_inf > 0


def invalid_status(df: DataFrame, value_cols: list[str]) -> InvalidStatus:
    """One aggregate pass over all value columns: counts of cells,
    invalid, NaN-or-null, ±Inf."""
    if not value_cols:
        return InvalidStatus(0, 0, 0, 0)
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for c in value_cols:
        col = F.col(c)
        aggs.append(F.sum(invalid_cond(col).cast("long")).alias(f"__inv__{c}"))
        aggs.append(F.sum((F.isnull(col) | F.isnan(col)).cast("long")).alias(f"__nan__{c}"))
        aggs.append(F.sum((F.abs(col) == INF).cast("long")).alias(f"__inf__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    rows = row["__rows__"]
    n_inv = sum(row[f"__inv__{c}"] or 0 for c in value_cols)
    n_nan = sum(row[f"__nan__{c}"] or 0 for c in value_cols)
    n_inf = sum(row[f"__inf__{c}"] or 0 for c in value_cols)
    return InvalidStatus(rows * len(value_cols), n_inv, n_nan, n_inf)


def fill_invalid(df: DataFrame, value_cols: list[str], fill_value: float = 0.0) -> DataFrame:
    """Lazy fill of invalid cells (reference ``_fill_invalid_values``,
    coeff_maker.py:205-229 — but vectorized, no per-cell loop)."""
    # preserve every non-value column (wide: just ROW_ID; triplet:
    # ROW_ID + __col_id__)
    sel = [F.col(c) for c in df.columns if c not in value_cols] + [
        F.when(invalid_cond(F.col(c)), F.lit(fill_value)).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    return df.select(sel)


def _cause_fragment(status: InvalidStatus) -> str:
    if status.has_nan and status.has_inf:
        return "NaN and Inf values"
    if status.has_inf:
        return "Inf values (likely division by zero)"
    return "NaN values (likely missing data or misaligned indexes)"


def validate(
    df: DataFrame,
    value_cols: list[str],
    formula_str: str,
    *,
    fill: bool = False,
    mixed_operands: bool = False,
    verbose: bool = False,
) -> tuple[DataFrame, int]:
    """Audit a compiled result; fill, warn, or raise.

    Returns ``(result_df, invalid_count)`` like reference
    ``validate`` (coeff_maker.py:68-141).
    """
    status = invalid_status(df, value_cols)
    if verbose and status.n_invalid > 0:
        # reference trace shapes (_log_invalid_details,
        # coeff_maker.py:385-415)
        if status.all_invalid:
            print("WARNING: Result contains all invalid values")
        else:
            pct_v = (
                100.0 * status.n_invalid / status.n_cells
                if status.n_cells
                else 0.0
            )
            print(
                f"WARNING: Result contains {status.n_invalid}/"
                f"{status.n_cells} ({pct_v:.2f}%) invalid values"
            )
            if status.has_nan and status.has_inf:
                print(" - Result contains both NaN and Inf values")
            elif status.has_nan:
                print(" - Result contains NaN values")
            elif status.has_inf:
                print(" - Result contains Inf values (division by zero)")
        if fill:
            print("Invalid values will be replaced with zeros")
    if status.n_invalid == 0:
        return df, 0
    if fill:
        # fill_invalid=True is the intended mode (e.g. diagonal-matrix
        # division) — the reference only prints the fill count under
        # verbose (coeff_maker.py:104-112), it does not warn. Warning
        # unconditionally would spam every normal evaluation.
        if verbose:
            print(
                f"Replaced {status.n_invalid} invalid values (NaN/Inf) "
                f"with zeros"
            )
        return fill_invalid(df, value_cols), status.n_invalid
    if status.all_invalid:
        if mixed_operands:
            raise ValueError(
                f"All values in the result of formula '{formula_str}' are "
                f"invalid ({_cause_fragment(status)}). The formula mixes "
                f"vector (Series) and matrix (DataFrame) operands, which "
                f"commonly indicates misaligned shapes or labels."
            )
        raise ValueError(
            f"All values in the result of formula '{formula_str}' are "
            f"invalid ({_cause_fragment(status)})."
        )
    pct = 100.0 * status.n_invalid / status.n_cells
    warnings.warn(
        f"Result of formula '{formula_str}' contains {status.n_invalid} "
        f"invalid value(s) ({pct:.1f}% of {status.n_cells} cells): "
        f"{_cause_fragment(status)}.",
        UserWarning,
        stacklevel=2,
    )
    return df, status.n_invalid
