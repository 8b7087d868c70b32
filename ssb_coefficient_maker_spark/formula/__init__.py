from ssb_coefficient_maker_spark.formula.parser import (
    FormulaError,
    FormulaExpr,
    extract_variables,
    parse_formula,
)

__all__ = ["FormulaError", "FormulaExpr", "extract_variables", "parse_formula"]
