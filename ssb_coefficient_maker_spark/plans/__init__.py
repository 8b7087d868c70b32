from ssb_coefficient_maker_spark.plans.alignment import compile_formula

__all__ = ["compile_formula"]
