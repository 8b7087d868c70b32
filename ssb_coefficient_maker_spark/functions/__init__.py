from ssb_coefficient_maker_spark.functions.math import safe_div, safe_floordiv, safe_mod
from ssb_coefficient_maker_spark.functions.vectors import cosine, dot, l2_norm

__all__ = ["safe_div", "safe_floordiv", "safe_mod", "cosine", "dot", "l2_norm"]
