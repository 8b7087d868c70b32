"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 Part C; the driver compares each Spark result
against the DuckDB oracle at sf0.01 (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust
# to whatever cwd/sys.path the driver uses
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the formula engine's
    coefficient-map evaluation over pivoted lineitem matrices."""
    from ssb_coefficient_maker_spark.queries import q24_formula_coeffmap

    return q24_formula_coeffmap(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ssb_coefficient_maker_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from ssb_coefficient_maker_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
