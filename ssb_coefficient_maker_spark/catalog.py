"""Named-dataset registry and matrix <-> pandas conversion.

The reference holds its datasets in a plain ``data_dict: dict[str,
pd.DataFrame | pd.Series]`` (reference coeff_maker.py:592) and relies
on the pandas row index for alignment. Spark has no row order, so a
matrix here is a DataFrame with an explicit ``__row_id__`` column
(string-typed row label) plus one double column per matrix column
(SURVEY.md §1.1).  Vectors (pandas Series) are small by construction —
they broadcast across matrix *columns* in the reference semantics
(reference coeff_maker.py:757-763) — so they are kept driver-side as
an ordered label->value mapping and inlined as literals at compile
time (zero shuffle).

Scale notes (100 TB): matrices are arbitrarily long (rows are
distributed, hash-partitioned by ``__row_id__`` at the alignment
join); widths beyond a few thousand columns should switch to the
long/triplet form (SURVEY.md §7 risk 3) — ``wide_threshold`` guards
this with an explicit error until the triplet path lands.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_coefficient_maker_spark.session import ROW_ID

WIDE_MATRIX_THRESHOLD = 4000


@dataclass
class Vector:
    """Driver-side named vector (pandas Series analog).

    The reference strips a Series' index and broadcasts its values
    positionally across the DataFrame columns (reference
    coeff_maker.py:761 ``val.T.to_numpy()``). We keep labels for
    diagnostics but follow the same positional broadcast for parity.
    """

    labels: list[str]
    values: np.ndarray  # float64

    @property
    def size(self) -> int:
        return len(self.values)


@dataclass
class Matrix:
    """A named matrix: Spark DataFrame with ROW_ID + double value columns."""

    df: DataFrame
    value_cols: list[str] = field(default_factory=list)

    @property
    def columns(self) -> list[str]:
        return list(self.value_cols)


def _stringify(labels: Iterable[Any]) -> list[str]:
    return [str(x) for x in labels]


def matrix_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> Matrix:
    """Ingest a pandas DataFrame as a Matrix (index -> __row_id__ strings).

    Mirrors the reference's float64 ingestion cast (reference
    coeff_maker.py:634-638): non-castable input raises.
    """
    cast = pdf.astype(np.float64, copy=True, errors="raise")
    cols = _stringify(cast.columns)
    out = pd.DataFrame({ROW_ID: _stringify(cast.index)})
    for src, dst in zip(cast.columns, cols):
        out[dst] = cast[src].to_numpy()
    schema = T.StructType(
        [T.StructField(ROW_ID, T.StringType(), False)]
        + [T.StructField(c, T.DoubleType(), True) for c in cols]
    )
    return Matrix(
        df=_rightsized(spark.createDataFrame(out, schema=schema), len(out)),
        value_cols=cols,
    )


def _rightsized(df: DataFrame, n_rows: int) -> DataFrame:
    """Coalesce a driver-ingested frame to ~10k rows per partition.

    Arrow ``createDataFrame(pandas)`` slices the input into
    ``defaultParallelism`` chunks regardless of size, so a 300-row
    matrix arrives as 32 partitions and every downstream Python stage
    (the ADP ``mapInPandas``) spawns one worker per core for ~10 rows
    each (guide §4.1: the boundary cost is per task, not per row).
    The row count is known exactly on the driver — coalesce (narrow,
    never increases partitions) to the size the data warrants.
    """
    return df.coalesce(max(1, -(-n_rows // 10_000)))


def matrix_from_spark(
    df: DataFrame, row_id: str | None = None, on_wide: str = "error"
) -> Matrix:
    """Wrap an existing Spark DataFrame as a Matrix.

    ``row_id`` names the row-label column (default: ``__row_id__`` if
    present, else error — Spark rows are unordered, an explicit key is
    required; never synthesize one after a shuffle, SURVEY.md §7 risk 2).
    ``on_wide="allow"`` skips the width guard (the caller is converting
    to the long/triplet form, plans/triplet.py).
    """
    rid = row_id or ROW_ID
    if rid not in df.columns:
        raise ValueError(
            f"matrix DataFrame needs an explicit row-id column {rid!r}; "
            f"got columns {df.columns}"
        )
    value_cols = [c for c in df.columns if c != rid]
    if on_wide == "error" and len(value_cols) > WIDE_MATRIX_THRESHOLD:
        raise ValueError(
            f"matrix has {len(value_cols)} columns; wide matrices beyond "
            f"{WIDE_MATRIX_THRESHOLD} should use the long/triplet form"
        )
    # keep the row-id's NATIVE type: a long key joins on long (and can
    # reuse upstream hash-partitioning, e.g. a groupBy that produced
    # this matrix); the alignment join only falls back to string when
    # operands disagree on the key type
    sel = [F.col(rid).alias(ROW_ID)] + [F.col(c).cast("double").alias(c) for c in value_cols]
    return Matrix(df=df.select(sel), value_cols=value_cols)


def vector_from_pandas(series: pd.Series) -> Vector:
    vals = series.astype(np.float64, copy=True).to_numpy()
    return Vector(labels=_stringify(series.index), values=vals)


def matrix_to_pandas(m: Matrix, index_dtype: str | None = None) -> pd.DataFrame:
    """Collect a Matrix back to pandas, restoring the row index.

    Sorts by ``__row_id__`` (numerically when all labels are numeric)
    since Spark output order is nondeterministic. Collect is for tests
    and small results only — production results go to parquet sinks.
    """
    pdf = m.df.toPandas()
    idx = pdf[ROW_ID]
    numeric = pd.to_numeric(idx, errors="coerce")
    if not numeric.isna().any():
        order = numeric.sort_values(kind="mergesort").index
        idx = numeric
    else:
        order = idx.sort_values(kind="mergesort").index
    pdf = pdf.loc[order]
    out = pdf[m.value_cols].copy()
    out.index = pd.Index(idx.loc[order].values)
    out.index.name = None
    # restore numeric column labels when possible (pandas parity)
    try:
        out.columns = [int(c) for c in m.value_cols]
    except ValueError:
        out.columns = list(m.value_cols)
    return out


class MatrixCatalog:
    """The engine's ``data_dict`` analog: named matrices, vectors, scalars."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._entries: dict[str, Matrix | Vector | float] = {}

    def register(self, name: str, value: Any, row_id: str | None = None) -> None:
        if not name.isidentifier():
            raise ValueError(f"dataset name {name!r} is not a valid identifier")
        if isinstance(value, pd.DataFrame):
            self._entries[name] = matrix_from_pandas(self.spark, value)
        elif isinstance(value, pd.Series):
            self._entries[name] = vector_from_pandas(value)
        elif isinstance(value, DataFrame):
            self._entries[name] = matrix_from_spark(value, row_id=row_id)
        elif isinstance(value, Matrix | Vector):
            self._entries[name] = value
        elif isinstance(value, (int, float)):
            self._entries[name] = float(value)
        else:
            raise TypeError(f"cannot register {name!r}: unsupported type {type(value)}")

    def register_all(self, data: Mapping[str, Any]) -> None:
        for k, v in data.items():
            self.register(k, v)

    def get(self, name: str) -> Matrix | Vector | float:
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return list(self._entries)
