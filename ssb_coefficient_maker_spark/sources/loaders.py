"""Sources: parquet/CSV/JSON scans for the engine's tables.

Everything is a declarative ``spark.read`` so Catalyst gets predicate
pushdown, column pruning and partition pruning for free — check with
``df.explain``: filters on these scans must appear under
``PushedFilters`` and the read schema must shrink to the referenced
columns (SURVEY.md §2 Part C sources).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables worth broadcast-joining against the big facts.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make any caller-provided session able to run our queries.

    The driver (and any embedding application) may hand us a session
    built without our factory: set the runtime-settable SQL confs the
    queries depend on. Both are per-session and idempotent.
    """
    # events.parquet carries TIMESTAMP(NANOS) — unreadable without this
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp→string formatting must be UTC for oracle comparison
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts arrives in whichever physical form the generator used:
        # TIMESTAMP(NANOS) reads as long (spark.sql.legacy.parquet.
        # nanosAsLong), and a tz-less TIMESTAMP(MICROS) reads as
        # TIMESTAMP_NTZ. Normalize both to a session-UTC TimestampType
        # so epoch math (unix_micros), windows and streaming watermarks
        # see one type everywhere.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # session tz is pinned to UTC, so NTZ→LTZ keeps wall-clock
            # values identical to what the oracle (DuckDB) sees
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


# NOTE (r11): a `spread_for_kernel` helper briefly lived here — a
# round-robin repartition of under-parallel scans before the shingle/
# signature kernels (guide §2.5 "input skew"). It was REMOVED after
# measurement: the downstream Arrow/pandas stages pay a fixed per-task
# boundary cost, so splitting a small corpus into cores-many tiny
# tasks multiplied total CPU ~20x (q31 band stage 0.7 s single-task
# -> 8-9 s across 32 tasks) and regressed every shingle-family query
# (q31 cold 3.6 -> 7.6 s, q233 7.3 -> 14.9 s, q57 4.2 -> 8.2 s at
# sf0.1), while the wins attributed to it (q217 28.6 -> 8.1 s cold)
# turned out to come from the accompanying cache/action changes and
# survived its removal. At real scale the scan arrives parallel from
# many splits, so there is nothing to spread.


def literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A small literal lookup table as a pure-JVM plan.

    ``spark.createDataFrame(small_python_list)`` parallelizes pickled
    Python rows into ``defaultParallelism`` slices, so scanning a
    handful of literals runs one PYTHON WORKER per core (guide §4's
    boundary tax on the smallest possible data — measured r11: the
    q223 threshold tables alone cost a 32-task python stage with 39 s
    of task runtime on the cold pass). Building the same rows as an
    inline'd array-of-structs literal keeps the scan entirely in the
    JVM: one task, no Python workers, constant-foldable, and trivially
    broadcastable as a join side.

    ``schema`` is the usual DDL string (``"name type, name type"``);
    cells may be None, scalars, or lists/tuples (array columns).
    Values land exactly as ``createDataFrame`` would land them: each
    cell is cast to the declared field type.

    SIZE GUARD (measured r11): the inline form embeds one expression
    node per scalar cell in the plan, and past a few hundred cells
    the optimizer/codegen cost of that tree dominates every action
    that touches it — q228's 20×64-double centroid table planned as
    inline literals ran 25 s vs 2 s as a plain scan. Large literal
    tables therefore fall back to ``createDataFrame`` over a
    SINGLE-slice parallelize: one Python worker total, no giant
    expression tree. (Not ``.coalesce(1)`` on the default
    parallelize — that merges defaultParallelism pickled slices into
    one task that pays one sequential Python-worker round per slice,
    measured +2.7 s per q228 action.)
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_cells = sum(
        sum(len(v) if isinstance(v, (list, tuple)) else 1 for v in row)
        for row in rows
    )
    if n_cells > 256:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(list(rows), 1), schema
        )

    st = T._parse_datatype_string(schema)

    def cell(v, f):
        if isinstance(v, (list, tuple)):
            lit = F.array(
                *[F.lit(x).cast(f.dataType.elementType) for x in v]
            ).cast(f.dataType)
        else:
            lit = F.lit(v).cast(f.dataType)
        # createDataFrame declares every column nullable; bare literals
        # analyze non-nullable. nullif(x, NULL) analyzes nullable yet
        # constant-folds to the bare literal at execution, so the
        # declared schema matches createDataFrame's exactly at no cost.
        return F.nullif(lit, F.lit(None).cast(f.dataType))

    structs = [
        F.struct(*[cell(v, f).alias(f.name) for v, f in zip(row, st.fields)])
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with an explicit schema (no inferSchema — a schema
    inference pass reads the data twice, untenable at scale)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.json(path, schema=schema)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
