"""Derived storage layouts of the testdata: partitioned parquet, CSV,
JSON.

The testdata ships as plain parquet; these helpers materialize the
storage variants the declared source/sink surface covers (SURVEY.md §2
Part C sources) so registry queries can exercise them end-to-end:

- ``events`` re-written **partitioned by event date** — the layout a
  100 TB event store would actually use (the reference's hovedbok
  batch jobs, reference/README.md:95-133, run over period-partitioned
  ledgers). A date filter on the partitioned copy must show up as a
  ``PartitionFilters`` entry (partition PRUNING — whole directories
  skipped at planning time), not a ``PushedFilters`` row filter;
  asserted in tests/test_scale_paths.py.
- ``orders`` as CSV, ``part`` as JSON — scan paths with explicit
  schemas (never ``inferSchema``: an inference pass reads the whole
  input twice, untenable at scale).

Each derivative is written once per (sf_dir, layout) into a
deterministic temp path keyed by the sf_dir's absolute path, guarded
by parquet/csv/json ``_SUCCESS`` markers; repeated registry/bench runs
reuse the files. Spark's writers round-trip doubles exactly
(shortest-repr formatting), so the DuckDB oracles run on the ORIGINAL
parquet views and still hash-match.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_coefficient_maker_spark.sources.loaders import load_table

ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.DateType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

PART_JSON_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.LongType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)


def _derived_root(sf_dir: str, layout: str) -> str:
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_derived", f"{os.path.basename(sf_dir)}-{key}", layout
    )


def _is_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """events re-written partitioned by ``event_date`` (30 daily
    directories). One shuffle-free write per sf_dir per machine; the
    partition column is derived, everything else passes through."""
    path = _derived_root(sf_dir, "events_by_date")
    if not _is_done(path):
        ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    return path


def orders_csv_path(spark: SparkSession, sf_dir: str) -> str:
    path = _derived_root(sf_dir, "orders_csv")
    if not _is_done(path):
        orders = load_table(spark, sf_dir, "orders").select(
            *[f.name for f in ORDERS_CSV_SCHEMA.fields]
        )
        orders.write.mode("overwrite").option("header", "true").csv(path)
    return path


def part_json_path(spark: SparkSession, sf_dir: str) -> str:
    path = _derived_root(sf_dir, "part_json")
    if not _is_done(path):
        part = load_table(spark, sf_dir, "part").select(
            *[f.name for f in PART_JSON_SCHEMA.fields]
        )
        part.write.mode("overwrite").json(path)
    return path


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(partitioned_events_path(spark, sf_dir))
