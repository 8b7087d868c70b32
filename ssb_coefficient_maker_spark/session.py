"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every default here is chosen so
the same code scales out: AQE on (runtime re-planning, skew-join
handling, partition coalescing), UTC session timezone (oracle parity),
Arrow transfers for the Pandas-UDF slow path, shuffle partitions sized
to the local core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ROW_ID = "__row_id__"


def get_spark(
    app_name: str = "ssb_coefficient_maker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster the caller supplies ``master``/conf externally
    (spark-submit); everything set here is safe cluster-side too.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    # The declared surface is ~60 distinct whole-stage-codegen'd plans;
    # the JVM default 240 MB code cache evicts JIT'd query code under
    # that load (measured ~9% total-bench slowdown). Must be a JVM
    # launch flag: in client mode `spark.driver.extraJavaOptions` is
    # ignored for an in-process driver, so seed SPARK_SUBMIT_OPTS
    # before the gateway JVM starts (no-op if one is already running).
    if "ReservedCodeCacheSize" not in os.environ.get("SPARK_SUBMIT_OPTS", ""):
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "") + " -XX:ReservedCodeCacheSize=512m"
        ).strip()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-partition the output of plans feeding a persist():
        # pinned caches (label maps, LSH/IVF indexes, shingle tables)
        # otherwise materialize with the full shuffle-partition count,
        # and every downstream read of a KB-sized cached frame schedules
        # cores-many near-empty tasks (guide §2.2 — fewer, larger
        # partitions; measured r11: dedup-family cold 75.4 -> 61.5 s,
        # q243 15.9 -> 9.2 s, with warm flat). Scale-adaptive: AQE
        # coalesces by advisory byte size, so large cached frames keep
        # their parallelism.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS); Spark's parquet reader
        # has no nanos timestamp type — read as long, convert in loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
