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


def source_fingerprint(sf_dir: str) -> str:
    """Identity of the source data, not just its path: abspath plus
    (name, size, mtime) of every parquet in the dir. A regenerated
    testdata drop (new round, new writer, new types) changes the
    fingerprint and invalidates every cached derivative — without
    this, stale round-N layouts would silently serve old data."""
    h = hashlib.sha1(os.path.abspath(sf_dir).encode())
    try:
        entries = sorted(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in os.scandir(sf_dir)
            if e.name.endswith(".parquet")
        )
    except FileNotFoundError:
        entries = []
    for name, size, mtime in entries:
        h.update(f"|{name}:{size}:{mtime}".encode())
    return h.hexdigest()


def _derived_root(sf_dir: str, layout: str) -> str:
    key = source_fingerprint(sf_dir)[:12]
    base = os.path.basename(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_derived")
    _evict_stale_siblings(root, base, key)
    return os.path.join(root, f"{base}-{key}", layout)


def _evict_stale_siblings(root: str, base: str, live_key: str) -> None:
    """Delete derived dirs for the same sf_dir basename under a stale
    fingerprint. Testdata is regenerated every round; without eviction
    each regeneration mints a new ``{base}-{key}`` dir and the old ones
    accumulate forever (flagged in round-2 ADVICE)."""
    import shutil

    try:
        siblings = os.scandir(root)
    except FileNotFoundError:
        return
    for e in siblings:
        if e.is_dir() and e.name.startswith(f"{base}-") and e.name != f"{base}-{live_key}":
            shutil.rmtree(e.path, ignore_errors=True)


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


def supplier_orc_path(spark: SparkSession, sf_dir: str) -> str:
    """supplier round-tripped through ORC (the third columnar format
    Spark ships a native vectorized reader for): binary format, so
    doubles survive bit-exact and the DuckDB oracle on the original
    parquet hash-matches."""
    path = _derived_root(sf_dir, "supplier_orc")
    if not _is_done(path):
        load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(path)
    return path


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(partitioned_events_path(spark, sf_dir))


def evolved_part_path(spark: SparkSession, sf_dir: str) -> str:
    """part written as two batches with EVOLVED schemas: batch=1
    (even p_partkey) lacks ``p_size``; batch=2 (odd p_partkey) carries
    it — the additive schema evolution every long-lived dataset
    undergoes. Read back with ``mergeSchema=true``."""
    path = _derived_root(sf_dir, "part_evolved")
    if not _is_done(os.path.join(path, "batch=2")):
        part = load_table(spark, sf_dir, "part")
        (
            part.filter(F.col("p_partkey") % 2 == 0)
            .select("p_partkey", "p_brand", "p_retailprice")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "batch=1"))
        )
        (
            part.filter(F.col("p_partkey") % 2 == 1)
            .select("p_partkey", "p_brand", "p_retailprice", "p_size")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "batch=2"))
        )
    return path


N_BUCKETS = 8
BACKFILL_DAY = "2024-01-07"
BACKFILL_FACTOR = 2.0


def backfilled_events_path(spark: SparkSession, sf_dir: str) -> str:
    """A second date-partitioned events copy with ONE day backfilled
    via DYNAMIC partition overwrite: the corrected day's rows (value ×
    BACKFILL_FACTOR, recomputed from the ORIGINAL source — idempotent)
    replace exactly that partition directory; every other partition's
    files are untouched (asserted in tests/test_sources.py). This is
    the partition-granular upsert a 100 TB event store uses for
    backfills — rewrite one day, not the table. Kept separate from the
    q59 copy so that query's oracle stays valid."""
    path = _derived_root(sf_dir, "events_backfill")
    marker = os.path.join(path, "_BACKFILL_DONE")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
        corrected = ev.filter(F.col("event_date") == BACKFILL_DAY).withColumn(
            "value", F.col("value") * BACKFILL_FACTOR
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # mode=overwrite + dynamic: only partitions PRESENT in the
            # written data are replaced — here, exactly one directory
            corrected.write.mode("overwrite").partitionBy("event_date").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        with open(marker, "w") as f:
            f.write(BACKFILL_DAY)
    return path


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders + lineitem saved as BUCKETED tables (same key, same
    bucket count) — the storage layout that makes their join
    shuffle-free: each side's files are already hash-partitioned by
    ``orderkey`` into N_BUCKETS, so the SortMergeJoin reads co-located
    buckets with NO Exchange on either side (asserted in
    tests/test_sources.py). At 100 TB this is THE fact-to-fact join
    strategy — the shuffle this avoids is the dominant cost of the
    unbucketed plan. Registered once per (session, sf_dir) in the
    session catalog as external tables under the derived temp root.
    """
    key = source_fingerprint(sf_dir)[:8]
    t_orders, t_lineitem = f"orders_bkt_{key}", f"lineitem_bkt_{key}"
    # Drop catalog entries bucketed against a superseded fingerprint
    # (backing files already evicted by _evict_stale_siblings). Tables
    # for a DIFFERENT live sf_dir keep their files and are left alone.
    for stale in spark.catalog.listTables():
        name = stale.name
        if name.startswith(("orders_bkt_", "lineitem_bkt_")) and name not in (
            t_orders,
            t_lineitem,
        ):
            loc = (
                spark.sql(f"DESCRIBE FORMATTED {name}")
                .filter("col_name = 'Location'")
                .collect()
            )
            path = loc[0].data_type.replace("file:", "") if loc else ""
            if not path or not os.path.exists(path):
                spark.sql(f"DROP TABLE IF EXISTS {name}")
    for tname, src, cols in (
        (t_orders, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"]),
        (t_lineitem, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"]),
    ):
        if spark.catalog.tableExists(tname):
            continue
        path = _derived_root(sf_dir, tname)
        bucket_col = cols[0]
        (
            load_table(spark, sf_dir, src)
            .select(*cols)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, bucket_col)
            .sortBy(bucket_col)
            .option("path", path)
            .format("parquet")
            .saveAsTable(tname)
        )
    return t_orders, t_lineitem


def date_dim_path(spark: SparkSession, sf_dir: str) -> str:
    """A materialized date dimension derived from events: per-date
    activity rollups plus a busy-day rank (by total value, date
    tie-break). Gives the dynamic-partition-pruning demo (q104) a
    genuinely independent dim TABLE whose selective literal filter
    (busy_rank <= k) cannot be statically inferred onto the fact
    scan — the real star-schema shape."""
    path = _derived_root(sf_dir, "date_dim")
    if not _is_done(path):
        from pyspark.sql import Window

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.to_date("ts").alias("event_date"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("day_value"),
            )
        )
        # global rank over a days-sized frame (one row per date — tiny
        # by construction at any corpus size)
        w = Window.orderBy(F.col("day_value").desc(), F.col("event_date").asc())
        dim = daily.withColumn("busy_rank", F.row_number().over(w))
        dim.write.mode("overwrite").parquet(path)
    return path


def prefixed_cache_root(tag: str, sf_dir: str) -> str:
    """Fingerprint-keyed cache dir for per-query derived state
    (streaming checkpoints/sinks: q80, q105). Same eviction contract
    as ``_derived_root``: when the source fingerprint changes, stale
    siblings of the same tag are removed — without this, every
    testdata regeneration minted a new dir forever (the round-2
    ADVICE leak, fixed for ``{base}-{key}`` dirs but not for these).
    The dir name AND the eviction scope include the sf_dir basename:
    keying on the fingerprint alone would make every scale switch
    (sf0.01 tests -> sf0.1 bench -> sf1 validation) delete the other
    scale's live checkpoints.

    Concurrency caveat (single-driver contract): eviction extends to
    LIVE streaming checkpoints — if testdata under the same sf_dir
    basename is regenerated (new fingerprint) while another process
    still runs a q80/q105 stream against the old data, the first
    caller on the new fingerprint rmtree's that running query's
    checkpoint/sink mid-stream. Fine for this bench harness (one
    driver at a time); a multi-tenant deployment would key eviction
    on checkpoint liveness (lease files) instead."""
    import shutil
    import tempfile

    key = source_fingerprint(sf_dir)[:12]
    base = os.path.basename(os.path.abspath(sf_dir).rstrip("/"))
    root = os.path.join(tempfile.gettempdir(), "spark_graft_derived")
    live = f"{tag}-{base}-{key}"
    try:
        for e in os.scandir(root):
            if (
                e.is_dir()
                and e.name.startswith(f"{tag}-{base}-")
                and e.name != live
            ):
                shutil.rmtree(e.path, ignore_errors=True)
    except FileNotFoundError:
        pass
    return os.path.join(root, live)


def small_files_events_path(spark: SparkSession, sf_dir: str) -> str:
    """The PROBLEM layout for the compaction demo (q109): events
    shattered into 64 tiny files — what streaming ingestion and
    over-parallel writers produce, and what kills scan throughput at
    scale (per-file open/footer cost dominates)."""
    path = _derived_root(sf_dir, "events_small_files")
    if not _is_done(path):
        load_table(spark, sf_dir, "events").repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def compacted_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Compaction (the OPTIMIZE operation): the shattered layout
    rewritten as few, size-bounded, KEY-CLUSTERED files —
    ``repartitionByRange`` assigns disjoint user_id ranges per output
    file (so selective key scans touch one file; min/max row-group
    stats prune the rest) and ``sortWithinPartitions`` orders rows
    inside each file for run-length/dictionary encoding wins.
    ``maxRecordsPerFile`` caps file size at any input volume."""
    path = _derived_root(sf_dir, "events_compacted")
    if not _is_done(path):
        ev = spark.read.parquet(small_files_events_path(spark, sf_dir))
        (
            ev.repartitionByRange(4, "user_id")
            .sortWithinPartitions("user_id", "ts")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 2_000_000)
            .parquet(path)
        )
    return path


def zorder_key(a: "F.Column", b: "F.Column", bits: int = 16) -> "F.Column":
    """Z-order (Morton) curve key: interleave the low ``bits`` of two
    non-negative ints, built from ``bits`` pairs of JVM shift/mask
    terms (a static expression — no UDF, stays in codegen). Domain
    precondition: both inputs in [0, 2^bits); higher bits are masked
    off, which ALIASES distant values onto nearby curve positions —
    acceptable for clustering (locality degrades, correctness of the
    data is untouched), but size ``bits`` to the real key domain."""
    z = F.lit(0).cast("long")
    a = a.cast("long")
    b = b.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zordered_events_path(spark: SparkSession, sf_dir: str, n_files: int = 16) -> str:
    """MULTI-dimensional clustering (the Z-ORDER flavor of OPTIMIZE,
    q121): events rewritten clustered on the Morton interleave of
    (user_id, day) BUCKET ids, so file-level min/max stats prune BOTH
    per-user scans AND per-day scans — a single-key sort (q109's
    compaction) can only serve one of the two.

    Each dimension is first mapped to a 16-bucket ``width_bucket``
    over its actual min/max (one tiny agg at write time): raw-domain
    interleaving is useless when bit widths are unbalanced (epoch day
    ~19.7k occupies 15 bits while user_id at small SF occupies 4 —
    the curve order then degenerates to a single-dim sort; measured
    10/16 files for a user point query vs 4/16 after bucketing).
    Production Z-ORDER implementations bucket for exactly this
    reason. With F files a point query on either dimension touches
    ~sqrt(F) files (locality test-asserted via input_file_name() in
    tests/test_round4_ops.py). Rewrite is value-preserving — q121's
    oracle aggregates the ORIGINAL events."""
    path = _derived_root(sf_dir, "events_zordered")
    if not _is_done(path):
        ev = load_table(spark, sf_dir, "events").withColumn(
            "__d", F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        )
        lims = ev.agg(
            F.min("user_id").alias("ulo"),
            F.max("user_id").alias("uhi"),
            F.min("__d").alias("dlo"),
            F.max("__d").alias("dhi"),
        ).collect()[0]
        bu = F.width_bucket(
            F.col("user_id"), F.lit(lims["ulo"]), F.lit(lims["uhi"] + 1), F.lit(16)
        ) - F.lit(1)
        bd = F.width_bucket(
            F.col("__d"), F.lit(lims["dlo"]), F.lit(lims["dhi"] + 1), F.lit(16)
        ) - F.lit(1)
        (
            ev.withColumn("__z", zorder_key(bu, bd, bits=4))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", "__d")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 2_000_000)
            .parquet(path)
        )
    return path
