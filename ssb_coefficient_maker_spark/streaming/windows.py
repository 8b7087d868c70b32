"""Structured Streaming over the events table (SURVEY.md §2 Part C
streaming rows).

The batch equivalents of the windowed aggregations live in
``operators/relational.py`` (q20/q21) and are oracle-checked; these
streaming versions share the same aggregation expressions, so the
batch oracle indirectly validates the streaming logic — the streaming
tests then assert stream-vs-batch equality under an availableNow-style
full replay (memory sink, ``processAllAvailable``).

Production shape: ``readStream`` from a real source (Kafka), the same
transformations, ``writeStream`` with checkpointing. Watermarks bound
state: a 1-hour watermark on a 1-hour window keeps at most ~2 windows
of state per key regardless of input volume.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """File streams need an explicit schema; the physical ts type varies
    by generator (TIMESTAMP(NANOS) → long under nanosAsLong, tz-less
    TIMESTAMP(MICROS) → TIMESTAMP_NTZ), so probe the footer via a batch
    read (metadata only, no data scan) and mirror what it reports."""
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source; stands in for
    Kafka). Normalizes ts to a session-UTC timestamp like the batch
    loader, whatever the file's physical type."""
    import os

    from ssb_coefficient_maker_spark.sources.loaders import _ensure_session_confs

    _ensure_session_confs(spark)
    # events.parquet is a DIRECTORY of part files in any real layout
    # (engine-written datasets, production tables) — stream that dir
    # directly. The driver's testdata ships it as a single FILE, which
    # a file-stream source can't be pointed at: scan sf_dir with a
    # pathGlobFilter instead (matches leaf file names, so it would see
    # ZERO files in the directory layout — the sf1 empty-stream bug).
    base = os.path.join(sf_dir, "events.parquet")
    reader = spark.readStream.schema(_events_schema(spark, sf_dir))
    if os.path.isdir(base):
        raw = reader.parquet(base)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def tumbling_window_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h windows with watermark — late rows beyond the
    watermark are dropped and window state is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_window_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_window_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows: activity bursts per user separated by >gap."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup bounded by the watermark: duplicate (user_id,
    event_type) pairs arriving within the watermark horizon are
    dropped; state for old keys is evicted as the watermark advances."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    available_now: bool = False,
) -> DataFrame:
    """Drive a streaming query to completion on a finite source and
    return the sink table.

    ``available_now=True`` uses the modern ``Trigger.AvailableNow``:
    the query processes everything available at start in (possibly
    rate-limited) batches and then TERMINATES on its own — the shape a
    scheduled incremental job uses (start, drain, exit; checkpoints
    carry progress between runs). The default drives an always-on
    query with ``processAllAvailable`` and stops it explicitly."""
    writer = stream_df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}")
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def stream_to_parquet_foreachBatch(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Exactly-once-style parquet sink via foreachBatch: each
    micro-batch overwrites its own epoch subdirectory, so a replayed
    batch (failure/restart) lands idempotently instead of duplicating.
    Returns the started StreamingQuery (caller stops it).

    ``output_mode``: append (default) emits watermark-closed rows per
    epoch — read ``epoch=*``; complete emits the full aggregate each
    epoch — read only the LAST epoch directory.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_mv_path(spark: SparkSession, sf_dir: str) -> str:
    """Maintain a per-event_type (count, sum) materialized view
    incrementally: an update-mode streaming aggregation whose
    foreachBatch sink merges each micro-batch's CHANGED keys into the
    MV by dynamically overwriting only those keys' partitions — q65's
    partition-granular overwrite applied continuously. State is
    per-key (5 event types), so it is cardinality-bounded regardless
    of input volume; the MV directory is the always-current dashboard
    table. Keyed by the source fingerprint: a regenerated testdata
    drop rebuilds the MV from a fresh checkpoint (stale-fingerprint
    siblings evicted by prefixed_cache_root)."""
    from ssb_coefficient_maker_spark.sources.derived import prefixed_cache_root

    root = prefixed_cache_root("q105", sf_dir)
    out, ckpt = os.path.join(root, "mv"), os.path.join(root, "ckpt")

    def run_stream() -> None:
        agg = (
            stream_events(spark, sf_dir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
        )

        def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
            # update mode emits only keys whose aggregate changed this
            # batch; dynamic overwrite replaces exactly those keys'
            # partition directories in the MV
            (
                batch_df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("event_type")
                .parquet(out)
            )

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    if not os.path.isdir(out):
        # checkpoint survived but the MV didn't (tmp cleanup / partial
        # crash): drop the checkpoint and replay from scratch
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        run_stream()
    return out


STATE_PARTITIONS = 8


def state_sized_session(spark: SparkSession, partitions: int = STATE_PARTITIONS) -> SparkSession:
    """Clone the session with shuffle partitioning sized to the LOCAL
    streaming state volume. Every shuffle partition of a stateful
    operator carries its own state store with a fixed per-store setup
    cost, so 32 (or a vanilla 200) partitions for a few MB of state
    is pure overhead (measured 5.5 s -> 2.4 s warm on the
    stream-stream join going 32 -> 8 stores). This is a CAPACITY
    parameter: at production volume it scales UP with key cardinality
    — and for checkpointed queries Spark pins it at first run, so
    restarts keep the original partitioning regardless of conf.
    newSession shares the JVM and catalog but isolates conf, so the
    caller's batch plans are untouched.

    The clone is memoized per (parent session, partitions): all
    streaming queries in a run share ONE state-sized session (round-4
    advisory), so repeated invocations don't accumulate session
    state or re-pay conf propagation. The memo keys on the parent
    session OBJECT (WeakKeyDictionary), not id(spark): an id can be
    reused by a new SparkSession after the old one is collected —
    which would hand out a clone of a dead session — and a weak key
    lets a stopped parent's clones be dropped instead of pinned
    forever (round-6 advisory)."""
    per_parent = _STATE_SESSIONS.get(spark)
    if per_parent is None:
        per_parent = {}
        _STATE_SESSIONS[spark] = per_parent
    cached = per_parent.get(partitions)
    if cached is not None:
        return cached
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", str(partitions))
    per_parent[partitions] = s2
    return s2


_STATE_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, dict[int, SparkSession]]" = (
    weakref.WeakKeyDictionary()
)
