"""Structured Streaming tests: full-replay stream results must equal
the batch computation over the same events parquet."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.operators.relational import q20_window_tumbling
from ssb_coefficient_maker_spark.sources.loaders import load_table
from ssb_coefficient_maker_spark.streaming.windows import (
    run_to_memory,
    session_window_agg,
    sliding_window_agg,
    stateful_dedup,
    stream_events,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return stream_events(spark, sf_dir)


def test_tumbling_stream_equals_batch(spark, sf_dir, events_stream):
    got = (
        run_to_memory(spark, tumbling_window_agg(events_stream), "t_tumbling", "append")
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    exp = q20_window_tumbling(spark, sf_dir).toPandas().reset_index(drop=True)
    # append mode with watermark: the final window(s) may still be open
    # (no later data to advance the watermark past them) → the stream
    # emits a prefix of the batch result; everything emitted must match.
    assert len(got) >= len(exp) - 10
    merged = got.merge(exp, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["total_value_s"] - merged["total_value_b"]) < 1e-6).all()


def test_sliding_stream_runs(spark, events_stream):
    out = run_to_memory(spark, sliding_window_agg(events_stream), "t_sliding", "append")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf["n"] > 0).all()


def test_session_windows(spark, events_stream):
    out = run_to_memory(spark, session_window_agg(events_stream), "t_session", "append")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf["session_end"] > pdf["session_start"]).all()
    assert (pdf["n_events"] > 0).all()


def test_stateful_dedup(spark, sf_dir, events_stream):
    out = run_to_memory(spark, stateful_dedup(events_stream), "t_dedup", "append")
    n_out = out.count()
    n_in = load_table(spark, sf_dir, "events").count()
    n_keys = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct().count()
    assert n_keys <= n_out <= n_in
    # within one replayed batch everything is inside the watermark →
    # exactly one row per key
    assert n_out == n_keys


def test_stateful_custom_operator(spark, sf_dir, events_stream):
    """applyInPandasWithState running totals == batch groupBy totals
    after a full replay."""
    from ssb_coefficient_maker_spark.streaming.stateful import running_user_totals

    out = run_to_memory(spark, running_user_totals(events_stream), "t_state", "update")
    # update mode may emit a row per micro-batch per user; the LAST
    # emission per user carries the final running totals
    final = (
        out.toPandas()
        .sort_values(["user_id", "n_events_total"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch)
    assert (joined["n_events_total"] == joined["n"]).all()
    assert (abs(joined["total_value"] - joined["tv"]) < 1e-6).all()


def test_foreachbatch_parquet_sink(spark, sf_dir, events_stream, tmp_path):
    from ssb_coefficient_maker_spark.streaming.windows import (
        stream_to_parquet_foreachBatch,
        tumbling_window_agg,
    )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_parquet_foreachBatch(
        spark, tumbling_window_agg(events_stream), out, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(f"{out}/epoch=*")
    assert back.count() > 0
    assert {"window_start", "event_type", "n", "total_value"} <= set(back.columns)


def test_stateful_ttl_evicts_state(spark, sf_dir, events_stream):
    """With a processing-time TTL, Spark runs continuous cleanup
    batches (so processAllAvailable would never go idle) and the
    timed-out branch removes per-user state. Bounded poll: wait until
    every user has emitted, then until a cleanup batch has fired."""
    import time

    from ssb_coefficient_maker_spark.streaming.stateful import running_user_totals

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    q = (
        running_user_totals(events_stream, state_ttl_ms=200)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state_ttl")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.sql(
                "SELECT count(DISTINCT user_id) AS n FROM t_state_ttl"
            ).head()["n"]
            if got >= n_users:
                break
            time.sleep(1)
        assert got >= n_users
        # wait for at least one timeout-cleanup cycle (TTL 200ms)
        saw_cleanup = False
        while time.time() < deadline:
            msg = (q.status or {}).get("message", "")
            if "cleaning up state" in msg:
                saw_cleanup = True
                break
            time.sleep(0.5)
        assert saw_cleanup
    finally:
        q.stop()


def test_q63_streaming_equals_batch_q20(spark, sf_dir):
    """The driver-checked streaming entry: full replay in complete
    mode equals the batch tumbling aggregation (q20) row for row."""
    from ssb_coefficient_maker_spark.operators.relational import q20_window_tumbling
    from ssb_coefficient_maker_spark.queries import q63_streaming_tumbling

    got = q63_streaming_tumbling(spark, sf_dir).collect()
    exp = q20_window_tumbling(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_transform_with_state_matches_old_api(spark, sf_dir, events_stream):
    """transformWithStateInPandas running totals == batch groupBy
    totals after a full replay (same contract as the
    applyInPandasWithState operator it replaces). Skipped where the
    protobuf package TWS's worker protocol needs isn't installed."""
    pytest.importorskip("google.protobuf")
    from ssb_coefficient_maker_spark.streaming.stateful import running_user_totals_tws

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = run_to_memory(
            spark, running_user_totals_tws(events_stream), "t_tws", "update"
        )
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    final = (
        out.toPandas()
        .sort_values(["user_id", "n_events_total"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch)
    assert (joined["n_events_total"] == joined["n"]).all()
    assert (abs(joined["total_value"] - joined["tv"]) < 1e-6).all()


def test_tws_gate_without_protobuf(spark, events_stream):
    """In environments without protobuf the operator must fail fast
    with an actionable message, not crash the streaming worker."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present; gate inactive")
    except ImportError:
        pass
    from ssb_coefficient_maker_spark.streaming.stateful import running_user_totals_tws

    with pytest.raises(ImportError, match="protobuf"):
        running_user_totals_tws(events_stream)


def test_available_now_trigger_equals_batch(spark, sf_dir, events_stream):
    """Trigger.AvailableNow: the query drains the source and
    terminates on its own; complete-mode result equals the batch
    aggregation."""
    got = (
        run_to_memory(
            spark, tumbling_window_agg(events_stream), "t_avnow", "complete",
            available_now=True,
        )
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
        .orderBy("window_start", "event_type")
        .collect()
    )
    exp = q20_window_tumbling(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_stream_static_update_mode_equals_batch(spark, sf_dir, tmp_path):
    """The q110 PRODUCTION shape (round-3 VERDICT next-round #8): the
    registry query runs complete-mode without a watermark by design
    (full-replay oracle semantics); production uses UPDATE mode plus a
    watermark sized to real out-of-orderness. Drive that exact shape
    over multiple micro-batches (maxFilesPerTrigger=1 over a 4-file
    copy) and assert the final update per key equals the batch
    aggregate — so the documented claim can't rot."""
    from ssb_coefficient_maker_spark.queries import Q104_TOP_DAYS
    from ssb_coefficient_maker_spark.sources.derived import date_dim_path
    from ssb_coefficient_maker_spark.streaming.windows import state_sized_session

    s2 = state_sized_session(spark)
    src = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    ev_path = str(tmp_path / "events.parquet")
    src.repartition(4).write.parquet(ev_path)

    dim = s2.read.parquet(date_dim_path(s2, sf_dir)).select(
        "event_date", "busy_rank"
    )
    day_class = (
        F.when(F.col("busy_rank") <= Q104_TOP_DAYS, "busy").otherwise("normal")
    )

    raw = (
        s2.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_path)
    )
    agg = (
        raw.withWatermark("ts", "30 days")  # > corpus span: nothing drops
        .withColumn("event_date", F.to_date("ts"))
        .join(dim, "event_date")
        .groupBy(day_class.alias("day_class"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    sink = run_to_memory(s2, agg, "q110_update_shape", "update").toPandas()

    # per key, counts grow monotonically across emissions: max-n row
    # IS the final state
    final = (
        sink.sort_values("n")
        .groupby(["day_class", "event_type"], as_index=False)
        .tail(1)
        .sort_values(["day_class", "event_type"])
        .reset_index(drop=True)
    )
    # multiple micro-batches really happened: interim versions emitted
    assert len(sink) > len(final)

    exp = (
        s2.read.parquet(ev_path)
        .withColumn("event_date", F.to_date("ts"))
        .join(dim, "event_date")
        .groupBy(day_class.alias("day_class"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .toPandas()
        .sort_values(["day_class", "event_type"])
        .reset_index(drop=True)
    )
    assert len(final) == len(exp)
    merged = final.merge(exp, on=["day_class", "event_type"], suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["total_value_s"] - merged["total_value_b"]) < 1e-6).all()
