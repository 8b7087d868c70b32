"""Multimodal column plumbing (SURVEY.md §2 Part C EXT).

Images/audio/video are opaque ``binary`` columns + typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codec call is stubbed (no image/audio libraries in this
container) behind ``decode_stub`` with a deterministic fake, exactly
where a real ``PIL.Image.open`` / ``soundfile.read`` would slot in.

Scale notes: binary payloads make rows heavy → feature extraction
uses ``mapInPandas`` (streamed Arrow batches, bounded memory) and the
batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
payload columns are pruned before any shuffle (extract features
first, shuffle features, never shuffle blobs).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_coefficient_maker_spark.sources.loaders import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a media table from documents: the text bytes stand in
    for an encoded image payload (deterministic, schema-faithful)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.pmod(F.col("doc_id"), 640).cast("int").alias("width"),
            F.pmod(F.col("doc_id"), 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB: stands in for a real media decode (PIL/librosa/ffmpeg not
    in this container). Deterministic fake features from the raw
    bytes; a production build replaces only this function."""
    if payload is None:
        return {"n_bytes": 0, "checksum": 0, "feat_dim": 0}
    return {
        "n_bytes": len(payload),
        "checksum": sum(payload[:64]) if payload else 0,
        "feat_dim": 16,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow-batched, payload pruned
    on output so downstream shuffles never carry blobs."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "feat_dim": [f["feat_dim"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def q37_media_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan — oracled via octet_length; the
    decode path itself is exercised by tests (rows-only)."""
    media = synth_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("media_id")


def synth_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a video table from documents (payload = text bytes,
    deterministic duration/fps metadata) — schema-faithful stand-in
    for an encoded-video column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("video/fake").alias("mime"),
            (1000 + F.pmod(F.col("doc_id"), 120) * 500).cast("long").alias("duration_ms"),
            (24 + F.pmod(F.col("doc_id"), 2) * 6).cast("int").alias("fps"),
        ).alias("meta"),
    )


def frame_schedule(video: DataFrame, every_seconds: int = 1) -> DataFrame:
    """One sampled frame per ``every_seconds`` of each video — the
    schedule is PURE integer expressions over the metadata
    (``sequence`` + ``posexplode``; no Python, no payload touched, so
    Catalyst prunes the blob column out of the scan entirely). The
    frame positions feed the decode stage; at 100 TB you compute the
    schedule first and decode only scheduled frames."""
    dur_s = (F.col("meta.duration_ms") - 1) / F.lit(1000 * every_seconds)
    return video.select(
        "media_id",
        F.col("meta.fps").alias("fps"),
        F.posexplode(F.sequence(F.lit(0), F.floor(dur_s).cast("int"))).alias(
            "sample_idx", "t_sec"
        ),
    ).select(
        "media_id",
        "sample_idx",
        (F.col("t_sec") * every_seconds).alias("t_sec"),
        (F.col("t_sec") * every_seconds * F.col("fps")).cast("long").alias("frame_idx"),
    )


def frame_decode_stub(video: DataFrame, schedule: DataFrame) -> DataFrame:
    """STUB decode of scheduled frames: joins the schedule back to the
    payloads and emits a deterministic fake per-frame checksum inside
    ``mapInPandas`` — the exact seam where ffmpeg/PyAV frame seeks
    would slot in (payload pruned from the output immediately)."""
    joined = schedule.join(video.select("media_id", "payload"), "media_id")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            csums = [
                (int(sum(p[:16])) + int(f)) if p is not None else 0
                for p, f in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "frame_idx": pdf["frame_idx"].values,
                    "frame_checksum": csums,
                }
            )

    return joined.mapInPandas(
        run, schema="media_id long, frame_idx long, frame_checksum long"
    )


def resize_dims(width, height, target: int = 224):
    """Aspect-preserving fit into target×target — pure integer/double
    expressions (the arithmetic every image-resize stage runs; the
    pixel work itself belongs in the decode stub)."""
    w = width.cast("double")
    h = height.cast("double")
    scale = F.least(F.lit(float(target)) / w, F.lit(float(target)) / h)
    return (
        F.floor(w * scale).cast("int").alias("out_w"),
        F.floor(h * scale).cast("int").alias("out_h"),
    )


def q74_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video frame-sampling summary: the 1-fps schedule computed
    from metadata only (blob column never read — schedule is pure
    expressions), aggregated per video."""
    vid = synth_video(spark, sf_dir)
    sched = frame_schedule(vid, every_seconds=1)
    return (
        sched.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_idx").alias("last_frame"),
        )
        .orderBy("media_id")
    )
