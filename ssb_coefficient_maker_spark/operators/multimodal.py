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
