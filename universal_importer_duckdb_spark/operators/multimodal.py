"""Multimodal (image/audio/video) column support.

Data model: media travels as an opaque ``binary`` column plus typed
metadata — the only schema that scales to 100 TB (media bytes stay in
parquet/object storage; Spark moves them only through narrow
mapInPandas stages, never through a shuffle).

    MEDIA_SCHEMA: data binary, media_type string,
                  meta map<string,string>

Decode/feature stages run as Arrow-batched ``mapInPandas`` (the
correct Spark shape for per-item Python libraries: one
python-worker round trip per batch, not per row). The actual codec
calls are STUBBED — image/audio libraries are not in this container —
behind ``_decode_stub``, which produces deterministic fake features
from the bytes so the plumbing (schemas, batch shapes, partitioning)
is real and tested; swap ``_decode_stub`` for PIL/librosa/av calls in
a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "item_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "item_id bigint, media_type string, n_bytes bigint, "
    "duration_s double, sample_rate int, rms double"
)


def attach_media_column(
    df: DataFrame, bytes_col: str, media_type: str, id_col: str
) -> DataFrame:
    """Wrap raw bytes into the canonical media struct."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.struct(
            F.col(bytes_col).alias("data"),
            F.lit(media_type).alias("media_type"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ).alias("media"),
    )


def _decode_stub(data: bytes) -> dict:
    """Deterministic fake decode. REAL deployments replace this with
    PIL.Image.open / soundfile.read etc. Raises for None payloads the
    way a codec would."""
    if data is None:
        raise NotImplementedError("no payload; real codec would raise here")
    n = len(data)
    h = 0
    for b in data[:64]:
        h = (h * 131 + b) % 1_000_003
    return {
        "n_bytes": n,
        "width": 16 + h % 1024,
        "height": 16 + (h // 7) % 1024,
        "mean_luma": (h % 256) / 255.0,
        "duration_s": n / 32000.0,
        "sample_rate": 16000,
        "rms": (h % 1000) / 1000.0,
    }


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas image decode → (dims, luma). Input needs columns
    (item_id, media struct)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                feats = _decode_stub(media["data"])
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "media_type": media["media_type"],
                        "n_bytes": feats["n_bytes"],
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_luma": feats["mean_luma"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                feats = _decode_stub(media["data"])
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "media_type": media["media_type"],
                        "n_bytes": feats["n_bytes"],
                        "duration_s": feats["duration_s"],
                        "sample_rate": feats["sample_rate"],
                        "rms": feats["rms"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled offset (explode — the one acceptable row-multiplying step,
    bounded by payload size / stride). Decode per frame stays stubbed."""
    return df.select(
        "item_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length(F.col("media.data")) / every_n_bytes).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx"),
        F.length(F.col("media.data")).alias("n_bytes"),
    )
