"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque BINARY columns + typed metadata structs; decode /
feature-extract / resize / frame-sample are Arrow-batched pandas UDFs over
mapInPandas. The decode step is STUBBED (no media libs in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, which
produces a deterministic fake decode so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "image_features",
           "frame_sample"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])


def _fake_decode(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic fake decode: bytes → pseudo-pixel grid via sha256
    expansion. Stands in for PIL/libav until media libs are available."""
    d = hashlib.sha256(bytes(payload)).digest()
    reps = (w * h * 3) // len(d) + 1
    buf = np.frombuffer((d * reps)[: w * h * 3], dtype=np.uint8)
    return buf.reshape(h, w, 3).astype(np.float64) / 255.0


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata without decoding: byte length + magic-number mime."""
    p = F.col(payload_col)
    mime = (F.when(F.expr(f"substring({payload_col}, 1, 3)") == bytes(b"\xff\xd8\xff"), "image/jpeg")
            .when(F.expr(f"substring({payload_col}, 2, 3)") == bytes(b"PNG"), "image/png")
            .otherwise("application/octet-stream"))
    return df.withColumn("n_bytes", F.length(p)).withColumn("mime_sniffed", mime)


def image_features(media: DataFrame, fake: bool = True,
                   id_col: str = "media_id") -> DataFrame:
    """Per-image feature vector (mean/std per channel) via mapInPandas.

    Real decode is NotImplemented in this container; ``fake=True`` exercises
    the identical Arrow path with the deterministic fake decoder.
    """
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv — not in container")
                img = _fake_decode(bytes(payload))
                feats.append(np.concatenate([img.mean(axis=(0, 1)),
                                             img.std(axis=(0, 1))]).tolist())
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, "features": feats})

    return media.select(id_col, "payload").mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True,
                 id_col: str = "media_id") -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, t_ms, features)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real video decode requires libav — not in container")
                dur = int(row.meta["duration_ms"] if isinstance(row.meta, dict)
                          else (row.meta.duration_ms or 0))
                for i, t in enumerate(range(0, max(dur, 1), every_ms)):
                    img = _fake_decode(bytes(row.payload) + t.to_bytes(8, "little"))
                    recs.append({id_col: getattr(row, id_col), "frame_idx": i,
                                 "t_ms": t,
                                 "features": img.mean(axis=(0, 1)).tolist()})
            yield pd.DataFrame(recs, columns=[f.name for f in schema.fields])

    return media.select(id_col, "payload", "meta").mapInPandas(run, schema)
