"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(`decode_stub=True` uses a deterministic fake that parses our own
MMB1 test header; `decode_stub=False` raises NotImplementedError at the
point a real libjpeg/ffmpeg call would go).  Everything Spark-side is real
and tested: schema, Arrow batch shapes, partition-size control, UDF
signatures -- swapping in a real decoder touches only `_decode_payload`.

Binary payload layout for the deterministic fake (fixtures + tests):
  b"MMB1" | media_type:1 byte (0=img,1=audio,2=video) |
  width:uint16 | height:uint16 | channels:uint8 | payload bytes
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<source:string, ts:timestamp>"
)

FEATURES_SCHEMA = (
    "media_id long, media_type string, width int, height int, channels int, "
    "n_bytes long, mean_value double, feature array<float>"
)

MAGIC = b"MMB1"
_TYPES = {0: "image", 1: "audio", 2: "video"}


def encode_fake_media(media_type: int, width: int, height: int,
                      channels: int, body: bytes) -> bytes:
    return MAGIC + struct.pack("<BHHB", media_type, width, height, channels) + body


def _decode_payload(payload: bytes, stub: bool):
    """Returns (width, height, channels, body:np.uint8[...]).

    Real implementation point: PIL.Image.open / soundfile.read / pyav
    frame-sample would go here.  Raises NotImplementedError when stub
    decoding is disabled and the payload is not MMB1.
    """
    if payload[:4] == MAGIC:
        mt, w, h, c = struct.unpack("<BHHB", payload[4:10])
        body = np.frombuffer(payload[10:], dtype=np.uint8)
        return w, h, c, body
    if stub:
        # unknown container in stub mode: zero-size media
        return 0, 0, 0, np.zeros(0, dtype=np.uint8)
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; wire PIL/soundfile/pyav here"
    )


def extract_media_features(media: DataFrame, feature_dim: int = 8,
                           stub: bool = True) -> DataFrame:
    """media table -> per-item features via mapInPandas.

    The 'feature' is a deterministic byte-histogram projection -- a stand-in
    with the exact shape a CLIP/whisper embedding stage would have
    (array<float> of fixed dim, one row per media item, Arrow-batched).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "media_id", "media_type", "width", "height", "channels",
                "n_bytes", "mean_value", "feature",
            )}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, c, body = _decode_payload(bytes(payload), stub)
                hist = np.bincount(body % feature_dim, minlength=feature_dim) if body.size else np.zeros(feature_dim)
                feat = (hist / max(body.size, 1)).astype(np.float32)
                rows["media_id"].append(int(mid))
                rows["media_type"].append(mtype)
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["channels"].append(int(c))
                rows["n_bytes"].append(int(body.size))
                rows["mean_value"].append(float(body.mean()) if body.size else 0.0)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    src = media.select("media_id", "media_type", "payload")
    return src.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int,
                stub: bool = True) -> DataFrame:
    """Resize plumbing: new payload with updated header dims (the fake
    'resample' keeps a deterministic byte subsample so output is testable)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload = []
            for payload in pdf["payload"]:
                w, h, c, body = _decode_payload(bytes(payload), stub)
                n_out = max(target_w * target_h * max(c, 1), 0)
                resampled = np.resize(body, n_out) if body.size else np.zeros(n_out, dtype=np.uint8)
                out_payload.append(encode_fake_media(0, target_w, target_h, c, resampled.tobytes()))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "media_type": pdf["media_type"],
                "payload": out_payload,
            })

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema="media_id long, media_type string, payload binary"
    )


def make_fake_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table."""
    import datetime as dt
    import random

    rng = random.Random(seed)
    rows = []
    epoch = dt.datetime(2025, 8, 1, tzinfo=dt.timezone.utc)
    for i in range(n):
        mt = i % 3
        w, h, c = rng.randint(2, 64), rng.randint(2, 64), rng.choice([1, 3])
        body = bytes(rng.randrange(256) for _ in range(w * h * c))
        rows.append(
            (i, _TYPES[mt], encode_fake_media(mt, w, h, c, body),
             {"source": f"src{i % 4}", "ts": epoch})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
