"""Multimodal (image/audio/video) column handling.

Media ride as opaque `binary` columns with a typed metadata struct; every
transform is an Arrow-batched mapInPandas whose schema, partitioning and
batch shape are real and tested. The actual codec calls are STUBBED —
image/audio libraries are not available in this container — behind
`decode_image_stub` (a deterministic fake decoder) and
`NotImplementedError` markers, so swapping in a real decoder (PIL/ffmpeg)
changes one function body, not the pipeline.

Schema convention:
  media(url string, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int,
                    duration_ms:int, codec:string>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)


def synth_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media rows: payload = seeded bytes whose header
    encodes the 'decoded' dimensions (so the stub decoder is total)."""
    df = spark.range(0, n).withColumnRenamed("id", "i")
    i = F.col("i")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.pmod(i, F.lit(3)) + 1).cast("int"))
    w = (F.pmod(i, F.lit(64)) * 16 + 64).cast("int")
    h = (F.pmod(i, F.lit(48)) * 16 + 64).cast("int")
    header = F.concat(F.format_string("MM01:%05d:%05d:", w, h))
    payload = F.encode(F.concat(header, F.repeat(F.lit("x"), (F.pmod(i, F.lit(100)) + 1).cast("int"))), "UTF-8")
    meta = F.struct(
        w.alias("width"), h.alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.pmod(i, F.lit(60000))).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return df.select(
        F.concat(F.lit("media://"), i.cast("string")).alias("url"),
        kind.alias("kind"), payload.alias("payload"), meta.alias("meta"),
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: parses the fake header and returns a deterministic
    gradient array of the declared shape. Replace with PIL/turbojpeg in a
    real deployment — the pipeline contract (bytes -> HxWx3 uint8) holds.
    """
    head = bytes(payload[:17]).decode("ascii", errors="replace")
    if not head.startswith("MM01:"):
        raise NotImplementedError(
            "real image decoding not available in this container; payload "
            "is not a fake-media header"
        )
    w = int(head[5:10])
    h = int(head[11:16])
    y, x = np.mgrid[0:h, 0:w]
    img = ((x + y) % 256).astype(np.uint8)
    return np.stack([img, img[::-1], np.roll(img, h // 2, axis=0)], axis=-1)


def image_features(media: DataFrame, out_dim: int = 16) -> DataFrame:
    """bytes → fixed-dim feature vector (here: deterministic histogram of
    the stub-decoded image). Real deployments swap the decode call only.
    Output: (url, feature array<float>, width, height)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, feats, ws, hs = [], [], [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                img = decode_image_stub(payload)
                hist, _ = np.histogram(img[..., 0], bins=out_dim, range=(0, 256))
                total = hist.sum() or 1
                urls.append(url)
                feats.append((hist / total).astype(np.float64).tolist())
                hs.append(img.shape[0])
                ws.append(img.shape[1])
            yield pd.DataFrame(
                {"url": urls, "feature": feats,
                 "width": pd.Series(ws, dtype="int32"),
                 "height": pd.Series(hs, dtype="int32")}
            )

    return media.where(F.col("kind") == "image").select("url", "payload").mapInPandas(
        gen, "url string, feature array<double>, width int, height int"
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize *planning* is pure column math (JVM): target dims preserving
    aspect ratio; the pixel resample itself is the stubbed decode step."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return media.withColumn("target_width", F.round(w * scale).cast("int")).withColumn(
        "target_height", F.round(h * scale).cast("int")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: explode one row per sampled timestamp
    (JVM sequence/explode — the fan-out shape is what matters at scale; the
    actual frame grab is the stubbed decode)."""
    v = media.where(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms").cast("long"), F.lit(int(every_ms)))
    return v.select("url", F.explode(ts).alias("frame_ms"))


def decode_audio_stub(payload: bytes, sample_rate: int) -> np.ndarray:
    """STUB audio decoder: deterministic waveform derived from the fake
    header (real deployments: ffmpeg/soundfile — contract is bytes →
    float32 mono [-1, 1])."""
    head = bytes(payload[:17]).decode("ascii", errors="replace")
    if not head.startswith("MM01:"):
        raise NotImplementedError(
            "real audio decoding not available in this container"
        )
    seed = int(head[5:10])
    n = max(256, sample_rate // 10)  # 100 ms of samples
    t = np.arange(n, dtype=np.float64)
    return np.sin(2 * np.pi * (seed % 97 + 1) * t / sample_rate).astype(np.float32)


def audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """bytes → band-energy vector (rFFT magnitude pooled into n_bands).
    Output: (url, feature array<double>, n_samples)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, feats, ns = [], [], []
            for url, payload, meta in zip(pdf["url"], pdf["payload"], pdf["meta"]):
                sr = int(meta["sample_rate"]) if meta is not None else 16000
                wave = decode_audio_stub(payload, sr)
                spec = np.abs(np.fft.rfft(wave.astype(np.float64)))
                bands = np.array_split(spec, n_bands)
                e = np.array([float((b ** 2).sum()) for b in bands])
                tot = e.sum() or 1.0
                urls.append(url)
                feats.append((e / tot).tolist())
                ns.append(len(wave))
            yield pd.DataFrame(
                {"url": urls, "feature": feats, "n_samples": pd.Series(ns, dtype="int32")}
            )

    return media.where(F.col("kind") == "audio").select("url", "payload", "meta").mapInPandas(
        gen, "url string, feature array<double>, n_samples int"
    )
