"""Multimodal operators — decode / feature-extract / resize / frame-sample
over opaque ``binary`` media columns.

Design (training-data-pipeline tier, no reference counterpart):

- Media travels as an opaque ``binary`` column next to typed metadata —
  the same bytes-first pattern the reference uses for WARC payloads
  (/root/reference/src/warc/fetcher.py:34-100: fetch bytes, decode later).
- Every operator is a ``mapInPandas`` stage: Arrow-batched, columnar
  in/out, no per-row Python dispatch; at 100 TB each task decodes its own
  partition's batches and nothing is collected to the driver.
- The *codec* layer is pluggable. Real decoders (PIL / ffmpeg /
  soundfile) are NOT in this container, so the default codec parses the
  deterministic fake container from :mod:`crawler_spark.sources.media`
  byte-by-byte; ``require_real_codecs()`` raises ``NotImplementedError``
  with the exact dependency list. Swapping the codec does not change any
  schema, batching, or partitioning decision — that plumbing is what
  these operators test.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.sources.media import AUD_MAGIC, IMG_MAGIC, VID_MAGIC

# ---------------------------------------------------------------- codecs --


def require_real_codecs() -> None:
    """Gate for real image/audio/video decoding (not available here)."""
    missing = []
    for mod in ("PIL", "soundfile", "av"):
        try:
            __import__(mod)
        except ImportError:
            missing.append(mod)
    if missing:
        raise NotImplementedError(
            "real media codecs unavailable in this environment: "
            + ", ".join(missing)
            + " — operators run against the deterministic fake container "
            "(crawler_spark.sources.media); install the libs and pass "
            "codec='real' to decode actual media"
        )


def _parse_image(b: bytes):
    """FIMG | u16 w | u16 h | u32 seed | payload → (w, h, mean_pixel)."""
    if b is None or len(b) < 12 or b[:4] != IMG_MAGIC:
        return None
    w, h, _seed = struct.unpack(">HHI", b[4:12])
    payload = b[12:]
    mean = (sum(payload) / len(payload)) if payload else float("nan")
    return w, h, mean


def _parse_audio(b: bytes):
    if b is None or len(b) < 16 or b[:4] != AUD_MAGIC:
        return None
    rate, ms, _seed = struct.unpack(">III", b[4:16])
    return rate, ms


def _parse_video(b: bytes):
    if b is None or len(b) < 12 or b[:4] != VID_MAGIC:
        return None
    n_frames, fps, _seed = struct.unpack(">HHI", b[4:12])
    return n_frames, fps


# ------------------------------------------------------------- operators --

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """media(doc_id, media_type, media) → one typed feature row per item.

    One mapInPandas stage; unparseable/NULL payloads yield NULL features
    (never an exception — a 100 TB scan must not die on one corrupt blob).
    """
    if codec == "real":
        require_real_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in MEDIA_FEATURES_SCHEMA.fieldNames()}
            for doc_id, mt, b in zip(pdf["doc_id"], pdf["media_type"], pdf["media"]):
                row = dict.fromkeys(out)
                row["doc_id"] = doc_id
                row["media_type"] = mt
                row["n_bytes"] = len(b) if b is not None else None
                if mt == "image" and (p := _parse_image(b)):
                    row["width"], row["height"], row["mean_pixel"] = p
                    row["n_pixels"] = p[0] * p[1]
                elif mt == "audio" and (p := _parse_audio(b)):
                    row["sample_rate"], row["duration_ms"] = p
                    row["n_samples"] = p[0] * p[1] // 1000
                elif mt == "video" and (p := _parse_video(b)):
                    row["n_frames"], row["fps"] = p
                    # unrounded IEEE division — rounding happens in the
                    # query layer on BOTH engines (oracle portability rule)
                    row["duration_s"] = p[0] / p[1]
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, MEDIA_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale", DoubleType()),
    ]
)


def resize_plan(media: DataFrame, max_side: int = 256, codec: str = "fake") -> DataFrame:
    """Image resize: computes the letterbox-preserving target geometry and
    (with a real codec) would re-encode the payload. Fake codec carries the
    geometry only — the arithmetic, batching, and schema are the real ones.
    """
    if codec == "real":
        require_real_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                p = _parse_image(b)
                if not p:
                    continue
                w, h, _ = p
                scale = min(1.0, max_side / max(w, h))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_width"].append(max(1, int(w * scale)))
                rows["out_height"].append(max(1, int(h * scale)))
                rows["scale"].append(scale)  # unrounded; query layer rounds
            yield pd.DataFrame(rows)

    return media.where(F.col("media_type") == "image").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
    ]
)


def frame_sample(media: DataFrame, every_k: int = 10, codec: str = "fake") -> DataFrame:
    """Video frame sampling (UDTF shape: one blob → many frame rows).

    Emits every k-th frame index with its timestamp; with a real codec the
    row would also carry the decoded frame bytes. Row explosion happens
    inside the Arrow batch — no JVM-side explode of a Python-built array.
    """
    if codec == "real":
        require_real_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                p = _parse_video(b)
                if not p:
                    continue
                n_frames, fps = p
                for i in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000 // fps)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "ts_ms": tss})

    return media.where(F.col("media_type") == "video").mapInPandas(batches, FRAME_SCHEMA)


def media_type_stats(features: DataFrame) -> DataFrame:
    """Per-modality rollup of decoded features (post-decode aggregate).

    Portability contract: every averaged quantity is an exact integer per
    row (``n_pixels``, ``n_samples``, and microsecond-truncated duration),
    so the aggregate sum is exact in a double (< 2^53) and therefore
    independent of partial-aggregation fold order — Spark and any
    scan-ordered engine produce bit-identical averages. Averaging the raw
    IEEE ``duration_s`` doubles instead is fold-order dependent and flips
    ``round(..., 4)`` at half boundaries (failed the cross-engine hash in
    round 1).
    """
    return (
        features.withColumn(
            "duration_us", F.expr("CAST(n_frames AS BIGINT) * 1000000 div fps")
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_pixels"), 4).alias("avg_pixels"),
            F.round(F.avg("n_samples"), 4).alias("avg_samples"),
            F.round(F.avg("duration_us") / F.lit(1000000.0), 4).alias("avg_duration_s"),
        )
    )
