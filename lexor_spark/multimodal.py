"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` payload
columns with typed metadata structs, and runs decode / feature-extract /
resize / frame-sample as **Arrow-batched pandas UDFs over mapInPandas** —
never per-row Python.  This module implements that plumbing for real
(schemas, batch iteration, partitioning, deterministic outputs, error
rows); the *codec* itself is stubbed: the sandbox has no image/audio
libraries, so ``decode_payload`` is a clearly-marked deterministic fake
(documented below) and the single place a real codec (Pillow/ffmpeg)
would plug in.

Design rules carried from the extraction job (`lexor_spark/job.py`):

* batch-level loops only — one pandas DataFrame in/out per Arrow batch;
* hostile payloads become ``ok=false`` rows, never task failures;
* every derived value is a pure function of the payload bytes, so any
  two runs — and any two cluster sizes — agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA", "media_df", "decode_payload", "image_features",
    "resize_images", "sample_frames",
]

# The canonical media-table shape: opaque payload + typed metadata.
MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int,height:int,channels:int,"
                "sample_rate:int,n_frames:int>")


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from ``documents``
    (no external data allowed in this sandbox).

    Payload bytes = utf-8 of the doc text (truncated) — stand-in for an
    encoded image/audio blob; metadata is a pure function of ``doc_id``.
    Generation is all built-in expressions (JVM-side, no UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
            .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
            .otherwise("video"))
    width = (F.pmod("doc_id", F.lit(64)) + 16).cast("int")
    height = (F.pmod("doc_id", F.lit(48)) + 16).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.substring("text", 1, 4096), "UTF-8").alias("payload"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod("doc_id", F.lit(240)) + 8).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, width: int, height: int,
                   channels: int = 3) -> np.ndarray:
    """STUB CODEC — deterministic fake decode.

    A real deployment replaces this body with the actual decoder
    (``PIL.Image.open``/``soundfile``/``pyav``); everything around it —
    batch plumbing, schema, error handling — is production-shaped and
    does not change.  The fake: SHA-256-seeded byte stream reshaped to
    (height, width, channels) uint8, so features are stable, payload-
    sensitive, and platform-independent."""
    if not payload:
        raise ValueError("empty payload")
    need = width * height * channels
    seed = hashlib.sha256(payload).digest()
    reps = -(-need // len(seed))  # ceil
    buf = (seed * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, channels)


# ---------------------------------------------------------------------------
# feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = ("media_id long, kind string, mean_px double, std_px double, "
                   "mean_r double, mean_g double, mean_b double, "
                   "phash string, ok boolean, err string")


def _features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("media_id", "kind", "mean_px", "std_px",
                               "mean_r", "mean_g", "mean_b", "phash",
                               "ok", "err")}
        for mid, kind, payload, meta in zip(pdf["media_id"], pdf["kind"],
                                            pdf["payload"], pdf["meta"]):
            out["media_id"].append(mid)
            out["kind"].append(kind)
            try:
                img = decode_payload(payload, int(meta["width"]),
                                     int(meta["height"]),
                                     int(meta["channels"]))
                flat = img.astype(np.float64)
                mr, mg, mb = flat.mean(axis=(0, 1)).tolist()
                # toy perceptual hash: sign pattern of 8x8 block means
                h, w = img.shape[:2]
                g = flat.mean(axis=2)
                blocks = np.array([
                    g[(i * h) // 8:((i + 1) * h) // 8,
                      (j * w) // 8:((j + 1) * w) // 8].mean()
                    for i in range(8) for j in range(8)])
                bits = (blocks > blocks.mean()).astype(np.uint8)
                ph = "".join("%02x" % int("".join(map(str, bits[k:k + 8])), 2)
                             for k in range(0, 64, 8))
                out["mean_px"].append(float(flat.mean()))
                out["std_px"].append(float(flat.std()))
                out["mean_r"].append(mr)
                out["mean_g"].append(mg)
                out["mean_b"].append(mb)
                out["phash"].append(ph)
                out["ok"].append(True)
                out["err"].append(None)
            except Exception as exc:  # error rows, never task failure
                for k in ("mean_px", "std_px", "mean_r", "mean_g", "mean_b"):
                    out[k].append(None)
                out["phash"].append(None)
                out["ok"].append(False)
                out["err"].append(f"{type(exc).__name__}: {exc}"[:200])
        yield pd.DataFrame(out)


def image_features(media: DataFrame) -> DataFrame:
    """Per-media decode + feature extraction, Arrow-batched."""
    return (media.select("media_id", "kind", "payload", "meta")
            .mapInPandas(_features_batches, FEATURES_SCHEMA))


# ---------------------------------------------------------------------------
# resize (mapInPandas, payload → payload)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = ("media_id long, payload binary, "
                  "meta struct<width:int,height:int,channels:int,"
                  "sample_rate:int,n_frames:int>, ok boolean")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbour resize → re-emit payload + updated meta.
    Payload out = raw bytes of the resized array (a real codec would
    re-encode; the byte layout is the stub's contract)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas, oks = [], [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                ids.append(mid)
                try:
                    img = decode_payload(payload, int(meta["width"]),
                                         int(meta["height"]),
                                         int(meta["channels"]))
                    yi = (np.arange(height) * img.shape[0]) // height
                    xi = (np.arange(width) * img.shape[1]) // width
                    resized = img[yi][:, xi]
                    payloads.append(resized.tobytes())
                    metas.append({"width": width, "height": height,
                                  "channels": int(meta["channels"]),
                                  "sample_rate": int(meta["sample_rate"]),
                                  "n_frames": int(meta["n_frames"])})
                    oks.append(True)
                except Exception:
                    payloads.append(None)
                    metas.append(meta)
                    oks.append(False)
            yield pd.DataFrame({"media_id": ids, "payload": payloads,
                                "meta": metas, "ok": oks})

    return (media.select("media_id", "payload", "meta")
            .mapInPandas(_batches, RESIZED_SCHEMA))


# ---------------------------------------------------------------------------
# frame sampling (mapInPandas, one row in → many rows out)
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = "media_id long, frame_no int, frame_hash string"


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame of each video; emits one row per
    sampled frame (row-expanding map — the Arrow batch shape every video
    pipeline needs).  Frame bytes are the stub codec applied per frame
    index; only a hash is emitted (frames themselves would be written to
    a side table in production)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, hashes = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                try:
                    n = int(meta["n_frames"])
                    for f in range(0, n, every_n):
                        fh = hashlib.sha256(
                            bytes(payload) + f.to_bytes(4, "big")).hexdigest()[:16]
                        ids.append(mid)
                        nos.append(f)
                        hashes.append(fh)
                except Exception:
                    continue
            yield pd.DataFrame({"media_id": ids, "frame_no": nos,
                                "frame_hash": hashes})

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(_batches, FRAMES_SCHEMA))
