"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode / feature-extract / resize / frame-sample
operators over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a clearly
marked deterministic stub (`_fake_decode`) — everything Spark-side (schema,
partitioning, UDF signatures, Arrow batch shapes, metadata propagation) is
real and tested. Swap ``_fake_decode`` for PIL/ffmpeg on a real cluster.

At 100 TB the binary column dominates I/O: operators project only the columns
they use (Catalyst prunes the parquet scan) and never collect blobs to the
driver; per-batch work is bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "n_frames int, sample_rate int"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic opaque media table derived from the documents table:
    payload = repeated blake2b stream seeded by doc_id (stands in for real
    encoded bytes), metadata typed per kind."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                kind = ("image", "audio", "video")[int(doc_id) % 3]
                seed = hashlib.blake2b(
                    f"media-{doc_id}".encode(), digest_size=8
                ).digest()
                payload = (seed * (32 + int(n_chars) % 64))[: 256 + int(doc_id) % 512]
                w = 32 + (int(doc_id) * 7) % 224
                h = 32 + (int(doc_id) * 13) % 224
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "kind": kind,
                        "payload": payload,
                        "width": w if kind != "audio" else 0,
                        "height": h if kind != "audio" else 0,
                        "n_frames": 1 if kind == "image" else 16 + int(doc_id) % 48,
                        "sample_rate": 16000 if kind == "audio" else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "n_frames", "sample_rate",
                ],
            )

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload hash.
    A real deployment replaces this with PIL.Image.open / soundfile / ffmpeg
    (unavailable in this container)."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=4).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(height, 1), max(width, 1)), dtype=np.uint8)


def image_features(media: DataFrame) -> DataFrame:
    """Decode (stub) → per-image stats. Arrow-batched; only image rows are
    shipped into Python (filter pushed below the UDF)."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _fake_decode(bytes(r.payload), r.width, r.height)
                out.append(
                    {
                        "media_id": r.media_id,
                        "mean_px": float(px.mean()),
                        "std_px": float(px.std()),
                        "n_px": int(px.size),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mean_px", "std_px", "n_px"]
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, schema="media_id long, mean_px double, std_px double, n_px int")
    )


def resize_images(media: DataFrame, target: int = 64) -> DataFrame:
    """Decode (stub) → nearest-neighbor resize → re-emit metadata. Shows the
    binary-in/binary-out contract without a codec."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _fake_decode(bytes(r.payload), r.width, r.height)
                yi = np.linspace(0, px.shape[0] - 1, target).astype(int)
                xi = np.linspace(0, px.shape[1] - 1, target).astype(int)
                small = px[np.ix_(yi, xi)]
                out.append(
                    {
                        "media_id": r.media_id,
                        "payload": small.tobytes(),
                        "width": target,
                        "height": target,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "width", "height"]
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, schema="media_id long, payload binary, width int, height int")
    )


def sample_frames(media: DataFrame, every: int = 8) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index (the
    decode of each frame is the same stub). Explode happens JVM-side;
    only sampled frames cross into Python."""
    vids = (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            "width",
            "height",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _fake_decode(
                    bytes(r.payload) + int(r.frame_idx).to_bytes(4, "big"),
                    r.width,
                    r.height,
                )
                out.append(
                    {
                        "media_id": r.media_id,
                        "frame_idx": int(r.frame_idx),
                        "mean_px": float(px.mean()),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "mean_px"])

    return vids.mapInPandas(
        run, schema="media_id long, frame_idx int, mean_px double"
    )


def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media table (pure JVM)."""
    media = synthesize_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum("n_frames").alias("total_frames"),
    )
