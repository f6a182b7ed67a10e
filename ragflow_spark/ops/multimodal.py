"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode / feature-extract / resize / frame-sample
operators over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a clearly
marked deterministic stub (`_fake_decode`) — everything Spark-side (schema,
partitioning, UDF signatures, Arrow batch shapes, metadata propagation) is
real and tested. Swap ``_fake_decode`` for PIL/ffmpeg on a real cluster.

The stub is pure arithmetic on an md5-derived 60-bit seed carried in the
payload's first 8 bytes, so every feature is independently reproducible in
ANSI SQL — the driver's DuckDB oracles recompute the same means/sums from
the same closed-form pixel stream (no hash library beyond md5, which both
engines share bit-for-bit).

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

# pixel-stream multiplier (Knuth's 2^32 golden-ratio constant); 60-bit seed +
# 65k * K stays far inside int64 in both numpy and DuckDB BIGINT arithmetic
_PX_K = 2654435761
_FRAME_K = 97


def _seed60(s: str) -> int:
    """60-bit seed from the md5 hex digest — chars [17:32), identical to
    DuckDB's CAST('0x' || substr(md5(s), 18, 15) AS BIGINT)."""
    return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic opaque media table derived from the documents table:
    payload = repeated 8-byte md5-seed stream (stands in for real encoded
    bytes; first 8 bytes carry the decode seed), metadata typed per kind."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                kind = ("image", "audio", "video")[int(doc_id) % 3]
                seed = _seed60(f"media-{doc_id}").to_bytes(8, "big")
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


def _fake_decode(
    payload: bytes, width: int, height: int, frame_idx: int = 0
) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload's embedded
    seed — ``px[i] = (h0 + frame_idx·97 + (i+1)·K) mod 256`` — chosen to be
    exactly reproducible in SQL. A real deployment replaces this with
    PIL.Image.open / soundfile / ffmpeg (unavailable in this container)."""
    h0 = int.from_bytes(payload[:8], "big")
    hh, ww = max(height, 1), max(width, 1)
    i = np.arange(1, hh * ww + 1, dtype=np.int64)
    px = ((h0 + frame_idx * _FRAME_K + i * _PX_K) % 256).astype(np.uint8)
    return px.reshape(hh, ww)


def image_features(media: DataFrame) -> DataFrame:
    """Decode (stub) → per-image stats. Arrow-batched; only image rows are
    shipped into Python (filter pushed below the UDF). The UDF emits exact
    integer sums; mean/variance are single JVM divisions of those integers,
    so the oracle reproduces them bit-for-bit."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _fake_decode(bytes(r.payload), r.width, r.height)
                xi = px.astype(np.int64)
                out.append(
                    {
                        "media_id": r.media_id,
                        "n_px": int(px.size),
                        "sum_px": int(xi.sum()),
                        "sum_sq": int((xi * xi).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_px", "sum_px", "sum_sq"]
            )

    sums = (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(
            run, schema="media_id long, n_px int, sum_px long, sum_sq long"
        )
    )
    mean = F.col("sum_px") / F.col("n_px")
    return sums.select(
        "media_id",
        "n_px",
        "sum_px",
        F.round(mean, 6).alias("mean_r6"),
        F.round(F.col("sum_sq") / F.col("n_px") - mean * mean, 6).alias("var_r6"),
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
    decode of each frame is the same stub offset by frame_idx). Explode
    happens JVM-side; only sampled frames cross into Python."""
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
                    bytes(r.payload), r.width, r.height, int(r.frame_idx)
                )
                out.append(
                    {
                        "media_id": r.media_id,
                        "frame_idx": int(r.frame_idx),
                        "sum_px": int(px.astype(np.int64).sum()),
                        "n_px": int(px.size),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "sum_px", "n_px"]
            )

    sums = vids.mapInPandas(
        run, schema="media_id long, frame_idx int, sum_px long, n_px int"
    )
    return sums.select(
        "media_id",
        "frame_idx",
        "sum_px",
        F.round(F.col("sum_px") / F.col("n_px"), 6).alias("mean_r6"),
    )


def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media table (pure JVM)."""
    media = synthesize_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum("n_frames").alias("total_frames"),
    )


# ------------------------------------------------------------ DuckDB oracles
# The media table is a pure function of the documents table; every stat the
# stub decode produces is a closed-form aggregate over generate_series.

_MEDIA_BASE = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
         CAST('0x' || substr(md5('media-' || CAST(doc_id AS VARCHAR)), 18, 15)
              AS BIGINT) AS h0,
         least(8 * (32 + n_chars % 64), 256 + doc_id % 512) AS payload_len,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 32 + (doc_id * 7) % 224 END AS width,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 32 + (doc_id * 13) % 224 END AS height,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 16 + doc_id % 48 END AS n_frames
  FROM documents)
"""

MEDIA_INVENTORY_SQL = _MEDIA_BASE + """
SELECT kind, count(*) AS n,
       CAST(sum(payload_len) AS BIGINT) AS total_bytes,
       CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM m GROUP BY kind
"""

IMAGE_FEATURES_SQL = _MEDIA_BASE + f"""
, img AS (
  SELECT media_id, h0,
         greatest(width, 1) * greatest(height, 1) AS n_px
  FROM m WHERE kind = 'image'),
idx AS (
  SELECT media_id, n_px, h0, unnest(generate_series(1, n_px)) AS i FROM img),
px AS (
  SELECT media_id, n_px,
         sum((h0 + i * {_PX_K}) % 256) AS sum_px,
         sum(((h0 + i * {_PX_K}) % 256) * ((h0 + i * {_PX_K}) % 256)) AS sum_sq
  FROM idx
  GROUP BY media_id, n_px)
SELECT media_id, CAST(n_px AS INTEGER) AS n_px,
       CAST(sum_px AS BIGINT) AS sum_px,
       round(sum_px / n_px, 6) AS mean_r6,
       round(sum_sq / n_px - (sum_px / n_px) * (sum_px / n_px), 6) AS var_r6
FROM px
"""

FRAME_SAMPLE_SQL = _MEDIA_BASE + f"""
, vid AS (
  SELECT media_id, h0, n_frames,
         greatest(width, 1) * greatest(height, 1) AS n_px
  FROM m WHERE kind = 'video'),
frames AS (
  SELECT media_id, h0, n_px,
         CAST(unnest(generate_series(0, n_frames - 1, 8)) AS INTEGER) AS frame_idx
  FROM vid),
idx AS (
  SELECT media_id, frame_idx, n_px, h0,
         unnest(generate_series(1, n_px)) AS i
  FROM frames),
px AS (
  SELECT media_id, frame_idx, n_px,
         sum((h0 + frame_idx * {_FRAME_K} + i * {_PX_K}) % 256) AS sum_px
  FROM idx
  GROUP BY media_id, frame_idx, n_px)
SELECT media_id, frame_idx,
       CAST(sum_px AS BIGINT) AS sum_px,
       round(sum_px / n_px, 6) AS mean_r6
FROM px
"""
