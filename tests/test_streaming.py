"""Structured Streaming ingest: stream/batch parity + exactly-once
incremental processing across restarts."""

from __future__ import annotations

import glob

import pytest

from ragflow_spark.datagen import write_corpus
from ragflow_spark.operators.extract import extract_chunks_fused
from ragflow_spark.streaming.extract_stream import stream_extract


def _chunkset(df):
    return {
        (r.doc_id, r.chunk_seq, r.text, r.token_count) for r in df.collect()
    }


def test_stream_span_metrics(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from ragflow_spark.streaming.extract_stream import stream_span_metrics

    base = tmp_path_factory.mktemp("smetrics")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    write_corpus(spark, inp + "/w", count=25, seed=4, partitions=1)
    import os
    import shutil

    os.makedirs(inp, exist_ok=True)
    for i, f in enumerate(glob.glob(inp + "/w/*.parquet")):
        shutil.move(f, f"{inp}/f{i}.parquet")
    shutil.rmtree(inp + "/w")

    q = stream_span_metrics(spark, inp, ckpt, out)
    q.awaitTermination(240)
    m = spark.read.parquet(out)
    # per-kind span counts equal the batch ground truth
    batch = (
        spark.read.parquet(*glob.glob(inp + "/f*.parquet"))
        .select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .count()
    )
    got = {r["kind"]: r["span_count"] for r in m.collect()}
    want = {r["kind"]: r["count"] for r in batch.collect()}
    assert got == want


def test_stream_batch_parity_and_incremental(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    # wave 1: 40 docs land
    write_corpus(spark, inp + "/w1", count=40, seed=3, partitions=2)
    # file source watches a flat dir: move the parquet files up
    import os
    import shutil

    os.makedirs(inp, exist_ok=True)
    for i, f in enumerate(glob.glob(inp + "/w1/*.parquet")):
        shutil.move(f, f"{inp}/w1_{i}.parquet")
    shutil.rmtree(inp + "/w1")

    q = stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(240)

    got1 = _chunkset(spark.read.parquet(out).drop("batch_id"))
    want1 = _chunkset(
        extract_chunks_fused(
            spark.read.parquet(*glob.glob(inp + "/w1_*.parquet"))
        )
    )
    assert got1 == want1

    # wave 2: 20 new docs land; restart drains ONLY the new files
    write_corpus(spark, inp + "/w2", count=20, seed=9, partitions=1)
    for i, f in enumerate(glob.glob(inp + "/w2/*.parquet")):
        shutil.move(f, f"{inp}/w2_{i}.parquet")
    shutil.rmtree(inp + "/w2")

    q2 = stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(240)

    got2 = _chunkset(spark.read.parquet(out).drop("batch_id"))
    want2 = want1 | _chunkset(
        extract_chunks_fused(
            spark.read.parquet(*glob.glob(inp + "/w2_*.parquet"))
        )
    )
    # exactly-once: wave-1 chunks appear exactly once (set equality + count)
    assert got2 == want2
    total_rows = spark.read.parquet(out).count()
    assert total_rows == len(want2)

    # replay: lose the last offset commit (crash after sink write, before
    # checkpoint commit) — the replayed batch must overwrite its own
    # batch_id partition, not append duplicates
    commits = sorted(
        glob.glob(ckpt + "/commits/[0-9]*"),
        key=lambda p: int(os.path.basename(p)),
    )
    os.remove(commits[-1])
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):  # local checksum FS shadow file
        os.remove(crc)
    import time

    for q_old in (q, q2):
        q_old.stop()
    for _ in range(100):
        if not spark.streams.active:
            break
        time.sleep(0.2)
    q3 = stream_extract(spark, inp, out, ckpt)
    q3.awaitTermination(240)
    assert _chunkset(spark.read.parquet(out).drop("batch_id")) == want2
    assert spark.read.parquet(out).count() == len(want2)
