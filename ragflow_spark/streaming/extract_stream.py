"""Structured Streaming ingest for the extraction pipeline.

The reference has no stream semantics (Redis queue of batch tasks,
rag/svr/task_executor.py:189-227); this module is the Spark-native
equivalent of its incremental ingestion: new document files landing in a
directory are discovered by the file source, extracted exactly once
(checkpointed source offsets), and written to the chunk sink.

Exactly-once is end-to-end, not just source-side: ``foreachBatch`` is
at-least-once (a crash after the sink write but before the offset commit
replays the batch), so the sink is made idempotent by partitioning on
``batch_id`` with dynamic partition overwrite — a replayed batch replaces
its own partition instead of appending duplicates.

``foreachBatch`` reuses the batch operators verbatim — stream/batch parity
is by construction, asserted in tests. Trigger.AvailableNow drains the
backlog and stops (the batch-job-over-a-stream pattern); omit it for a
long-running incremental daemon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ragflow_spark.operators.extract import extract_chunks_fused
from ragflow_spark.schemas import DOCS_SCHEMA

STREAM_DOCS_SCHEMA = T.StructType(
    list(DOCS_SCHEMA.fields) + [T.StructField("n_spans", T.IntegerType(), True)]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    chunker: str = "naive",
    chunk_token_num: int = 512,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction: parquet file stream → extract+chunk →
    parquet append sink. Returns the StreamingQuery."""
    reader = (
        spark.readStream.schema(STREAM_DOCS_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.load(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        chunks = extract_chunks_fused(
            batch_df, chunker=chunker, chunk_token_num=chunk_token_num
        ).withColumn("batch_id", F.lit(batch_id))
        # idempotent per batch: a replayed batch_id overwrites its own
        # partition (dynamic mode leaves other batches' partitions intact)
        (
            chunks.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_span_metrics(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """Streaming aggregation example: per-trigger span/kind counts appended
    to a metrics sink (the streaming analog of the lineage rows)."""
    docs = (
        spark.readStream.schema(STREAM_DOCS_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    exploded = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", F.col("s.kind").alias("kind"))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("kind")
            .agg(
                F.count("*").alias("span_count"),
                F.countDistinct("doc_id").alias("doc_count"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = exploded.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
