"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The batch twin is ops/relational.py sessionize (window fold, 30-min gap);
here the same semantics run incrementally: per user, events accumulate
into an open session held in state; a gap > SESSION_GAP_US inside a batch
closes a session immediately, and the open tail closes when the event-time
watermark passes its timeout (last event + gap). Emitted rows are
append-only closed sessions — exactly the rows the batch fold would
produce, asserted by tests.

This is the engine's ``applyInPandasWithState`` surface: state is a typed
tuple, timeouts are event-time (watermark-driven), and all per-batch work
is Arrow-batched pandas.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ragflow_spark.ops.relational import SESSION_GAP_US

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SESSION_OUT_SCHEMA = (
    "user_id long, session_seq int, n_events long, start_us long, end_us long"
)
# open-session state: sequence number, event count, first/last event time
_STATE_SCHEMA = "session_seq int, n_events long, start_us long, last_us long"


def _fold_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    gap = SESSION_GAP_US

    if state.hasTimedOut:
        # watermark passed the open session's end + gap: close and emit it
        seq, n, start_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_seq": [seq],
                "n_events": [n],
                "start_us": [start_us],
                "end_us": [last_us],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    # unit-robust µs epoch (pandas may carry ns or µs datetime64)
    us = rows["ts"].values.astype("datetime64[us]").astype("int64")
    us.sort()

    if state.exists:
        seq, n, start_us, last_us = state.get
    else:
        seq, n, start_us, last_us = 0, 0, 0, 0

    closed = []
    for t in us:
        t = int(t)
        if n > 0 and t - last_us > gap:
            closed.append((seq, n, start_us, last_us))
            seq += 1
            n = 0
        if n == 0:
            start_us = t
        n += 1
        last_us = t

    state.update((seq, n, start_us, last_us))
    # close the open tail when event time passes last event + gap
    state.setTimeoutTimestamp((last_us + gap) // 1000 + 1)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_seq": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "start_us": [c[2] for c in closed],
                "end_us": [c[3] for c in closed],
            }
        )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """events file stream → watermark → stateful per-user session fold →
    append sink of CLOSED sessions. Returns the StreamingQuery."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(input_dir)
        .withWatermark("ts", "30 minutes")
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _fold_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = sessions.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
):
    """Event-time tumbling-window aggregation with a watermark for late
    data: append mode emits a window only once the watermark passes its
    end, so the parquet sink holds exactly the finalized windows. Money
    sums in integer cents (bit-identical to the batch twin)."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        ev.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
