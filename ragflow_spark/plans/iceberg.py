"""Iceberg snapshot sink — the north rule's named checkpoint target.

This container ships no Iceberg runtime jar, so the engine's default
checkpoint protocol is the parquet snapshot in plans/checkpoint.py (the
1:1 semantic mapping is documented there). This module carries the actual
Iceberg code path, gated on runtime availability: on a cluster with
``org.apache.iceberg.spark.SparkCatalog`` configured, ``write_snapshot``
commits through ``writeTo(...).createOrReplace()/append()`` and returns the
real snapshot id from the table's history; everywhere else callers fall
back to CheckpointedRun.

Gating (not stubbing): ``iceberg_available`` probes the JVM for the
catalog class, so the branch selection is a runtime fact, never an
assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(_ICEBERG_CATALOG_CLASS)
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound surfaces as Py4J error
        return False


def write_snapshot(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    mode: str = "append",
) -> int:
    """Commit ``df`` to an Iceberg table and return the new snapshot id.

    ``mode``: 'append' | 'replace'. Raises RuntimeError when the Iceberg
    runtime is absent — callers route through plans/checkpoint.py then."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use plans.checkpoint."
            "CheckpointedRun (same snapshot semantics over parquet)"
        )
    writer = df.writeTo(table)
    if mode == "replace":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unknown mode {mode!r}")
    last = spark.sql(
        f"SELECT snapshot_id FROM {table}.history ORDER BY made_current_at DESC LIMIT 1"
    ).first()
    return int(last["snapshot_id"])


def committed_snapshots(spark: SparkSession, table: str) -> list[int]:
    """Snapshot ids of a table, oldest first (resume = skip work whose
    snapshot already exists — the Iceberg twin of is_committed)."""
    rows = spark.sql(
        f"SELECT snapshot_id FROM {table}.history ORDER BY made_current_at"
    ).collect()
    return [int(r["snapshot_id"]) for r in rows]


def read_table(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    incremental_from: int | None = None,
    incremental_to: int | None = None,
) -> DataFrame:
    """Read an Iceberg documents table — the north rule's named input
    (``Iceberg table of interleaved text + media documents``).

    - plain: current snapshot, metadata-pruned scan (Iceberg supplies
      split planning + column stats; pair with a ``select`` so only
      (doc_id, spans[, n_spans]) columns reach the scan).
    - ``snapshot_id``: time-travel read of one committed snapshot —
      reproducible reruns against the exact input a prior run saw.
    - ``incremental_from``/``incremental_to``: append-scan of only the
      rows committed after ``from`` (exclusive) up to ``to`` (inclusive,
      default current) — the batch twin of the streaming ingest path,
      and how a resumed run picks up exactly the new documents.

    Raises RuntimeError when the Iceberg runtime is absent — callers
    fall back to ``spark.read.parquet`` snapshot dirs
    (plans/checkpoint.py keeps the same snapshot semantics)."""
    if snapshot_id is not None and incremental_from is not None:
        raise ValueError("snapshot_id and incremental_from are exclusive")
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; read the parquet "
            "snapshot dirs via plans.checkpoint.CheckpointedRun instead"
        )
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if incremental_from is not None:
        reader = reader.option("start-snapshot-id", str(incremental_from))
        if incremental_to is not None:
            reader = reader.option("end-snapshot-id", str(incremental_to))
    return reader.load(table)
