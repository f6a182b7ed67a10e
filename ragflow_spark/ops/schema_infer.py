"""Schema inference: majority-vote column typing.

Reference analog: ``column_data_type`` infers int/float/bool/datetime/text
per Excel column by majority vote (rag/app/table.py:263-299; cell block
types deepdoc/vision/table_structure_recognizer.py:104-133). Here the same
operator runs over a stringified long table (column, value) — one narrow
shuffle on the column key, regex classification JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

# classification regexes — valid in both Java regex and RE2
RE_INT = "^-?[0-9]+$"
RE_FLOAT = "^-?[0-9]+\\.[0-9]+$"
RE_BOOL = "^(true|false)$"
RE_DATE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T].*)?$"

_I64_MAX = "9223372036854775807"  # int cells beyond this promote the column


def _classify(col):
    return (
        F.when(col.rlike(RE_INT), F.lit("int"))
        .when(col.rlike(RE_FLOAT), F.lit("float"))
        .when(col.rlike(RE_BOOL), F.lit("bool"))
        .when(col.rlike(RE_DATE), F.lit("datetime"))
        .otherwise(F.lit("text"))
    )


def _int_overflow(col):
    """Non-negative int literal > 2**63-1 (the reference's promotion
    trigger, table.py:271-275). Pure string math — ANSI mode would throw
    on an overflowing cast, and equal-length digit strings compare
    lexicographically == numerically (leading zeros only widen length,
    erring the same direction as the reference's float_flag)."""
    digits = F.regexp_replace(col, "^0+", "")
    return (
        col.rlike(RE_INT)
        & ~col.startswith("-")
        & (
            (F.length(digits) > 19)
            | ((F.length(digits) == 19) & (digits > F.lit(_I64_MAX)))
        )
    )


def infer_column_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringify the events table, unpivot to (column, value) with one
    ``stack`` projection (ONE table scan — a per-column unionByName would
    rescan the table once per column), classify each cell, majority-vote
    per column (ties broken by type name order). A single int cell beyond
    2**63-1 promotes the whole column to float (table.py:271-275) — the
    synthetic ``big_id`` column (event_id digits + INT64_MAX appended)
    plants that case so the promotion path is live, not latent. ``n``
    stays the majority-vote winner's count either way."""
    ev = load(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    stack_args = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    stack_args += f", 'big_id', cast(event_id as string) || '{_I64_MAX}'"
    long_df = ev.select(
        F.expr(
            f"stack({len(cols) + 1}, {stack_args}) as (col_name, str_val)"
        )
    )
    votes = (
        long_df.where(F.col("str_val").isNotNull())
        .select(
            "col_name",
            _classify(F.col("str_val")).alias("cell_type"),
            _int_overflow(F.col("str_val")).cast("int").alias("ovf"),
        )
        .groupBy("col_name", "cell_type")
        .agg(F.count("*").alias("n"), F.max("ovf").alias("ovf"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("col_name").orderBy(F.desc("n"), F.asc("cell_type"))
    any_ovf = F.max("ovf").over(Window.partitionBy("col_name"))
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .withColumn("any_ovf", any_ovf)
        .where(F.col("rk") == 1)
        .select(
            "col_name",
            F.when(F.col("any_ovf") == 1, F.lit("float"))
            .otherwise(F.col("cell_type"))
            .alias("inferred_type"),
            "n",
        )
    )


INFER_COLUMN_TYPES_SQL = f"""
WITH long_t AS (
  SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS str_val FROM events
  UNION ALL SELECT 'ts', strftime(ts, '%Y-%m-%d %H:%M:%S.%f') FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
  UNION ALL SELECT 'event_type', event_type FROM events
  UNION ALL SELECT 'value', CAST(value AS VARCHAR) FROM events
  UNION ALL SELECT 'props', props FROM events
  UNION ALL SELECT 'big_id', CAST(event_id AS VARCHAR) || '{_I64_MAX}' FROM events),
votes AS (
  SELECT col_name,
         CASE WHEN regexp_matches(str_val, '{RE_INT}') THEN 'int'
              WHEN regexp_matches(str_val, '{RE_FLOAT}') THEN 'float'
              WHEN regexp_matches(str_val, '{RE_BOOL}') THEN 'bool'
              WHEN regexp_matches(str_val, '{RE_DATE}') THEN 'datetime'
              ELSE 'text' END AS cell_type,
         CASE WHEN regexp_matches(str_val, '{RE_INT}')
                   AND str_val NOT LIKE '-%'
                   AND (length(regexp_replace(str_val, '^0+', '')) > 19
                        OR (length(regexp_replace(str_val, '^0+', '')) = 19
                            AND regexp_replace(str_val, '^0+', '')
                                > '{_I64_MAX}'))
              THEN 1 ELSE 0 END AS ovf
  FROM long_t WHERE str_val IS NOT NULL),
counts AS (
  SELECT col_name, cell_type, count(*) AS n, max(ovf) AS ovf
  FROM votes GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY col_name
                               ORDER BY n DESC, cell_type ASC) AS rk,
         max(ovf) OVER (PARTITION BY col_name) AS any_ovf
  FROM counts)
SELECT col_name,
       CASE WHEN any_ovf = 1 THEN 'float' ELSE cell_type END AS inferred_type,
       n
FROM ranked WHERE rk = 1
"""
