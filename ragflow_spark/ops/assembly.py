"""Doc-assembly operators completing the SURVEY.md §2 inventory:

- ``one_chunk``: whole-document chunker — the reference's "one" template
  (rag/app/one.py:28-132): entire doc = 1 chunk, original order, tables
  spliced in position. Pure JVM ops (sort_array ∘ collect_list).
- ``table_rows_to_docs``: row flattening "header: value; …" batched N rows
  per doc (reference tokenize_table rag/nlp/__init__.py:302-329 and the
  Excel parser row rendering deepdoc/parser/excel_parser.py:134-157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

TABLE_BATCH_ROWS = 10  # rows per doc (reference: 10, rag/nlp/__init__.py:318)


def one_chunk(spans: DataFrame) -> DataFrame:
    """Extracted spans → one chunk per document, reading order preserved.
    JVM-only: one shuffle on doc_id with map-side partial aggregation."""
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("seq", "text"))),
        lambda s: s["text"],
    )
    return (
        spans.groupBy("doc_id")
        .agg(F.array_join(ordered, "\n").alias("text"))
        .select(
            "doc_id",
            F.lit("one").alias("chunker"),
            F.lit(0).alias("chunk_seq"),
            "text",
        )
    )


def table_rows_to_docs(
    spark: SparkSession, sf_dir: str, batch: int = TABLE_BATCH_ROWS
) -> DataFrame:
    """customer table → "col: value; …" row lines, batched ``batch`` rows
    per output doc joined by newline. Deterministic: rows ordered by key
    inside each batch via sort_array(collect_list(struct))."""
    cust = load(spark, sf_dir, "customer")
    # money rendered as integer cents — engine-independent string form
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    row_txt = F.concat_ws(
        "; ",
        F.concat(F.lit("c_name: "), F.col("c_name")),
        F.concat(F.lit("c_mktsegment: "), F.col("c_mktsegment")),
        F.concat(F.lit("c_acctbal_cents: "), cents.cast("string")),
    )
    batched = cust.select(
        F.floor(F.col("c_custkey") / batch).cast("long").alias("doc_seq"),
        F.col("c_custkey").alias("key"),
        row_txt.alias("row_txt"),
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("key", "row_txt"))),
        lambda s: s["row_txt"],
    )
    return (
        batched.groupBy("doc_seq")
        .agg(
            F.array_join(ordered, "\n").alias("text"),
            F.count("*").alias("n_rows"),
        )
        .select("doc_seq", "text", "n_rows")
    )


TABLE_ROWS_TO_DOCS_SQL = f"""
WITH rows_t AS (
  SELECT CAST(floor(c_custkey / {TABLE_BATCH_ROWS}) AS BIGINT) AS doc_seq,
         c_custkey AS key,
         'c_name: ' || c_name || '; c_mktsegment: ' || c_mktsegment ||
         '; c_acctbal_cents: ' ||
         CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS row_txt
  FROM customer)
SELECT doc_seq,
       string_agg(row_txt, chr(10) ORDER BY key) AS text,
       count(*) AS n_rows
FROM rows_t GROUP BY doc_seq
"""
