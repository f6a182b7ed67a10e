"""Doc-assembly operators completing the SURVEY.md §2 inventory:

- ``one_chunk``: whole-document chunker — the reference's "one" template
  (rag/app/one.py:28-132): entire doc = 1 chunk, original order, tables
  spliced in position. Pure JVM ops (sort_array ∘ collect_list).
- ``table_rows_to_docs``: row flattening "header: value; …" batched N rows
  per doc (reference tokenize_table rag/nlp/__init__.py:302-329 and the
  Excel parser row rendering deepdoc/parser/excel_parser.py:134-157).
- ``table_html_docs``: the Excel parser's second route (``html4excel``,
  deepdoc/parser/excel_parser.py:92-132): one ``<th>`` header row + data
  rows rendered as ``<table><caption>{sheet}</caption>…</table>\\n`` HTML
  chunks of ``chunk_rows`` rows each.
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


TABLE_HTML_CHUNK_ROWS = 256  # rows per HTML chunk (excel_parser.py:92 default)

_HTML_HEADER = "<tr><th>c_name</th><th>c_mktsegment</th><th>c_acctbal_cents</th></tr>"


def table_html_docs(
    spark: SparkSession, sf_dir: str, chunk_rows: int = TABLE_HTML_CHUNK_ROWS
) -> DataFrame:
    """The Excel parser's second route (``html4excel``,
    deepdoc/parser/excel_parser.py:92-132): the sheet's first row becomes
    one ``<th>`` header row repeated atop every chunk, data rows render as
    ``<td>`` cells, and each ``chunk_rows`` rows wrap as
    ``<table><caption>{sheet}</caption>…</table>\\n``. Here the "sheet" is
    the customer table; money renders as integer cents for engine-stable
    strings. Positional chunking rides the dense 0-based key, so the chunk
    id is a pure projection and the groupBy is the only wide stage — at
    100 TB that's one shuffle with map-side partial aggregation, no
    driver-side sheet iteration."""
    cust = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    row_html = F.concat(
        F.lit("<tr><td>"), F.col("c_name"),
        F.lit("</td><td>"), F.col("c_mktsegment"),
        F.lit("</td><td>"), cents.cast("string"),
        F.lit("</td></tr>"),
    )
    batched = cust.select(
        F.floor(F.col("c_custkey") / chunk_rows).cast("long").alias("doc_seq"),
        F.col("c_custkey").alias("key"),
        row_html.alias("row_html"),
    )
    rows_joined = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("key", "row_html"))),
            lambda s: s["row_html"],
        ),
        "",
    )
    return (
        batched.groupBy("doc_seq")
        .agg(rows_joined.alias("rows_html"), F.count("*").alias("n_rows"))
        .select(
            "doc_seq",
            F.concat(
                F.lit("<table><caption>customer</caption>" + _HTML_HEADER),
                F.col("rows_html"),
                F.lit("</table>\n"),
            ).alias("text"),
            "n_rows",
        )
    )


TABLE_HTML_DOCS_SQL = f"""
WITH rows_t AS (
  SELECT CAST(floor(c_custkey / {TABLE_HTML_CHUNK_ROWS}) AS BIGINT) AS doc_seq,
         c_custkey AS key,
         '<tr><td>' || c_name || '</td><td>' || c_mktsegment || '</td><td>' ||
         CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) ||
         '</td></tr>' AS row_html
  FROM customer)
SELECT doc_seq,
       '<table><caption>customer</caption>{_HTML_HEADER}' ||
       string_agg(row_html, '' ORDER BY key) || '</table>' || chr(10) AS text,
       count(*) AS n_rows
FROM rows_t GROUP BY doc_seq
"""


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
