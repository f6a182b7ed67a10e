"""Classic relational operators over the TPC-H-ish tables — the engine's
general query surface (SURVEY.md §2.6 checklist: group-by aggregation,
broadcast joins, window top-k, sessionization windowed folds, doc/tag
aggregation).

Money sums are computed in integer cents (``cast(round(x*100) as bigint)``)
so Spark and the DuckDB oracle produce bit-identical values regardless of
floating-point summation order. Ratios are single divisions of those exact
integers.

Scale notes: the fact-side tables only ever shuffle on their aggregation
keys; dimension joins are explicitly broadcast; top-k uses window row_number
(AQE handles skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("bigint")


# -------------------------------------------------- pricing summary (Q1-ish)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-by aggregation with map-side partial aggregation;
    reference analog of doc-count style aggregation (rag/nlp/search.py:428)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(disc_price).alias("sum_disc_cents"),
            F.sum(charge).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty_r4", F.round(F.col("sum_qty") / F.col("count_order"), 4)
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       count(*) AS count_order,
       round(CAST(sum(l_quantity) AS BIGINT) / count(*), 4) AS avg_qty_r4
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- shipping priority (Q3-ish)
def top_revenue_orders(spark: SparkSession, sf_dir: str, topn: int = 10) -> DataFrame:
    """3-way join with an explicitly broadcast dimension side + deterministic
    top-k (integer revenue, orderkey tie-break)."""
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue_cents"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(topn)
    )


TOP_REVENUE_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


# -------------------------------------------------------- per-customer top-k
def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 2) -> DataFrame:
    """Window top-k (the reference's rerank/top-k pagination analog,
    rag/nlp/search.py:355-381)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "o_custkey",
            F.col("rank").cast("int").alias("rank"),
            "o_orderkey",
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
        )
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders)
SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
FROM r WHERE rank <= 2
"""


# ----------------------------------------------------------- sessionization
SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event sessionization as a windowed fold: lag → gap flag → running sum
    = session id; then per-user session stats. Exact integer time math."""
    ev = load(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is lossless
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        (us - F.lag(us, 1).over(w) > SESSION_GAP_US)
        | F.lag(us, 1).over(w).isNull()
    ).cast("int")
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("int").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


SESSIONIZE_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
s AS (
  SELECT user_id, event_id, value,
         CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM t)
SELECT user_id,
       CAST(sum(new_sess) AS INTEGER) AS n_sessions,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM s GROUP BY user_id
"""


# ----------------------------------------------------- doc / tag aggregation
def doc_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source × lang doc aggregation (reference doc_aggs,
    rag/nlp/search.py:428-435)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


DOC_AGGS_SQL = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source, lang
"""


def tag_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type aggregation (reference tag feature aggregation,
    rag/nlp/search.py:469-473)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


TAG_AGGS_SQL = """
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type
"""
