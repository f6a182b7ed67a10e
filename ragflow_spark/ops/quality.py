"""Retrieval-quality metrics: ndcg@10, map@5, mrr@10.

Reference parity: rag/benchmark.py:242-276 scores retrieval runs with
exactly these three cutoffs (via ranx) against dataset qrels. The engine
analog is a pure-DataFrame evaluator over an explicit (rankings, qrels)
pair — qrels are injectable (the reference reads them from MS MARCO /
TriviaQA / MIRACL parquet; this sandbox derives a deterministic set from
the corpus itself).

Scale notes: every frame here is QUERY-side (|queries| × k rows), never
corpus-side — joins are on query_id/doc_id of bounded ranking lists, so
the whole evaluation is a handful of tiny shuffles regardless of corpus
size. All math is JVM expressions (F.log2, window ranks); no Python
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.similarity import KNN_K, knn_bruteforce

NDCG_K = 10
MAP_K = 5
MRR_K = 10


def _log2(col):
    return F.log2(col)


def ranking_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    ndcg_k: int = NDCG_K,
    map_k: int = MAP_K,
    mrr_k: int = MRR_K,
) -> DataFrame:
    """(metric, value_r6) rows: mean ndcg@10 / map@5 / mrr@10 over the
    queries present in ``qrels`` (ranx semantics: the qrels define the
    query universe; a query retrieving nothing relevant scores 0).

    ranked: (query_id, rank, doc_id) with 1-based rank.
    qrels:  (query_id, doc_id, rel) graded relevance, rel > 0 = relevant.

    Graded/deep-qrels parity with the reference scorer (ranx, used by
    rag/benchmark.py): DCG uses the Jarvelin gain ``rel / log2(rank+1)``
    (ranx's ndcg default, not the exponential 2^rel-1 variant), and
    AP@k divides the precision sum by the TOTAL relevant count ``n_rel``
    (ranx map@k), not ``min(n_rel, k)``. Binary rel=1 qrels with
    n_rel <= k make both families coincide; graded or deep qrels do not
    — tests/test_quality.py pins the graded case.
    """
    hits = ranked.join(qrels, ["query_id", "doc_id"]).where(F.col("rel") > 0)
    gain = F.col("rel") / _log2(F.col("rank") + 1.0)
    # precision@rank among the top-map_k hits: position of this hit in the
    # ranking's hit sequence / its rank
    hit_seq = F.row_number().over(
        Window.partitionBy("query_id").orderBy("rank")
    )
    per_hit = hits.select(
        "query_id",
        "rank",
        F.when(F.col("rank") <= ndcg_k, gain).otherwise(0.0).alias("dcg"),
        F.when(F.col("rank") <= mrr_k, 1.0 / F.col("rank"))
        .otherwise(0.0)
        .alias("rr"),
        F.when(F.col("rank") <= map_k, hit_seq / F.col("rank"))
        .otherwise(0.0)
        .alias("prec"),
    )
    per_q_hits = per_hit.groupBy("query_id").agg(
        F.sum("dcg").alias("dcg"),
        F.max("rr").alias("rr"),
        F.sum("prec").alias("prec_sum"),
    )
    # ideal DCG + relevant count from the qrels side
    ideal_pos = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("rel"), F.asc("doc_id")
        )
    )
    rels = qrels.where(F.col("rel") > 0).select(
        "query_id", "rel", ideal_pos.alias("pos")
    )
    per_q_ideal = rels.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("pos") <= ndcg_k,
                F.col("rel") / _log2(F.col("pos") + 1.0),
            ).otherwise(0.0)
        ).alias("idcg"),
        F.count("*").alias("n_rel"),
    )
    per_q = per_q_ideal.join(per_q_hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
        F.coalesce(F.col("rr"), F.lit(0.0)).alias("rr"),
        (
            F.coalesce(F.col("prec_sum"), F.lit(0.0))
            / F.col("n_rel").cast("double")
        ).alias("ap"),
    )
    agg = per_q.agg(
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("ap"), 6).alias("ap"),
        F.round(F.avg("rr"), 6).alias("rr"),
    )
    return agg.select(
        F.explode(
            F.create_map(
                F.lit(f"ndcg@{ndcg_k}"), F.col("ndcg"),
                F.lit(f"map@{map_k}"), F.col("ap"),
                F.lit(f"mrr@{mrr_k}"), F.col("rr"),
            )
        ).alias("metric", "value_r6")
    )


def dense_qrels(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Deterministic sandbox qrels: for each query vector, its top-k dense
    cosine neighbors are 'relevant' (rel=1). Derived from the same corpus
    the rankings run over — measures whether a fused ranking preserves
    dense relevance (the reference reads its qrels from benchmark
    datasets; the contract here is the evaluator, the qrels source is
    injectable)."""
    nn = knn_bruteforce(spark, sf_dir, k=KNN_K)
    return nn.where(F.col("rank") <= k).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.lit(1).alias("rel"),
    )


def retrieval_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: score hybrid_search's fused top-10 against the dense
    top-3 qrels — ndcg@10 / map@5 / mrr@10, one row per metric."""
    from ragflow_spark.ops.retrieval import hybrid_search

    ranked = hybrid_search(spark, sf_dir).select(
        "query_id", "rank", F.col("doc_id")
    )
    return ranking_metrics(ranked, dense_qrels(spark, sf_dir)).orderBy(
        "metric"
    )
