"""Retrieval-side operators (reference: rag/nlp/term_weight.py,
rag/nlp/search.py — documented in SURVEY.md §2.6). Rebuilt as DataFrame ops:

- ``term_idf``: corpus document-frequency + idf per token (the reference's
  term weighting backbone, term_weight.py:162-244).
- ``hybrid_search``: fulltext token-overlap similarity fused with dense
  cosine ``0.05·text + 0.95·vector`` (search.py:100-133, FusionExpr) and a
  window top-k (search.py:355-381).

Scale: the token df aggregation is one shuffle with map-side combine; the
query side of hybrid search is broadcast (queries ≪ corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

TOP_K = 10
QUERY_MOD = 100  # query docs: doc_id % QUERY_MOD == 0


def term_idf(spark: SparkSession, sf_dir: str, min_df: int = 2) -> DataFrame:
    """(token, df, idf_r6) over the documents corpus;
    idf = ln((N+1)/(df+1)) rounded to 6 (absorbs last-ulp libm diffs).
    N is computed in the same plan (broadcast 1-row aggregate) — no separate
    driver-side count() scan per invocation."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("token"),
    ).where(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("idf_r6"),
        )
    )


TERM_IDF_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token, count(*) AS df,
       round(ln(((SELECT n_docs FROM n) + 1.0) / (count(*) + 1.0)), 6) AS idf_r6
FROM tok WHERE token <> ''
GROUP BY token HAVING count(*) >= 2
"""


def _tokvec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, v): distinct lowercase tokens + L2-normalized vector
    per document (documents ⋈ embeddings on id)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "toks"
        ),
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    vec = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double") / norm).alias("v")
    )
    return docs.join(vec, docs.doc_id == vec.vec_id).select("doc_id", "toks", "v")


def _fused_topk(
    corpus: DataFrame,
    q: DataFrame,
    text_weight: float,
    vec_weight: float,
    k: int,
    out_col: str,
) -> DataFrame:
    """Broadcast the bounded query side against the corpus, score
    ``text_weight·overlap + vec_weight·cosine``, window top-k."""
    cos = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    text_sim = F.size(F.array_intersect("qtoks", "toks")) / F.size("qtoks")
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.lit(text_weight) * text_sim + F.lit(vec_weight) * cos, 6
            ).alias(out_col),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(out_col), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", out_col)
    )


def _query_side(
    corpus: DataFrame, query_mod: int, queries: DataFrame | None
) -> DataFrame:
    """The query side is an explicit BOUNDED batch by contract (the
    reference caps retrieval at topk≤1024, rag/nlp/search.py:355-381) —
    broadcasting it is safe because it is a query batch, never a corpus
    fraction. ``queries`` is (doc_id) keys joined against the corpus; the
    query_mod default exists only for the driver's deterministic harness."""
    src = (
        corpus.join(F.broadcast(queries.select("doc_id")), "doc_id")
        if queries is not None
        else corpus.where(F.col("doc_id") % query_mod == 0)
    )
    return src.select(
        F.col("doc_id").alias("query_id"),
        F.col("toks").alias("qtoks"),
        F.col("v").alias("qv"),
    )


def hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Per query doc: fused = 0.05·(token overlap / |query tokens|) +
    0.95·cosine(query vec, doc vec); top-k by (fused desc, id)
    (reference search.py:100-133, FusionExpr weighted_sum 0.05,0.95)."""
    corpus = _tokvec_corpus(spark, sf_dir)
    q = _query_side(corpus, query_mod, queries)
    return _fused_topk(corpus, q, 0.05, 0.95, k, "fused_r6")


def rerank_fusion(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Rerank (reference rag/nlp/search.py:279-339): blend token-overlap
    similarity 0.3 with dense cosine 0.7, re-rank per query (window
    re-order of an existing candidate list)."""
    corpus = _tokvec_corpus(spark, sf_dir)
    q = _query_side(corpus, query_mod, queries)
    return _fused_topk(corpus, q, 0.3, 0.7, k, "rerank_r6")


RERANK_FUSION_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
  FROM documents),
vecs AS (
  SELECT vec_id,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        x -> x / sqrt(list_dot_product(
                             list_transform(embedding, y -> CAST(y AS DOUBLE)),
                             list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS v
  FROM embeddings),
corpus AS (
  SELECT doc_id, toks, v FROM toks JOIN vecs ON doc_id = vec_id),
q AS (
  SELECT doc_id AS query_id, toks AS qtoks, v AS qv
  FROM corpus WHERE doc_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.doc_id,
         round(0.3 * (len(list_intersect(q.qtoks, c.toks)) * 1.0 / len(q.qtoks))
               + 0.7 * list_dot_product(q.qv, c.v), 6) AS rerank_r6
  FROM corpus c, q WHERE c.doc_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rerank_r6 DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, rerank_r6
FROM ranked WHERE rank <= {TOP_K}
"""


def tag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-feature scoring (reference rag/nlp/search.py:463-501,
    TF-ICF-like smoothing (c+1)/(cnt+S)): per (source, lang) "tag", the
    smoothed share of each tag within its source, scaled by the tag's
    corpus-wide rarity. Integer counts + single divisions."""
    docs = load(spark, sf_dir, "documents")
    s_tot = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    tag_tot = docs.groupBy("lang").agg(F.count("*").alias("all_tag"))
    n_langs = docs.agg(F.countDistinct("lang").alias("n_langs"))
    by = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    return (
        by.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(tag_tot), "lang")
        .crossJoin(F.broadcast(n_langs))
        .select(
            "source",
            F.col("lang").alias("tag"),
            F.col("c").cast("int").alias("c"),
            F.round(
                (F.col("c") + 1) / (F.col("cnt") + F.col("n_langs")) / F.col("all_tag"),
                6,
            ).alias("feat_r6"),
        )
    )


TAG_FEATURES_SQL = """
WITH s_tot AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
tag_tot AS (SELECT lang, count(*) AS all_tag FROM documents GROUP BY lang),
n AS (SELECT count(DISTINCT lang) AS n_langs FROM documents),
by_t AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang)
SELECT by_t.source, by_t.lang AS tag, CAST(c AS INTEGER) AS c,
       round((c + 1) * 1.0 / (cnt + (SELECT n_langs FROM n)) / all_tag, 6) AS feat_r6
FROM by_t
JOIN s_tot ON by_t.source = s_tot.source
JOIN tag_tot ON by_t.lang = tag_tot.lang
"""


HYBRID_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
  FROM documents),
vecs AS (
  SELECT vec_id,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        x -> x / sqrt(list_dot_product(
                             list_transform(embedding, y -> CAST(y AS DOUBLE)),
                             list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS v
  FROM embeddings),
corpus AS (
  SELECT doc_id, toks, v FROM toks JOIN vecs ON doc_id = vec_id),
q AS (
  SELECT doc_id AS query_id, toks AS qtoks, v AS qv
  FROM corpus WHERE doc_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.doc_id,
         round(0.05 * (len(list_intersect(q.qtoks, c.toks)) * 1.0 / len(q.qtoks))
               + 0.95 * list_dot_product(q.qv, c.v), 6) AS fused_r6
  FROM corpus c, q WHERE c.doc_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY fused_r6 DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, fused_r6
FROM ranked WHERE rank <= {TOP_K}
"""
