"""Approximate/exact nearest-neighbor search over the embedding column.

- ``knn_bruteforce``: exact cosine top-k for a deterministic query subset.
  The query side is tiny → ``F.broadcast`` crossJoin (no shuffle of the big
  side), dot product as a JVM ``zip_with``/``aggregate`` fold (codegen'd,
  no Python), window top-k with an id tie-break.
- ``knn_ivf``: IVF-style coarse quantization — deterministic centroid seed
  (vec_id mod nlist), one Lloyd refinement, probe top-``nprobe`` lists.
  Cuts the scanned fraction to ~nprobe/nlist; the scale path for 10^9+ rows
  where brute force is a full-corpus scan per query.

Reference analog: dense cosine kNN retrieval rag/nlp/search.py:100-133 (topk
vector match); here rebuilt as DataFrame ops instead of an external ANN index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

KNN_K = 10
QUERY_MOD = 100  # default query stride (deterministic harness batch)
# Default query batch = ids {0, QUERY_MOD, …, QUERY_MOD·(MAX-1)}: stride
# AND cap together make the default a FIXED-SIZE batch at any corpus size
# (r4 verdict: the old stride-only default was corpus/100 — a growing
# broadcast at 100 TB; both predicates push to the scan).
QUERY_BATCH_MAX = 16


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _normed(emb: DataFrame, idcol: str = "vec_id") -> DataFrame:
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return emb.select(
        F.col(idcol),
        F.transform(
            "embedding", lambda x: x.cast("double") / norm
        ).alias("v"),
    )


def knn_bruteforce(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    query_mod: int = QUERY_MOD,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the corpus.

    The query side is an explicit BOUNDED DataFrame of (vec_id, embedding)
    — the operator contract is a query batch (the reference caps retrieval
    at topk≤1024 candidates, rag/nlp/search.py:355-381), never a corpus
    fraction; broadcasting it is safe by contract. The default batch is
    stride-query_mod ids capped below query_mod·QUERY_BATCH_MAX — fixed
    size at ANY corpus scale, so the executed default honors the same
    contract as an explicit batch."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = _normed(emb)
    qsrc = _normed(queries) if queries is not None else n.where(
        (F.col("vec_id") % query_mod == 0)
        & (F.col("vec_id") < query_mod * QUERY_BATCH_MAX)
    )
    q = qsrc.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = n.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored.select("query_id", "vec_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )


KNN_BRUTEFORCE_SQL = f"""
WITH d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings),
n AS (
  SELECT vec_id, list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv))) AS v
  FROM d),
q AS (SELECT vec_id AS query_id, v AS qv FROM n
      WHERE vec_id % {QUERY_MOD} = 0
        AND vec_id < {QUERY_MOD * QUERY_BATCH_MAX}),
scored AS (
  SELECT q.query_id, n.vec_id,
         list_dot_product(q.qv, n.v) AS cos,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(q.qv, n.v) DESC, n.vec_id ASC) AS rank
  FROM q, n WHERE n.vec_id <> q.query_id)
SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id
FROM scored WHERE rank <= {KNN_K}
"""


# ---------------------------------------------------------------------- IVF


def _avg_by(df: DataFrame, keycol) -> DataFrame:
    """Per-key element-wise mean of the normalized vectors, renormalized.
    posexplode → two-phase avg: the explode is narrow (same stage) and the
    partial aggregation bounds shuffle volume to nlist × dim per input
    partition — no driver-side dim probe, no corpus-sized shuffle."""
    e = df.select(
        keycol.alias("list_id"), F.posexplode("v").alias("pos", "x")
    )
    comp = e.groupBy("list_id", "pos").agg(F.avg("x").alias("m"))
    arr = comp.groupBy("list_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
    ).select("list_id", F.transform("pm", lambda s: s["m"]).alias("c"))
    cn = F.sqrt(
        F.aggregate(F.transform("c", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # quantize centroid components: float summation order differs between
    # engines (and partitionings), so round to 9 decimals to make centroids
    # — and everything assigned from them — bit-reproducible
    return arr.select(
        "list_id", F.transform("c", lambda x: F.round(x / cn, 9)).alias("c")
    )


def _assign(n: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as ONE projection: the (tiny) centroid
    table is collapsed to a single array row, broadcast, and the argmax is a
    JVM array_max over structs — no ×nlist row blowup, no window shuffle.
    Tie-break on the smaller list_id via the negated-id struct field."""
    cents = cents_df.agg(
        F.collect_list(F.struct("list_id", "c")).alias("cents")
    )
    best = F.array_max(
        F.transform(
            "cents",
            lambda s: F.struct(
                _dot(F.col("v"), s["c"]).alias("cos"),
                (-s["list_id"]).cast("int").alias("neg_id"),
            ),
        )
    )
    return (
        n.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", best.alias("best"))
        .select(
            "vec_id", "v", (-F.col("best.neg_id")).cast("int").alias("list_id")
        )
    )


def ivf_assignments(
    spark: SparkSession, sf_dir: str, nlist: int = 16, train_mod: int = 5
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments): deterministic seed lists (vec_id % nlist),
    one Lloyd step TRAINED ON A SAMPLE (vec_id % train_mod == 0) — the
    standard IVF posture: centroid quality needs a representative sample,
    not the corpus, so the training scans touch 1/train_mod of the data
    and only the final assignment pass reads everything. Centroid table is
    tiny → broadcast everywhere; each assignment pass is a shuffle-free
    projection."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = _normed(emb)
    tr = _normed(emb.where(F.col("vec_id") % train_mod == 0))
    seed = _avg_by(tr, (F.col("vec_id") % nlist).cast("int"))
    assigned_tr = _assign(tr, seed)
    # Materialize ONLY the tiny (nlist-row) centroid table: collect it to
    # the driver and re-emit as a LocalRelation, so the training lineage
    # (both sample aggregations) runs exactly once and every downstream
    # consumer broadcasts a 16-row literal with zero lineage. Collecting
    # nlist rows is scale-independent — this is NOT a corpus collect. The
    # corpus-sized normalized/assigned frames are deliberately NOT cached
    # — a pinned corpus is pure memory pressure at 100 TB, and each
    # re-consumption is a narrow shuffle-free scan+normalize+argmax
    # projection (same rationale as the round-3 minhash corpus-cache
    # removal, BENCH.md).
    crows = _avg_by(assigned_tr, F.col("list_id")).collect()
    # re-emit as a pure literal expression (inline of lit structs), NOT
    # createDataFrame: the python-list path builds an RDD-backed plan that
    # re-runs a defaultParallelism-sliced scan in EVERY consumer, while
    # the literal folds to a LocalRelation — zero tasks, free to broadcast
    centroids = spark.range(1).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(int(r["list_id"])).alias("list_id"),
                        F.array(
                            *[F.lit(float(x)) for x in r["c"]]
                        ).alias("c"),
                    )
                    for r in crows
                ]
            )
        )
    )
    final = _assign(n, centroids)
    return centroids, final


def knn_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    query_mod: int = QUERY_MOD,
    nlist: int = 16,
    nprobe: int = 4,
    queries: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest inverted lists per query. Scans
    ~nprobe/nlist of the corpus; recall vs brute force asserted in tests.

    ``queries`` is an explicit bounded (vec_id, embedding) batch — same
    contract as knn_bruteforce; the query-side crossJoin×nlist + window is
    bounded by the query batch size, never the corpus."""
    centroids, assigned = ivf_assignments(spark, sf_dir, nlist)
    if queries is not None:
        qsrc = _normed(queries)
    else:
        # derive the query batch from a FILTERED scan, not from `assigned`:
        # the query side only needs the normalized vectors, and filtering
        # before normalization turns it into a tiny scan instead of a full
        # corpus argmax recompute (which the uncached design would repeat);
        # the stride+cap makes the batch fixed-size at any corpus scale
        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        qsrc = _normed(
            emb.where(
                (F.col("vec_id") % query_mod == 0)
                & (F.col("vec_id") < query_mod * QUERY_BATCH_MAX)
            )
        )
    q = qsrc.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # Probe selection: crossJoin the (bounded) query batch with the
    # nlist-row broadcast centroid table + a per-query window. An
    # all-literal array-expression formulation (sort/slice/transform over
    # 16×64 lit doubles) measured 3× SLOWER despite having zero
    # exchanges — catalyst re-folds the 1024-literal subtree on every
    # plan, so driver-side compile dwarfs the tiny shuffle it saves.
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", "list_id", _dot(F.col("qv"), F.col("c")).alias("cos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("list_id"))
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    # Broadcast the PROBES side (bounded: |queries| × nprobe rows): a
    # shuffle join here would hash the whole corpus onto list_id's nlist
    # distinct keys — a 16-partition skew shuffle at 100 TB. Broadcasting
    # keeps the corpus side shuffle-free; candidates flow map-side into
    # the per-query top-k.
    scored = (
        F.broadcast(probes).join(assigned, "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _dot(F.col("qv"), F.col("v")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )


# DuckDB oracle: the IVF pipeline is fully deterministic (seed lists =
# vec_id % nlist, quantized centroids, argmax assignment, fixed probes), so
# the whole thing is expressible with window functions + list_dot_product.
_IVF_NLIST = 16
_IVF_NPROBE = 4
_IVF_TRAIN_MOD = 5

KNN_IVF_SQL = f"""
WITH d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings),
n AS (
  SELECT vec_id, list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv))) AS v
  FROM d),
tr AS (SELECT vec_id, v FROM n WHERE vec_id % {_IVF_TRAIN_MOD} = 0),
se AS (
  SELECT CAST(vec_id % {_IVF_NLIST} AS INTEGER) AS list_id,
         unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos
  FROM tr),
sm AS (SELECT list_id, pos, avg(x) AS m FROM se GROUP BY list_id, pos),
sc0 AS (SELECT list_id, list(m ORDER BY pos) AS c FROM sm GROUP BY list_id),
seed AS (
  SELECT list_id,
         list_transform(c, x -> round(x / sqrt(list_dot_product(c, c)), 9)) AS c
  FROM sc0),
a1 AS (
  SELECT vec_id, v, list_id FROM (
    SELECT tr.vec_id, tr.v, s.list_id,
           row_number() OVER (PARTITION BY tr.vec_id
                              ORDER BY list_dot_product(tr.v, s.c) DESC,
                                       s.list_id ASC) AS rn
    FROM tr, seed s) t WHERE rn = 1),
le AS (
  SELECT list_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos
  FROM a1),
lm AS (SELECT list_id, pos, avg(x) AS m FROM le GROUP BY list_id, pos),
lc0 AS (SELECT list_id, list(m ORDER BY pos) AS c FROM lm GROUP BY list_id),
cent AS (
  SELECT list_id,
         list_transform(c, x -> round(x / sqrt(list_dot_product(c, c)), 9)) AS c
  FROM lc0),
a2 AS (
  SELECT vec_id, v, list_id FROM (
    SELECT n.vec_id, n.v, c.list_id,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.v, c.c) DESC,
                                       c.list_id ASC) AS rn
    FROM n, cent c) t WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM a2
      WHERE vec_id % {QUERY_MOD} = 0
        AND vec_id < {QUERY_MOD * QUERY_BATCH_MAX}),
probes AS (
  SELECT query_id, qv, list_id FROM (
    SELECT q.query_id, q.qv, c.list_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qv, c.c) DESC,
                                       c.list_id ASC) AS rn
    FROM q, cent c) t WHERE rn <= {_IVF_NPROBE}),
scored AS (
  SELECT p.query_id, a.vec_id, list_dot_product(p.qv, a.v) AS cos
  FROM probes p JOIN a2 a USING (list_id)
  WHERE a.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id
FROM ranked WHERE rank <= {KNN_K}
"""


def title_vector_blend(
    spark: SparkSession,
    sf_dir: str,
    chunks_per_doc: int = 5,
    title_w: float = 0.1,
) -> DataFrame:
    """Title-vector blend of the reference's embedding stage
    (rag/svr/task_executor.py:463-476): every chunk's stored vector is
    ``title_w * title_vec + (1 - title_w) * content_vec`` where the
    title vector is one shared per-document encode (filename_embd_weight
    default 0.1), and the field name carries the dimension
    (``q_%d_vec``). The encode itself is the external-model non-goal;
    this operator is the blend over already-encoded vectors.

    Shape: embeddings group into documents of ``chunks_per_doc`` rows;
    the doc's first vector plays the title encode. The title side is
    corpus-sized/chunks_per_doc, so it joins as a plain shuffle join on
    the doc key — AQE may broadcast it at small scale, and at 10^9 rows
    the same plan degrades to sort-merge instead of a forced broadcast.
    Blend is a JVM ``zip_with`` in double precision (codegen, no
    Python); the first 8 components project out rounded to 6 decimals
    (CLAUDE invariant: round floats on both engines)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doc = (F.col("vec_id") - F.col("vec_id") % chunks_per_doc) / chunks_per_doc
    e = emb.withColumn("doc", doc.cast("long"))
    titles = e.where(F.col("vec_id") % chunks_per_doc == 0).select(
        F.col("doc"), F.col("embedding").alias("tv")
    )
    return blend_frames(e, titles, title_w)


def blend_frames(e: DataFrame, titles: DataFrame, title_w: float = 0.1) -> DataFrame:
    """The blend itself over explicit (vec_id, embedding, doc) chunk and
    (doc, tv) title frames — shared by the shuffle-join path above and the
    bucketed co-located path (ops/bucketing.py)."""
    blended = e.join(titles, "doc").select(
        "vec_id",
        F.concat(
            F.lit("q_"), F.size("embedding").cast("string"), F.lit("_vec")
        ).alias("q_vec_field"),
        F.zip_with(
            "tv",
            "embedding",
            lambda t, c: t.cast("double") * F.lit(title_w)
            # round-trip: raw 1.0-0.1 is 0.8999999999999999, NOT the
            # double the oracle's literal 0.9 parses to
            + c.cast("double") * F.lit(round(1.0 - title_w, 12)),
        ).alias("v"),
    )
    cols = [
        F.round(F.element_at("v", i + 1), 6).alias(f"v{i}") for i in range(8)
    ]
    return blended.select("vec_id", "q_vec_field", *cols)


TITLE_VECTOR_BLEND_SQL = """
WITH e AS (
  SELECT vec_id, embedding, vec_id // 5 AS doc
  FROM embeddings),
t AS (
  SELECT doc, embedding AS tv FROM e WHERE vec_id % 5 = 0)
SELECT e.vec_id,
       'q_' || CAST(len(e.embedding) AS VARCHAR) || '_vec' AS q_vec_field,
       round(CAST(t.tv[1] AS DOUBLE) * 0.1
             + CAST(e.embedding[1] AS DOUBLE) * 0.9, 6) AS v0,
       round(CAST(t.tv[2] AS DOUBLE) * 0.1
             + CAST(e.embedding[2] AS DOUBLE) * 0.9, 6) AS v1,
       round(CAST(t.tv[3] AS DOUBLE) * 0.1
             + CAST(e.embedding[3] AS DOUBLE) * 0.9, 6) AS v2,
       round(CAST(t.tv[4] AS DOUBLE) * 0.1
             + CAST(e.embedding[4] AS DOUBLE) * 0.9, 6) AS v3,
       round(CAST(t.tv[5] AS DOUBLE) * 0.1
             + CAST(e.embedding[5] AS DOUBLE) * 0.9, 6) AS v4,
       round(CAST(t.tv[6] AS DOUBLE) * 0.1
             + CAST(e.embedding[6] AS DOUBLE) * 0.9, 6) AS v5,
       round(CAST(t.tv[7] AS DOUBLE) * 0.1
             + CAST(e.embedding[7] AS DOUBLE) * 0.9, 6) AS v6,
       round(CAST(t.tv[8] AS DOUBLE) * 0.1
             + CAST(e.embedding[8] AS DOUBLE) * 0.9, 6) AS v7
FROM e JOIN t USING (doc)
"""
