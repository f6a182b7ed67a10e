"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (100 TB framing):
- Exact dedup is one hash-shuffle on the normalized text (Tungsten groupBy).
- The exact Jaccard self-join is the *verifier*; its candidate generation at
  scale is MinHash+LSH (band buckets bound the join fan-out) — both are here,
  and ``minhash_lsh_pairs`` verifies candidates only, so its cost is
  O(docs·sig + candidate_pairs), not O(pairs).
- Embedding near-dup uses a blocked all-pairs join (each vector is replicated
  to its block row+column), numpy GEMM inside ``applyInPandas`` per block
  pair — no driver collect, shuffle volume = 2B·rows. At real scale the LSH
  sign-bucket prefilter (similarity.py) replaces the all-pairs phase.

Hot paths are JVM expressions (split/transform/xxhash64/bit_count); Python
appears only in the SimHash bit fold and the GEMM kernel (Arrow-batched).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load
from ragflow_spark.ops.text import DUCK_NORM, SPARK_NORM

# ---------------------------------------------------------------- exact dedup


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → canonical keep_id over normalized-text equality groups.
    One shuffle (hash partition on the md5 of normalized text — grouping on
    the 32-byte digest, not the full text, keeps shuffle rows narrow)."""
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.expr(SPARK_NORM.format(c="text")))
    w = Window.partitionBy(key)
    return docs.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


EXACT_DEDUP_SQL = f"""
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY md5({DUCK_NORM.format(c="text")})) AS keep_id,
       doc_id <> min(doc_id) OVER (PARTITION BY md5({DUCK_NORM.format(c="text")})) AS is_dup
FROM documents
"""


# ------------------------------------------------------------ word shingles


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) distinct word n-gram shingles, all JVM-side:
    split → transform(sequence) → explode → distinct.

    The word array is materialized as a column FIRST: referencing the split
    expression inside the transform lambda would re-split the whole text for
    every element_at (no common-subexpression elimination across lambda
    scopes — measured 4× slowdown)."""
    with_words = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    w = F.col("w")
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + F.lit(j)).cast("int")) for j in range(n)]
        ),
    )
    return (
        with_words.select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


_DUCK_SHINGLES = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents),
s AS (
  SELECT DISTINCT doc_id,
         unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                 for i in generate_series(1, greatest(len(words)-2, 0))]) AS sh
  FROM w)
"""

_DUCK_JACCARD_TAIL = """
cnt AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM s a JOIN s b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(inter AS INTEGER) AS inter,
       CAST(na.n + nb.n - inter AS INTEGER) AS uni
FROM pairs
JOIN cnt na ON na.doc_id = doc_a
JOIN cnt nb ON nb.doc_id = doc_b
WHERE 2 * inter >= na.n + nb.n - inter
"""

# jaccard >= 0.5 expressed in integers (2*inter >= union) — no FP at all
NGRAM_JACCARD_SQL = _DUCK_SHINGLES + "," + _DUCK_JACCARD_TAIL


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard ≥ 0.5 near-dup pairs. Shingle equi-join,
    then shuffle joins against the per-doc shingle counts — cnt has one row
    PER DOCUMENT, so it must never be broadcast (corpus-sized at 100 TB);
    AQE turns these into broadcasts only when cnt is actually small."""
    docs = load(spark, sf_dir, "documents")
    # no corpus-wide cache: the distinct's shuffle is identical under every
    # consumer, so ReuseExchange shares one materialization of the shingle
    # table without pinning it in executor memory (100 TB hygiene)
    ds = _shingles(docs)
    cnt = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ds.alias("a")
    b = ds.alias("b")
    pairs = (
        a.join(b, "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(2 * F.col("inter") >= F.col("na") + F.col("nb") - F.col("inter"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("int").alias("inter"),
            (F.col("na") + F.col("nb") - F.col("inter")).cast("int").alias("uni"),
        )
    )


# ------------------------------------------------------------- MinHash + LSH

MINHASH_K = 64  # signature length
LSH_BANDS = 16  # 16 bands × 4 rows: P(collide) ≈ 1-(1-j^4)^16, steep at j=0.5


def minhash_signatures(ds: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash over distinct shingles via double hashing:
    TWO xxhash64 evaluations per shingle (h1, h2), then k derived
    permutations g_i = h1 XOR rotl(h2, i) — bitwise, so ANSI-safe, and
    ~30x less hash work than k independent xxhash64 calls. One groupBy
    with map-side partial aggregation → a single cheap shuffle of k longs
    per doc. The per-doc shingle count ``n`` rides the same aggregation
    (one pass instead of a second count-shuffle for the Jaccard verifier)."""
    h1 = F.xxhash64(F.col("sh"))
    h2 = F.xxhash64(F.lit(1), F.col("sh"))

    def perm(i: int):
        rot = F.shiftleft(h2, i % 64).bitwiseOR(
            F.shiftrightunsigned(h2, (64 - i) % 64)
        )
        return F.min(h1.bitwiseXOR(rot)).alias(f"h{i}")

    return ds.groupBy("doc_id").agg(
        F.count("*").alias("n"), *[perm(i) for i in range(k)]
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash→LSH band buckets→candidate pairs→exact-Jaccard verification
    (candidates only). Returns the same schema as ngram_jaccard_pairs; with
    these parameters recall at j≥0.5 is ≈1-(1-0.5^4)^16 ≈ 0.645 per band
    group — cumulative ≈1.0 for the j≈0.99 planted dups; the verifier keeps
    precision exact."""
    docs = load(spark, sf_dir, "documents")
    # no corpus-wide cache: ReuseExchange shares the shingle distinct's
    # shuffle across the signature, verify and count consumers
    ds = _shingles(docs)
    sig = minhash_signatures(ds, k)
    r = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.col(f"h{bi * r + j}") for j in range(r)]).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    # candidate pairs via a buckets self-join FORCED to shuffle on both
    # sides (shuffle_merge hint): the two sides are identical subtrees
    # hash-partitioned on (band, bh), so ReuseExchange computes the
    # signature aggregation ONCE (a plain self-join lets AQE broadcast one
    # side, whose broadcast subtree defeats exchange reuse — measured 2x
    # sig cost). Pairs stream row-by-row out of the sort-merge join, so a
    # degenerate bucket of b docs emits b^2/2 ROWS across tasks instead of
    # one b^2/2-element array in a single row (the collect_list+flatten
    # formulation OOMs on large near-dup cliques at scale).
    ba = buckets.alias("ba").hint("shuffle_merge")
    bb = buckets.alias("bb").hint("shuffle_merge")
    cand = (
        ba.join(
            bb,
            [
                F.col("ba.band") == F.col("bb.band"),
                F.col("ba.bh") == F.col("bb.bh"),
                F.col("ba.doc_id") < F.col("bb.doc_id"),
            ],
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # verify candidates with exact jaccard (shingle join restricted to pairs)
    sa = ds.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = ds.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    # per-doc shingle counts ride the signature aggregation (no extra pass)
    na = sig.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sig.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # cnt is per-doc (corpus-sized): shuffle join, never a forced broadcast
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(2 * F.col("inter") >= F.col("na") + F.col("nb") - F.col("inter"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("int").alias("inter"),
            (F.col("na") + F.col("nb") - F.col("inter")).cast("int").alias("uni"),
        )
    )


# oracle: LSH with these parameters has recall ≈ 1 at the corpus's planted
# j≈0.99 dups and the verifier is exact, so the result set equals the exact
# jaccard pairs
MINHASH_LSH_SQL = NGRAM_JACCARD_SQL


# ------------------------------------------------------------------- SimHash


SIMHASH_BITS = 60  # md5 hex chars [17:32) → 60-bit token hash, SQL-shareable


def _simhash60(tokens: list[str]) -> int:
    """60-bit SimHash: per-token md5-substring hash votes. md5 is the one
    hash both Spark-side Python and the DuckDB oracle compute bit-for-bit,
    which makes the whole signature SQL-expressible; numpy-vectorized over
    the token axis."""
    if not tokens:
        return 0
    hs = np.array(
        [
            int(hashlib.md5(t.encode()).hexdigest()[17:32], 16)
            for t in tokens
        ],
        dtype=np.int64,
    )
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    bits = ((hs[:, None] >> shifts[None, :]) & 1).astype(np.int32)
    votes = np.where(bits == 1, 1, -1).sum(axis=0)
    return int(((votes > 0).astype(np.int64) << shifts).sum())


def simhash_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 7
) -> DataFrame:
    """SimHash near-dup: Arrow-batched signature UDF, then 4×15-bit band
    buckets (pigeonhole: guaranteed recall for hamming≤3; wider hamming
    caught probabilistically) and exact ``bit_count(a^b)`` verification
    JVM-side."""
    docs = load(spark, sf_dir, "documents")

    def sig_batches(batches):
        for pdf in batches:
            toks = pdf["text"].fillna("").str.lower().str.split()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sim": [_simhash60(t) for t in toks],
                }
            )

    sig = docs.select("doc_id", "text").mapInPandas(
        sig_batches, schema="doc_id long, sim long"
    )
    bandcols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("sim"), 15 * i).bitwiseAND(F.lit(0x7FFF)).alias("bh"),
            )
            for i in range(4)
        ]
    )
    buckets = sig.select("doc_id", "sim", F.explode(bandcols).alias("b")).select(
        "doc_id", "sim", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.sim").bitwiseXOR(F.col("b.sim"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(t), 18, 15) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
    FROM documents)
  WHERE t <> ''),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM tok, generate_series(0, {SIMHASH_BITS - 1}) s(b)
  GROUP BY doc_id, b),
sig0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
              AS BIGINT) AS sim
  FROM bits GROUP BY doc_id),
sig AS (
  SELECT d.doc_id, coalesce(s.sim, 0) AS sim
  FROM documents d LEFT JOIN sig0 s USING (doc_id)),
buckets AS (
  SELECT doc_id, sim, band, (sim >> (15 * band)) & 32767 AS bh
  FROM sig, generate_series(0, 3) t(band)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
  FROM buckets a JOIN buckets b USING (band, bh)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 7
"""


# ------------------------------------------------- embedding cosine near-dup

NEARDUP_COS_THRESHOLD = 0.4
NEARDUP_BLOCKS = 8


def embedding_neardup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = NEARDUP_COS_THRESHOLD,
    blocks: int = NEARDUP_BLOCKS,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via a blocked self-join: vector i
    in block p is shipped to every block pair (p,q); each (p,q) group runs one
    numpy GEMM. Distributed, no driver collect; replication factor = blocks."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bcol = (F.col("vec_id") % blocks).cast("int")
    rows = emb.withColumn("blk", bcol)
    # build (bp, bq, side) replication: side 0 rows have blk=bp, side 1 blk=bq
    pairs_keys = F.array(
        *[
            F.struct(
                F.least(F.col("blk"), F.lit(q)).alias("bp"),
                F.greatest(F.col("blk"), F.lit(q)).alias("bq"),
            )
            for q in range(blocks)
        ]
    )
    repl = rows.select(
        "vec_id", "embedding", "blk", F.explode(F.array_distinct(pairs_keys)).alias("k")
    ).select("vec_id", "embedding", "blk", F.col("k.bp").alias("bp"), F.col("k.bq").alias("bq"))

    thr = float(threshold)

    def gemm(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bp, bq = key
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        blk = pdf["blk"].to_numpy()
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        if bp == bq:
            sims = matn @ matn.T
            ii, jj = np.where(sims >= thr)
            keep = ids[ii] < ids[jj]
            ia, ib, s = ids[ii][keep], ids[jj][keep], sims[ii, jj][keep]
        else:
            pa, pb = blk == bp, blk == bq
            sims = matn[pa] @ matn[pb].T
            ii, jj = np.where(sims >= thr)
            ia0, ib0 = ids[pa][ii], ids[pb][jj]
            lo = np.minimum(ia0, ib0)
            hi = np.maximum(ia0, ib0)
            ia, ib, s = lo, hi, sims[ii, jj]
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cos_r4": np.round(s, 4)})

    return (
        repl.groupBy("bp", "bq")
        .applyInPandas(gemm, schema="id_a long, id_b long, cos_r4 double")
        .distinct()
    )


# ---------------------------------------- embedding near-dup, LSH prefilter
# The 10^9-row path the blocked-GEMM docstring defers to: random-hyperplane
# sign signatures → banded buckets → candidates → exact cosine verify. The
# driver testdata has no high-cosine pairs, so the query synthesizes a
# perturbed twin per vector (cos ≈ 0.9999) the prefilter must find; recall
# at that cosine is 1 - (1 - (1-θ/π)^bits)^bands ≈ 1 - 2e-8 for 8×8, and
# the verifier is exact, so the result equals the exact threshold pairs
# (which is what the oracle computes — no LSH in SQL needed).

NEARDUP_LSH_THRESHOLD = 0.98
_LSH_BANDS = 8
_LSH_BITS = 8


def _hyperplanes(dim: int, n: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 streams."""
    vals = np.array(
        [
            int(hashlib.md5(f"hp-{j}-{i}".encode()).hexdigest()[:8], 16)
            % 2001
            - 1000
            for j in range(n)
            for i in range(dim)
        ],
        dtype=np.float64,
    )
    return vals.reshape(n, dim)


def with_perturbed_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ a deterministic near-duplicate twin per vector
    (twin id = vec_id + 1_000_000; component i nudged by
    ((vec_id·31 + i) mod 7 − 3)·1e-3)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = F.sequence(F.lit(0), F.size("embedding") - 1)
    twin = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(
            "embedding",
            idx,
            lambda x, i: x.cast("double")
            + ((F.col("vec_id") * 31 + i) % 7 - 3) * 1e-3,
        ).alias("embedding"),
    )
    return emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(twin)


def embedding_neardup_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = NEARDUP_LSH_THRESHOLD,
    bands: int = _LSH_BANDS,
    bits: int = _LSH_BITS,
) -> DataFrame:
    """Sign-LSH prefiltered near-dup: signatures via one Arrow-batched GEMM
    against deterministic hyperplanes, band-bucket self-join for candidates
    (join fan-out bounded by bucket occupancy, never O(n²)), exact JVM
    cosine verification. Scales as O(n·bands + candidate_pairs)."""
    rows = with_perturbed_twins(spark, sf_dir)
    nb = bands * bits

    def sig_batches(batches):
        H = None
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if H is None:
                H = _hyperplanes(mat.shape[1], nb)
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            signs = (mat / norms[:, None]) @ H.T > 0
            keys = np.zeros((len(mat), bands), dtype=np.int64)
            for b in range(bands):
                block = signs[:, b * bits:(b + 1) * bits]
                keys[:, b] = block @ (1 << np.arange(bits))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "bands": [list(map(int, k)) for k in keys],
                }
            )

    sig = rows.select("vec_id", "embedding").mapInPandas(
        sig_batches, schema="vec_id long, bands array<long>"
    )
    buckets = sig.select(
        "vec_id", F.posexplode("bands").alias("band", "bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
        )
    )
    nvec = rows.select(
        "vec_id", F.transform("embedding", lambda x: x / norm).alias("v")
    )
    va = nvec.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = nvec.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos, 4).alias("cos_r4"))
        .where(F.col("cos_r4") >= threshold)
    )


EMBEDDING_NEARDUP_LSH_SQL = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings),
twin AS (
  SELECT vec_id + 1000000 AS vec_id,
         [dv[i] + (((vec_id * 31 + (i - 1)) % 7) - 3) * 1e-3
          for i in generate_series(1, len(dv))] AS dv
  FROM base),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
n AS (
  SELECT vec_id,
         list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv))) AS v
  FROM allv)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v), 4) AS cos_r4
FROM n a, n b
WHERE a.vec_id < b.vec_id
  AND round(list_dot_product(a.v, b.v), 4) >= {NEARDUP_LSH_THRESHOLD}
"""


EMBEDDING_NEARDUP_SQL = f"""
WITH d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings),
n AS (
  SELECT vec_id,
         list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv))) AS v
  FROM d)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v), 4) AS cos_r4
FROM n a, n b
WHERE a.vec_id < b.vec_id AND list_dot_product(a.v, b.v) >= {NEARDUP_COS_THRESHOLD}
"""
