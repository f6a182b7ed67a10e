"""Dedup + similarity operators on a planted fixture corpus (exact dups,
near-dups, embedding clusters) written as a tmp sf_dir."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ragflow_spark.ops import dedup, similarity

BASE = (
    "spark window shuffle partition broadcast data column batch arrow engine "
    "scan filter join group order token chunk merge layout table"
).split()


def _doc_text(i: int) -> str:
    rng = np.random.default_rng(1000 + i)
    return " ".join(rng.choice(BASE, size=60))


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("opsdata")
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        texts.append(_doc_text(i))
    # exact dup: 100 == copy of 0 (modulo whitespace/case)
    ids.append(100)
    texts.append("  " + texts[0].upper() + "  ")
    # near dup: 101 == 1 with one word changed
    w = texts[1].split()
    w[5] = "changed"
    ids.append(101)
    texts.append(" ".join(w))
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["s0"] * len(ids),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(d / "documents.parquet")

    # embeddings: 4 tight clusters of 10 + 2 planted near-identical vectors
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    vecs, vids = [], []
    for i in range(40):
        c = centers[i % 4]
        vecs.append((c + 0.05 * rng.normal(size=16)).astype(np.float32))
        vids.append(i)
    vecs.append((vecs[0] + 0.001).astype(np.float32))
    vids.append(100)
    emb = pd.DataFrame(
        {
            "vec_id": vids,
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [i % 4 for i in range(len(vids))],
        }
    )
    emb.to_parquet(d / "embeddings.parquet")
    return str(d)


def test_exact_dedup(spark, sf_dir):
    out = dedup.exact_dedup(spark, sf_dir).toPandas().set_index("doc_id")
    assert bool(out.loc[100, "is_dup"])
    assert out.loc[100, "keep_id"] == 0
    assert not out.loc[1, "is_dup"]


def test_ngram_jaccard_and_minhash_agree(spark, sf_dir):
    exact = dedup.ngram_jaccard_pairs(spark, sf_dir).toPandas()
    pairs = {(r.doc_a, r.doc_b) for r in exact.itertuples()}
    assert (1, 101) in pairs  # planted near-dup (one word changed)
    assert (0, 100) in pairs  # case/whitespace-changed copy: jaccard 1.0 after lower()
    mh = dedup.minhash_lsh_pairs(spark, sf_dir).toPandas()
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh.itertuples()}
    assert mh_pairs == pairs  # LSH recall 1.0 on planted dups + exact verify


def test_simhash_finds_neardups(spark, sf_dir):
    out = dedup.simhash_pairs(spark, sf_dir, max_hamming=7).toPandas()
    pairs = {(r.doc_a, r.doc_b) for r in out.itertuples()}
    assert (0, 100) in pairs  # same token multiset → identical simhash
    assert (1, 101) in pairs


def test_embedding_neardup_vs_numpy(spark, sf_dir):
    out = dedup.embedding_neardup(spark, sf_dir, threshold=0.9, blocks=4).toPandas()
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ids = emb["vec_id"].to_numpy()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.9:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert got == want
    assert (0, 100) in got  # planted near-identical vector


def test_knn_ivf_recall(spark, sf_dir):
    bf = similarity.knn_bruteforce(spark, sf_dir, k=5, query_mod=10).toPandas()
    ivf = similarity.knn_ivf(
        spark, sf_dir, k=5, query_mod=10, nlist=4, nprobe=2
    ).toPandas()
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    ivf_sets = ivf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q])
        for q in bf_sets.index
    ]
    # tight clusters → probing 2/4 lists should catch most true neighbors
    assert np.mean(recalls) >= 0.8


def test_embedding_neardup_lsh_finds_all_twins(spark):
    """The sign-LSH prefilter finds every planted near-duplicate twin and
    adds no false positives above the threshold (exact verify)."""
    from ragflow_spark.ops import dedup

    sf = "/root/testdata/sf0.001"
    out = dedup.embedding_neardup_lsh(spark, sf).collect()
    n_vec = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert len(out) == n_vec
    for r in out:
        assert r["id_b"] == r["id_a"] + 1_000_000
        assert r["cos_r4"] >= dedup.NEARDUP_LSH_THRESHOLD


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_minhash_oracle_recall_assumption(sf):
    """MINHASH_LSH_SQL == exact-Jaccard SQL is an oracle of the verifier
    contract ASSUMING LSH recall 1.0 on every planted pair. With 16 bands
    of 4 rows, P(miss) = (1-j^4)^16 — negligible only for high-j pairs
    (j=0.85: ~7e-6) but material near the 0.5 threshold (j=0.5: ~0.35).
    Guard: the corpus must contain NO borderline pairs — every pair at
    j ≥ 0.45 must sit at j ≥ 0.85, so the recall-1.0 equality stays sound
    (current corpus minimum: j=0.889 at sf0.001).
    If a future corpus trips this, re-plant the dups or drop the oracle
    to rows-only (VERDICT r3 §wrong-4)."""
    import duckdb

    from ragflow_spark.ops.dedup import _DUCK_SHINGLES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'/root/testdata/{sf}/documents.parquet'"
    )
    rows = con.execute(
        _DUCK_SHINGLES
        + """,
cnt AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM s a JOIN s b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS j
FROM pairs
JOIN cnt na ON na.doc_id = doc_a
JOIN cnt nb ON nb.doc_id = doc_b
WHERE 20 * inter >= 9 * (na.n + nb.n - inter)
"""
    ).fetchall()
    assert rows, "corpus lost its planted near-dup pairs entirely"
    borderline = [(a, b, j) for a, b, j in rows if j < 0.85]
    assert not borderline, (
        f"borderline-Jaccard pairs break the LSH recall-1.0 oracle: "
        f"{borderline[:5]}"
    )
