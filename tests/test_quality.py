"""Retrieval-quality metrics (reference rag/benchmark.py:242-276 cutoffs)."""

from __future__ import annotations

import math


def test_ranking_metrics_hand_golden(spark):
    """Three queries computed by hand: full hits, partial, and a miss."""
    from ragflow_spark.ops.quality import ranking_metrics

    ranked = spark.createDataFrame(
        [
            ("A", 1, "d1"), ("A", 2, "d9"), ("A", 3, "d2"), ("A", 7, "d3"),
            ("B", 1, "d8"), ("B", 4, "d7"),
            ("C", 1, "d9"), ("C", 2, "d8"),
        ],
        "query_id string, rank int, doc_id string",
    )
    qrels = spark.createDataFrame(
        [
            ("A", "d1", 1), ("A", "d2", 1), ("A", "d3", 1),
            ("B", "d7", 1),
            ("C", "d5", 1),
        ],
        "query_id string, doc_id string, rel int",
    )
    out = {r["metric"]: r["value_r6"]
           for r in ranking_metrics(ranked, qrels).collect()}

    def l2(x):
        return math.log2(x)

    ndcg_a = (1 / l2(2) + 1 / l2(4) + 1 / l2(8)) / (
        1 / l2(2) + 1 / l2(3) + 1 / l2(4)
    )
    ndcg_b = (1 / l2(5)) / 1.0
    exp_ndcg = round((ndcg_a + ndcg_b + 0.0) / 3, 6)
    # A: hits at ranks 1,3 within k=5 → (1/1 + 2/3)/3 relevant; B: (1/4)/1; C: 0
    exp_map = round(((1.0 + 2 / 3) / 3 + 0.25 + 0.0) / 3, 6)
    exp_mrr = round((1.0 + 0.25 + 0.0) / 3, 6)
    assert abs(out["ndcg@10"] - exp_ndcg) < 1e-6, out
    assert abs(out["map@5"] - exp_map) < 1e-6, out
    assert abs(out["mrr@10"] - exp_mrr) < 1e-6, out


def test_ranking_metrics_cutoffs_and_grades(spark):
    """Graded rels use the linear Jarvelin gain rel/log2(rank+1) (ranx's
    ndcg default); hits beyond each cutoff contribute nothing."""
    from ragflow_spark.ops.quality import ranking_metrics

    ranked = spark.createDataFrame(
        [("Q", 1, "lo"), ("Q", 6, "hi"), ("Q", 11, "out")],
        "query_id string, rank int, doc_id string",
    )
    qrels = spark.createDataFrame(
        [("Q", "hi", 2), ("Q", "lo", 1), ("Q", "out", 1)],
        "query_id string, doc_id string, rel int",
    )
    out = {r["metric"]: r["value_r6"]
           for r in ranking_metrics(ranked, qrels).collect()}
    import math

    l2 = math.log2
    dcg = 1 / l2(2) + 2 / l2(7)  # rank-11 hit is past ndcg@10
    idcg = 2 / l2(2) + 1 / l2(3) + 1 / l2(4)
    assert abs(out["ndcg@10"] - round(dcg / idcg, 6)) < 1e-6, out
    # only the rank-1 hit is inside map@5; 3 relevant docs
    assert abs(out["map@5"] - round(1.0 / 3, 6)) < 1e-6, out
    assert abs(out["mrr@10"] - 1.0) < 1e-6, out


def test_retrieval_quality_corpus(spark):
    """Fused hybrid ranking largely preserves dense top-3 relevance on the
    sandbox corpus (0.95 weight on cosine → metrics near 1)."""
    from ragflow_spark.ops.quality import retrieval_quality

    out = {r["metric"]: r["value_r6"]
           for r in retrieval_quality(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"ndcg@10", "map@5", "mrr@10"}
    for k, v in out.items():
        assert 0.5 < v <= 1.0, (k, v)


def test_ranking_metrics_random_vs_python_reference(spark):
    """40 seeded-random queries (varying depths, grades, misses, ties) in
    ONE evaluation, cross-checked against an independent pure-python
    implementation of ndcg@10/map@5/mrr@10."""
    import math
    import random

    from ragflow_spark.ops.quality import ranking_metrics

    rng = random.Random(42)
    ranked_rows, qrel_rows = [], []
    py_ndcg, py_map, py_mrr = [], [], []
    for qi in range(40):
        q = f"q{qi}"
        docs = [f"d{qi}_{j}" for j in range(rng.randint(1, 15))]
        ranking = docs[:]
        rng.shuffle(ranking)
        ranked_rows += [(q, r + 1, d) for r, d in enumerate(ranking)]
        rels = {
            d: rng.randint(1, 3)
            for d in docs + [f"x{qi}_{j}" for j in range(rng.randint(0, 3))]
            if rng.random() < 0.5
        }
        if not rels:  # query absent from qrels: excluded from the universe
            continue
        qrel_rows += [(q, d, r) for d, r in rels.items()]
        # python reference
        pos = {d: i + 1 for i, d in enumerate(ranking)}
        dcg = sum(
            rels[d] / math.log2(pos[d] + 1)
            for d in rels
            if d in pos and pos[d] <= 10
        )
        ideal = sorted(rels.values(), reverse=True)[:10]
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
        py_ndcg.append(dcg / idcg)
        hits_sorted = sorted(pos[d] for d in rels if d in pos)
        py_map.append(
            sum(
                (i + 1) / r
                for i, r in enumerate(hits_sorted)
                if r <= 5
            )
            / len(rels)
        )
        py_mrr.append(
            1.0 / hits_sorted[0]
            if hits_sorted and hits_sorted[0] <= 10
            else 0.0
        )
    ranked = spark.createDataFrame(
        ranked_rows, "query_id string, rank int, doc_id string"
    )
    qrels = spark.createDataFrame(
        qrel_rows, "query_id string, doc_id string, rel int"
    )
    out = {r["metric"]: r["value_r6"]
           for r in ranking_metrics(ranked, qrels).collect()}
    assert abs(out["ndcg@10"] - round(sum(py_ndcg) / len(py_ndcg), 6)) < 2e-6
    assert abs(out["map@5"] - round(sum(py_map) / len(py_map), 6)) < 2e-6
    assert abs(out["mrr@10"] - round(sum(py_mrr) / len(py_mrr), 6)) < 2e-6
