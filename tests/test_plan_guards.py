"""Physical-plan regression guards for the round-5 fixes: these pin plan
SHAPES that silently regressed before (AQE re-coalescing the salted strip
shuffle; the bounded default query batch reaching the scan)."""

from __future__ import annotations

import re


def test_strip_stage_salted_repartition_has_explicit_count(spark):
    """The salted exploded-path shuffle must be RepartitionByExpression
    WITH an explicit numPartitions — a bare column repartition is
    AQE-coalescible and got folded to ONE partition for byte-small/
    CPU-huge giant-doc span sets (r5 skew bench, straggler cut 5.8x
    after pinning)."""
    from ragflow_spark.operators.extract import explode_spans, strip_stage

    docs = spark.createDataFrame(
        [("d0", [("txt", "hello world", "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    plan = (
        strip_stage(explode_spans(docs))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    m = re.search(r"RepartitionByExpression \[[^\]]*salt[^\]]*\], (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) > 0


def test_knn_default_batch_predicates_reach_scan(spark):
    """The default query batch's stride AND cap must land in the
    query-side embeddings scan as data filters (the cap is what makes
    the batch fixed-size at any corpus scale)."""
    from ragflow_spark.ops.similarity import knn_bruteforce

    s = (
        knn_bruteforce(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .toString()
    )
    assert re.search(r"vec_id#\d+L % 100\) = 0", s), "stride not in scan"
    assert re.search(r"vec_id#\d+L < 1600", s), "cap not in scan"
