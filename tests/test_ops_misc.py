"""Codec sniffing, whole-doc chunker, chunk ids."""

from __future__ import annotations

from ragflow_spark.datagen import corpus_df
from ragflow_spark.functions.encoding import decode_blob, find_codec
from ragflow_spark.operators.extract import (
    chunk_stage,
    extract_spans,
    with_chunk_ids,
)
from ragflow_spark.ops.assembly import one_chunk


def test_find_codec():
    assert find_codec("hello".encode()) == "utf-8"
    assert find_codec("数据分析".encode()) == "utf-8"
    # reference ladder order: gb2312 (a gb18030 subset) tried first and wins
    got = find_codec("数据".encode("gb18030"))
    assert "数据".encode("gb18030").decode(got) == "数据"
    assert find_codec(b"\xef\xbb\xbfabc") == "utf-8-sig"
    # arbitrary single bytes land on the first single-byte codec that
    # accepts them (cp037 in the reference's ladder) — decode never fails
    got = find_codec("caf\xe9".encode("latin-1"))
    assert isinstance("caf\xe9".encode("latin-1").decode(got), str)
    assert find_codec(b"") == "utf-8"
    # round trip through decode_blob never raises
    for blob in (b"\xff\xfeh\x00i\x00", b"\x80\x81\x82", "日本語".encode("shift_jis")):
        assert isinstance(decode_blob(blob), str)


def test_one_chunk_preserves_order(spark):
    docs = corpus_df(spark, seed=21, count=30).cache()
    spans = extract_spans(docs).cache()
    out = {r.doc_id: r.text for r in one_chunk(spans).collect()}
    per_doc = {}
    for r in spans.collect():
        per_doc.setdefault(r.doc_id, []).append((r.seq, r.text))
    for doc_id, items in per_doc.items():
        want = "\n".join(t for _, t in sorted(items))
        assert out[doc_id] == want


def test_chunk_ids_stable_and_unique_per_doc(spark):
    docs = corpus_df(spark, seed=21, count=30).cache()
    chunks = with_chunk_ids(chunk_stage(extract_spans(docs))).cache()
    a = {(r.doc_id, r.chunk_seq): r.chunk_id for r in chunks.collect()}
    b = {
        (r.doc_id, r.chunk_seq): r.chunk_id
        for r in with_chunk_ids(chunk_stage(extract_spans(docs))).collect()
    }
    assert a == b  # content-addressed: identical across runs
    assert all(isinstance(v, int) for v in a.values())


def test_query_build_strips_stopwords_and_boosts(spark):
    from ragflow_spark.ops import retrieval

    sf = "/root/testdata/sf0.001"
    out = retrieval.query_build(spark, sf).toPandas()
    assert set(out["term_type"]) == {"term", "phrase", "field"}
    terms = out[out.term_type == "term"]
    # rmWWW: english function words never survive as terms
    assert not (terms["term"].isin(["the", "is", "of", "what", "and"])).any()
    # normalized term boosts sum to ~1 per query
    sums = terms.groupby("query_id")["boost_r4"].sum()
    assert ((sums - 1.0).abs() < 0.01).all()
    fields = out[out.term_type == "field"]
    assert set(fields["term"]) == {f for f, _ in retrieval.QUERY_FIELDS}
    # phrase boost = 2x the max of its member terms (spot check shape)
    phrases = out[out.term_type == "phrase"]
    assert (phrases["boost_r4"] > 0).all()
    assert phrases["term"].str.contains(" ").all()


def test_term_weights_mix(spark):
    from ragflow_spark.ops import retrieval

    sf = "/root/testdata/sf0.001"
    out = retrieval.term_weights(spark, sf).toPandas()
    assert len(out) > 0
    sums = out.groupby("query_id")["weight_r6"].sum()
    assert ((sums - 1.0).abs() < 0.001).all()
    # rare tokens outweigh common ones within a query (idf-dominant mix)
    g = out.groupby("query_id")["weight_r6"]
    assert (g.max() > g.min()).any()
