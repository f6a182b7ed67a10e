"""The correctness gate (FIXTURES.md §2): the Spark pipeline must equal the
single-doc pandas oracle on every fixture document under span-sequence
equality (kind, text, media_ref, order) — and be invariant to partitioning
(catches nondeterminism / salting bugs)."""

import pytest

from ragflow_spark.datagen import corpus_df, gen_docs
from ragflow_spark.kernels.extract import chunk_doc, extract_doc
from ragflow_spark.operators.extract import chunk_stage, extract_spans

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def docs(spark):
    df = corpus_df(spark, seed=SEED, count=N_DOCS, giant_factor=60, partitions=6)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def oracle_spans():
    golden = {}
    for d in gen_docs(SEED, 0, N_DOCS, giant_factor=60):
        golden[d["doc_id"]] = [
            (o["seq"], o["kind"], o["text"], o["media_ref"])
            for o in extract_doc(d["spans"])
        ]
    return golden


def collect_spans(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append((r.seq, r.kind, r.text, r.media_ref))
    for v in out.values():
        v.sort()
    return out


def test_spark_equals_oracle(spark, docs, oracle_spans):
    got = collect_spans(extract_spans(docs))
    assert set(got) == set(oracle_spans)
    for doc_id in sorted(oracle_spans):
        assert got[doc_id] == oracle_spans[doc_id], f"span mismatch in {doc_id}"


def test_partition_invariance(spark, docs, oracle_spans):
    """Same result at a different parallelism / salt layout — the engine's
    stand-in for the local[2]-vs-local[8] determinism property."""
    got = collect_spans(extract_spans(docs.repartition(17), salt_block=7))
    assert got == oracle_spans


def test_exploded_path_equals_whole_doc_path(spark, docs, oracle_spans):
    """The zero-shuffle whole-doc path and the explode→salt→regroup giant
    path are interchangeable physical plans for identical semantics."""
    exploded = collect_spans(extract_spans(docs, giant_threshold=0))
    assert exploded == oracle_spans
    routed = collect_spans(extract_spans(docs, giant_threshold=50))
    assert routed == oracle_spans


def test_fused_chunks_equal_staged(spark, docs):
    from ragflow_spark.operators.extract import extract_chunks_fused

    staged = {
        (r.doc_id, r.chunk_seq, r.text, r.token_count, tuple(r.media_refs or []))
        for r in chunk_stage(extract_spans(docs), chunker="naive").collect()
    }
    fused = {
        (r.doc_id, r.chunk_seq, r.text, r.token_count, tuple(r.media_refs or []))
        for r in extract_chunks_fused(docs, chunker="naive").collect()
    }
    assert fused == staged


def test_chunk_stage_equals_oracle(spark, docs, oracle_spans):
    spans_df = extract_spans(docs).cache()
    got = {}
    for r in chunk_stage(spans_df, chunker="naive", chunk_token_num=128).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_seq, r.text, r.token_count, tuple(r.media_refs or [])))
    for v in got.values():
        v.sort()
    for doc_id, spans in oracle_spans.items():
        spans_dicts = [
            {"seq": s, "kind": k, "text": t, "media_ref": m} for s, k, t, m in spans
        ]
        expected = [
            (c["chunk_seq"], c["text"], c["token_count"], tuple(c["media_refs"]))
            for c in chunk_doc(spans_dicts, "naive", 128)
        ]
        assert got.get(doc_id, []) == expected, f"chunk mismatch in {doc_id}"
    spans_df.unpersist()


def test_all_profiles_nonempty(spark, docs):
    from ragflow_spark.datagen import profile_of

    got = collect_spans(extract_spans(docs))
    by_profile = {}
    for doc_id, spans in got.items():
        idx = int(doc_id.split("-")[1])
        by_profile.setdefault(profile_of(idx), []).append(len(spans))
    for prof, counts in by_profile.items():
        assert all(c > 0 for c in counts), f"profile {prof} produced empty docs"
    assert len(by_profile) == 8


def test_md_embedded_html_table_fixture(spark):
    """Markdown with a pasted HTML table (all three wrapper cases,
    markdown_parser.py:68-106): the distributed strip path must equal the
    single-doc kernel and surface each table verbatim as kind='table' in
    document order."""
    cell = "<table><tr><td>alpha</td><td>7</td></tr></table>"
    md = (
        "# heading one\nintro body line\n\n"
        f"{cell}\n"
        "middle text line\n"
        f"<body>{cell}</body>\n"
        f"<html><body>{cell}</body></html>\n"
        "tail line\n"
    )
    spans = [{"kind": "md", "text": md, "media_ref": "", "offset": 0}]
    df = spark.createDataFrame(
        [("mdh-1", [("md", md, "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = collect_spans(extract_spans(df))["mdh-1"]
    expected = [
        (o["seq"], o["kind"], o["text"], o["media_ref"])
        for o in extract_doc(spans)
    ]
    assert got == expected
    tables = [t for _, k, t, _ in got if k == "table"]
    assert cell in tables                       # bare table, verbatim
    assert f"<body>{cell}</body>" in tables     # body wrapper
    assert f"<html><body>{cell}</body></html>" in tables
    # order preserved: the bare table precedes the middle text line
    kinds_texts = [(k, t) for _, k, t, _ in got]
    assert kinds_texts.index(("table", cell)) < kinds_texts.index(
        ("text", "middle text line")
    )


def test_vectorized_plain_finalize_equals_kernel(spark):
    """The no-geometry vectorized finalize fast path (r5,
    operators/extract._finalize_plain_vectorized) must equal finalize_doc
    on its edge rows: garbage kinds, empty/None texts, plain blob refs,
    table-header kind mapping, out-of-order offsets."""
    spans = [
        {"kind": "text", "text": "last", "media_ref": "", "offset": 5},
        {"kind": "header", "text": "running head", "media_ref": "", "offset": 0},
        {"kind": "title", "text": "Title", "media_ref": "", "offset": 1},
        {"kind": "text", "text": None, "media_ref": "", "offset": 2},
        {"kind": "figure", "text": "", "media_ref": "blob://d/0", "offset": 3},
        {"kind": "table header", "text": "h1", "media_ref": "", "offset": 4},
        {"kind": "footer", "text": "page", "media_ref": "", "offset": 6},
        {"kind": "text", "text": "  ", "media_ref": "", "offset": 7},
        {"kind": "reference", "text": "refs", "media_ref": "", "offset": 8},
    ]
    docs = spark.createDataFrame(
        [("d0", [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in spans])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    # giant_threshold=0 forces explode → strip → finalize_stage (the stage
    # holding the vectorized path; this doc has no geometry rows)
    got = collect_spans(extract_spans(docs, giant_threshold=0))["d0"]
    exp = [
        (o["seq"], o["kind"], o["text"], o["media_ref"])
        for o in extract_doc(spans)
    ]
    assert got == exp
    assert [k for _, k, _, _ in got] == ["title", "figure", "table", "text"]
