"""Extraction robustness: degenerate and adversarial inputs must degrade
gracefully (row dropped or passed through), never fail the task."""

from __future__ import annotations

from ragflow_spark.kernels.extract import chunk_doc, extract_doc


def _span(kind, text, media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_empty_and_none_inputs():
    assert extract_doc([]) == []
    assert extract_doc([_span("text", None)]) == []  # empty text box dropped
    assert extract_doc([_span("txt", "")]) == []
    out = extract_doc([_span("text", "keep me")])
    assert [o["text"] for o in out] == ["keep me"]


def test_unicode_torture():
    nasty = "emoji 🎉 rtl ‮שלום‬ zero​width combining é 𝔘𝔫𝔦"
    out = extract_doc([_span("txt", nasty)])
    assert len(out) == 1 and out[0]["text"] == nasty
    chunks = chunk_doc(
        [{"seq": 0, "kind": "text", "text": nasty, "media_ref": ""}]
    )
    assert len(chunks) == 1 and chunks[0]["token_count"] > 0


def test_malformed_html_never_raises():
    cases = [
        "<div><p>unclosed",
        "<<<>>>",
        "<script>alert('x')</script>no body",
        "<table><tr><td>cell",
        "&nbsp;&amp;&bogus;",
        "<html>" + "<div>" * 300 + "deep" + "</div>" * 10,
    ]
    for html in cases:
        out = extract_doc([_span("html", html)])
        assert isinstance(out, list)


def test_malformed_json_degrades_to_text():
    out = extract_doc([_span("json", "{not valid json")])
    assert len(out) >= 1  # kept as plain text, not dropped


def test_giant_single_span():
    # with delimiters present, the over-budget section is pre-split
    # (rag/nlp/__init__.py:553-561)
    big = ("word other token. " * 30_000).strip()
    out = extract_doc([_span("txt", big)])
    assert len(out) == 1
    chunks = chunk_doc(
        [{"seq": 0, "kind": "text", "text": big, "media_ref": ""}],
        chunk_token_num=512,
        delimiter="\n!?。；！？.",
    )
    assert len(chunks) > 50
    assert all(c["token_count"] <= 1024 for c in chunks)
    # WITHOUT any delimiter match, the section stays whole — reference
    # parity (naive_merge splits only on the delimiter set)
    nodelim = "word " * 5000
    one = chunk_doc(
        [{"seq": 0, "kind": "text", "text": nodelim.strip(), "media_ref": ""}],
        chunk_token_num=512,
    )
    assert len(one) == 1


def test_mixed_geometry_and_plain_spans():
    spans = [
        _span("text", "geo line", "geom://0,72,300,100,110", 0),
        _span("txt", "plain line", "", 1),
        _span("figure", "", "blob://d/1#geom=0,100,200,300,400", 2),
    ]
    out = extract_doc(spans)
    texts = [o["text"] for o in out]
    assert "geo line" in texts and "plain line" in texts
    figs = [o for o in out if o["kind"] == "figure"]
    assert len(figs) == 1 and figs[0]["media_ref"].startswith("blob://")


def test_round2_kernels_degrade_gracefully():
    """Round-2 kernels on pathological inputs: empty/whitespace cells,
    zero-area boxes, table-header-only tables, all-scrap pages."""
    from ragflow_spark.kernels.assemble import construct_table
    from ragflow_spark.kernels.chunkers import (
        manual_chunk,
        qa_pairs_markdown,
        qa_pairs_pdf,
        qa_pairs_tabular,
        tag_pairs,
    )
    from ragflow_spark.kernels.layout import filter_scraps, layouts_cleanup

    def bx(text, kind="table", x0=90.0, x1=90.0, top=100.0, bottom=100.0, lo=0):
        return {"kind": kind, "text": text, "media_ref": "", "pn": 0,
                "x0": x0, "x1": x1, "top": top, "bottom": bottom, "lo": lo}

    assert construct_table([]) == ""
    assert construct_table([bx("  ")]) == ""
    # zero-area cells: thresholds floor at 1.0, no div-by-zero
    assert isinstance(construct_table([bx("a"), bx("b", top=100.5)]), str)
    # header-only table: header rows suppressed, no body rows -> desc empty
    hdr_only = [bx("h1", kind="table header"), bx("h2", kind="table header", x0=200, x1=290)]
    assert isinstance(construct_table(hdr_only), str)
    assert filter_scraps([]) == []
    assert layouts_cleanup([]) == []
    assert qa_pairs_tabular([]) == []
    assert qa_pairs_markdown([]) == []
    assert qa_pairs_pdf([]) == []
    assert tag_pairs([]) == []
    assert manual_chunk([]) == []


def test_extract_doc_malformed_media_spans():
    """Figure spans with malformed blob refs and empty text pass through
    without crashing the doc."""
    from ragflow_spark.kernels.extract import extract_doc

    spans = [
        {"kind": "figure", "text": "", "media_ref": "blob://broken", "offset": 0},
        {"kind": "text", "text": "real body text.", "media_ref": "", "offset": 1},
        {"kind": "table header", "text": "h", "media_ref": "", "offset": 2},
    ]
    out = extract_doc(spans)
    assert any(o["text"] == "real body text." for o in out)
