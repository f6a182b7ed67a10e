"""End-to-end golden documents: complete hand-written inputs with fully
hand-computed expected span sequences through extract_doc (the single-doc
oracle that every Spark physical path must equal).

These pin the kernel-vs-reference semantics independently of the pipeline
equality tests (which only prove distributed plumbing preserves the
kernel): each expectation below was derived by hand from the documented
reference behavior (SURVEY.md §2.2/§2.4 with deepdoc file:line cites), not
by running the code.
"""

from __future__ import annotations

from ragflow_spark.kernels.extract import chunk_doc, extract_doc
from ragflow_spark.schemas import Geom, pack_geom


def g(pn, x0, x1, top, bottom, lo=-1, blob=None):
    return pack_geom(Geom(pn, x0, x1, top, bottom, lo), blob=blob)


def span(kind, text, media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_golden_pdf_table_figure_doc():
    """One page: title, body, captioned 2x2 table (header row H-tagged),
    credit line (dropped), figure with caption, junk page number (dropped),
    repeated footer (dropped), margin scrap (dropped)."""
    spans = [
        span("title", "Annual results", g(0, 72, 300, 72, 82), 0),
        span("footer", "Conf footer", g(0, 72, 200, 760, 772), 1),
        span("footer", "Conf footer", g(0, 72, 200, 780, 790), 2),  # repeated
        span("text", "1 / 2", g(0, 280, 330, 775, 785), 3),  # junk
        span("text", "Revenue grew strongly this year.", g(0, 72, 500, 100, 110), 4),
        span("table caption", "Table 1: revenue", g(0, 90, 300, 128, 138), 5),
        # 2x2 table, region lo=0, header row tagged
        span("table header", "region", g(0, 90, 180, 142, 152, 0), 6),
        span("table header", "value", g(0, 190, 280, 142, 152, 0), 7),
        span("table", "north", g(0, 90, 180, 156, 166, 0), 8),
        span("table", "120", g(0, 190, 280, 156, 166, 0), 9),
        span("table", "数据来源: internal", g(0, 90, 200, 170, 180, 0), 10),  # credit
        span("figure", "", g(0, 150, 400, 220, 300, 1, blob="blob://gold/0"), 11),
        span("figure caption", "Figure 1: trend", g(0, 150, 400, 306, 316), 12),
        span("text", "Closing remarks are brief.", g(0, 72, 500, 340, 350), 13),
        span("text", "rev 7", g(0, 545, 585, 105, 115), 14),  # margin scrap
    ]
    out = extract_doc(spans)
    got = [(o["kind"], o["text"], o["media_ref"]) for o in out]
    # hand-derived: footer pair dropped (garbage), junk page-number dropped,
    # credit dropped, scrap dropped; table renders with H-tagged headers and
    # the caption as a per-row suffix; figure keeps caption + blob ref.
    assert got == [
        ("title", "Annual results", ""),
        ("text", "Revenue grew strongly this year.", ""),
        ("table", "region：north; value：120\t—— in “Table 1: revenue”", ""),
        # blob refs keep their #geom fragment (part of the opaque fixture
        # ref, schemas.py strip_geom contract)
        ("figure", "Figure 1: trend", "blob://gold/0#geom=0,150,400,220,300,1"),
        ("text", "Closing remarks are brief.", ""),
    ]
    # seq is dense from 0 in reading order
    assert [o["seq"] for o in out] == [0, 1, 2, 3, 4]


def test_golden_book_doc_chunking():
    """Plain bulleted book: ToC dropped by prefix match, chapters chunked
    hierarchically with the chapter title chained above its body."""
    lines = [
        "Contents",
        "Chapter 1 Basics ..... 3",
        "Chapter 2 Advanced ..... 9",
        "Chapter 1 Basics",
        "The first chapter body explains the basics of the system in detail.",
        "Chapter 2 Advanced",
        "The second chapter body covers advanced usage patterns thoroughly.",
    ]
    spans = [span("txt", t, "", i) for i, t in enumerate(lines)]
    out = extract_doc(spans)
    # plain (non-geometry) docs pass extraction verbatim; ToC removal for
    # them is the BOOK CHUNKER's remove_contents_table (rag/nlp/
    # __init__.py:347-376), mirroring the reference's string-level twin
    assert [o["text"] for o in out] == lines
    chunks = chunk_doc(out, chunker="book")
    joined = [c["text"] for c in chunks]
    assert any("Chapter 1 Basics" in c and "first chapter body" in c for c in joined)
    assert any("Chapter 2 Advanced" in c and "second chapter body" in c for c in joined)
    # the ToC block (heading + dot-leader entries) is gone from every chunk
    all_text = "\n".join(joined)
    assert "....." not in all_text and "Contents" not in all_text


def test_golden_html_doc():
    """HTML boilerplate strip: nav/sidebar/footer link farms vanish, the
    title and article paragraphs survive in order."""
    html = (
        "<html><head><title>Engine design</title></head><body>"
        '<div class="navbar menu"><ul>'
        + "".join(f'<li><a href="/n/{i}">nav{i}</a></li>' for i in range(8))
        + "</ul></div>"
        '<div class="article content"><h1>Engine design</h1>'
        "<p>The engine reads interleaved spans and extracts main content. "
        "It preserves order and media references faithfully.</p>"
        "<p>A second paragraph describes chunking with token budgets.</p></div>"
        '<div class="footer">'
        + "".join(f'<a href="/f/{i}">foot{i}</a>' for i in range(6))
        + "</div></body></html>"
    )
    out = extract_doc([span("html", html, "", 0)])
    texts = [o["text"] for o in out]
    assert out[0]["kind"] == "title" and texts[0] == "Engine design"
    body = "\n".join(texts[1:])
    assert "interleaved spans" in body and "second paragraph" in body
    assert "nav3" not in body and "foot2" not in body


def test_golden_two_column_reading_order():
    """Interleaved two-column emission is re-serialized column-major."""
    spans = []
    off = 0
    for line in range(3):
        for col, x0 in ((0, 54.0), (1, 320.0)):
            spans.append(
                span(
                    "text",
                    f"c{col}l{line},",  # trailing comma: no vertical merges
                    g(0, x0, x0 + 230, 100 + line * 14, 110 + line * 14),
                    off,
                )
            )
            off += 1
    out = extract_doc(spans)
    # column-major; the concat feature (trailing comma) merges within a
    # column — all c0 lines precede all c1 lines either way
    joined = " ".join(o["text"] for o in out)
    assert joined.index("c0l2") < joined.index("c1l0")
    assert [joined.index(f"c0l{i}") for i in range(3)] == sorted(
        joined.index(f"c0l{i}") for i in range(3)
    )
