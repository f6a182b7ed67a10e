"""Property-based tests (SURVEY.md §5.2): chunk budgets, order preservation,
merge idempotence, token-counter invariants. Pure-kernel (no Spark) so
hypothesis can run hundreds of examples quickly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ragflow_spark.functions.tokens import num_tokens, truncate
from ragflow_spark.kernels.chunkers import naive_merge
from ragflow_spark.kernels.layout import vertical_merge
from ragflow_spark.kernels.extract import extract_doc

WORDS = st.text(
    alphabet="abcdefgh 数据提取。.!?,;", min_size=0, max_size=60
)


@settings(max_examples=200, deadline=None)
@given(st.lists(WORDS, max_size=30), st.integers(8, 256))
def test_naive_merge_budget(sections, budget):
    """Every produced chunk stays within budget + one section's tokens (the
    greedy rule closes a chunk only after it exceeded budget — reference
    rag/nlp/__init__.py:538-541), and no text is lost."""
    chunks = naive_merge(sections, budget, "\n。；！？")
    for c in chunks:
        # a chunk can overshoot by at most the last added piece; a piece is
        # either a whole section under budget or a delimiter-split fragment
        assert num_tokens(c) <= budget + max(
            [num_tokens(s) for s in sections] + [0]
        )
    assert "".join(chunks).replace("\n", "") != "" or all(
        not s.strip() for s in sections
    )


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc 数据.!", max_size=200), st.integers(0, 50))
def test_truncate_budget(s, k):
    t = truncate(s, k)
    assert num_tokens(t) <= k
    assert s.startswith(t)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["text", "title"]), WORDS), max_size=15))
def test_extract_doc_deterministic_and_dense(kind_texts):
    spans = [
        {"kind": k, "text": t, "media_ref": "", "offset": i}
        for i, (k, t) in enumerate(kind_texts)
    ]
    a = extract_doc(spans)
    b = extract_doc(list(reversed(spans)))  # offset order restored internally
    assert a == b
    assert [o["seq"] for o in a] == list(range(len(a)))


def _mk_box(i, text, pn=0):
    top = 72.0 + i * 14.0
    return {
        "kind": "text", "text": text, "media_ref": "",
        "pn": pn, "x0": 72.0, "x1": 500.0, "top": top, "bottom": top + 10.0,
        "lo": -1,
    }


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["alpha beta", "gamma.", "delta!"]), min_size=1, max_size=12))
def test_vertical_merge_idempotent(texts):
    boxes = [_mk_box(i, t) for i, t in enumerate(texts)]
    once = vertical_merge([dict(b) for b in boxes], True)
    twice = vertical_merge([dict(b) for b in once], True)
    assert [b["text"] for b in once] == [b["text"] for b in twice]


BOX_STRAT = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "title", "table", "table header"]),
        "text": st.text(alphabet="abcd 12.", min_size=1, max_size=20),
        "media_ref": st.just(""),
        "pn": st.integers(0, 2),
        "x0": st.floats(0, 500, allow_nan=False),
        "top": st.floats(0, 700, allow_nan=False),
        "lo": st.integers(-1, 3),
    }
).map(
    lambda d: {
        **d,
        "x1": d["x0"] + 40.0,
        "bottom": d["top"] + 10.0,
    }
)


@settings(max_examples=100, deadline=None)
@given(st.lists(BOX_STRAT, max_size=20))
def test_filter_scraps_subset_and_order(boxes):
    """Scrap filter never invents boxes and preserves reading order."""
    from ragflow_spark.kernels.layout import filter_scraps

    out = filter_scraps([dict(b) for b in boxes])
    ids = [id(b) for b in boxes]
    # every kept box is one of the inputs (by identity of the copies we
    # passed) and appears in the original relative order
    texts_in = [b["text"] for b in boxes]
    texts_out = [b["text"] for b in out]
    # multiset subset
    from collections import Counter

    assert not (Counter(texts_out) - Counter(texts_in))
    # order: out is a subsequence of in (by positional matching)
    it = iter(range(len(boxes)))
    for t in texts_out:
        for i in it:
            if boxes[i]["text"] == t:
                break
        else:
            raise AssertionError("order not preserved")


@settings(max_examples=100, deadline=None)
@given(st.lists(BOX_STRAT, max_size=16))
def test_layouts_cleanup_invariants(boxes):
    """NMS region dedup is deterministic, never invents boxes, and leaves
    no same-text heavily-overlapping pair inside one merged region. (A
    second pass may merge further — region merges can create new overlaps;
    the reference's single far-window pass behaves the same.)"""
    from collections import Counter

    from ragflow_spark.kernels.layout import layouts_cleanup, overlapped_area

    once = layouts_cleanup([dict(b) for b in boxes])
    again = layouts_cleanup([dict(b) for b in boxes])
    assert [(b["text"], b["lo"]) for b in once] == [
        (b["text"], b["lo"]) for b in again
    ]
    assert not (
        Counter(b["text"] for b in once) - Counter(b["text"] for b in boxes)
    )
    # untagged boxes always pass through untouched
    assert [b["text"] for b in once if b["lo"] < 0] == [
        b["text"] for b in boxes if b["lo"] < 0
    ]
    assert overlapped_area  # imported for doc purposes of the invariant


@settings(max_examples=100, deadline=None)
@given(st.lists(BOX_STRAT.filter(lambda b: b["kind"] in ("table", "table header")), max_size=12))
def test_construct_table_total_and_deterministic(cells):
    """construct_table never crashes, is deterministic, and html mode always
    yields a well-formed <table> wrapper when any cell has text."""
    from ragflow_spark.kernels.assemble import construct_table

    a = construct_table([dict(c) for c in cells])
    b = construct_table([dict(c) for c in cells])
    assert a == b
    html = construct_table([dict(c) for c in cells], html=True)
    if any((c["text"] or "").strip() for c in cells):
        assert html.startswith("<table>") and html.endswith("</table>")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="ab,\tcd ", max_size=15), max_size=12))
def test_qa_tabular_conserves_fields(lines):
    """Every emitted question/answer fragment originates from the input."""
    from ragflow_spark.kernels.chunkers import qa_pairs_tabular

    pairs = qa_pairs_tabular(lines)
    blob = "\n".join(lines)
    for q, a in pairs:
        for frag in [q] + a.split("\n"):
            assert frag == "" or frag in blob


@settings(max_examples=150, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=20))
def test_manual_chunk_conserves_text(sections):
    """The manual fold only glues or breaks — joined chunk text equals the
    joined section text (no loss, no reorder, no duplication)."""
    from ragflow_spark.kernels.chunkers import manual_chunk

    secs = [(s, "text") for s in sections]
    chunks = manual_chunk(secs)
    assert "\n".join(chunks) == "\n".join(sections)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["txt", "figure"]),
            st.text(alphabet="abcdefg 12.%\n", max_size=40),
            st.sampled_from(["", "m1", "m2"]),
        ),
        max_size=12,
    )
)
def test_presentation_chunk_invariants(spans):
    """Every surviving line is a non-garbage line of the input, in order;
    every media ref of a figure span with a ref appears exactly once."""
    import re as _re

    from ragflow_spark.kernels.chunkers import presentation_chunk

    texts, refs = presentation_chunk(spans)
    assert len(texts) == len(refs)
    garbage = _re.compile(r"[0-9.,%/-]+$")
    src_lines = [
        ln
        for _, text, _ in spans
        for ln in (text or "").split("\n")
        if ln.strip()
        and len(ln.strip().lower()) >= 3
        and not garbage.match(ln.strip().lower())
    ]
    out_lines = [ln for t in texts for ln in t.split("\n") if ln]
    assert out_lines == src_lines
    want_refs = [r for k, _, r in spans if k == "figure" and r]
    got_refs = [r for rs in refs for r in rs]
    assert got_refs == want_refs


# ---------------------------------------------------------- r5 fuzz props

_KINDS = st.sampled_from(
    ["text", "title", "table", "table header", "figure", "header",
     "footer", "table caption", "figure caption", "html", "txt", "md",
     "json"]
)
_REFS = st.one_of(
    st.just(""),
    st.just("geom://0,50,200,100,112"),
    st.just("geom://1,30,580,700,712,2"),
    st.just("geom://bad"),                      # malformed → plain row
    st.just("blob://d/1#geom=0,50,550,100,200,1"),
    st.just("blob://d/2"),
)
_SPAN = st.builds(
    lambda k, t, r, o: {"kind": k, "text": t, "media_ref": r, "offset": o},
    _KINDS,
    st.one_of(st.none(), WORDS),
    _REFS,
    st.integers(0, 40),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_SPAN, max_size=25))
def test_extract_doc_fuzz_total_and_deterministic(spans):
    """extract_doc must be TOTAL over the span vocabulary (random kinds,
    None/unicode texts, malformed geometry) and a pure function of its
    input — the per-row north-rule invariant, fuzzed beyond fixtures."""
    out1 = extract_doc([dict(s) for s in spans])
    out2 = extract_doc([dict(s) for s in spans])
    assert out1 == out2
    assert [o["seq"] for o in out1] == list(range(len(out1)))
    for o in out1:
        assert o["kind"] in ("text", "title", "table", "figure")
        assert not (o["media_ref"] or "").startswith("geom://")


_CELL = st.builds(
    lambda txt, col, row, h: {
        "kind": "table header" if h else "table",
        "text": txt,
        "media_ref": "",
        "pn": 0,
        "x0": 40.0 + 170 * col,
        "x1": 180.0 + 170 * col,
        "top": 90.0 + 25 * row,
        "bottom": 102.0 + 25 * row,
        "lo": 0,
    },
    st.text(alphabet="abcdefg hij-", min_size=1, max_size=12),
    st.integers(0, 4),
    st.integers(0, 5),
    st.booleans(),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_CELL, min_size=1, max_size=20), st.booleans())
def test_construct_table_fuzz_total(cells, html):
    """construct_table over random sparse grids (duplicate positions,
    all-header rows, singleton rows/cols triggering relocation) must
    never raise, and the html render must carry every distinct non-blank
    cell text."""
    from ragflow_spark.kernels.assemble import construct_table

    out = construct_table([dict(c) for c in cells], cap="cap x", html=html)
    assert isinstance(out, str)
    if html and out:
        for c in cells:
            t = c["text"].strip()
            if t:
                assert t in out
