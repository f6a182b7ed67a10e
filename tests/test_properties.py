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
