"""HTML boilerplate stripping — a from-scratch readability-style scorer.

Reference behavior: RAGFlowHtmlParser (deepdoc/parser/html_parser.py:30-49)
delegates to the public arc90 readability algorithm (``readability.Document``)
and returns ``title + "\\n" + extract_text(summary)`` split on newlines. This
module reimplements the *published* algorithm's core from scratch on the
stdlib HTML parser: per-node text/comma scoring propagated to parents,
class/id weighting, link-density discount, best-candidate extraction.

No code is taken from the reference or from readability-lxml; only the
publicly documented heuristic (text density + link density + class hints).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

UNLIKELY = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|remark|rss|"
    r"shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|tweet|twitter|navbar|nav\b",
    re.I,
)
MAYBE = re.compile(r"and|article|body|column|main|shadow", re.I)
POSITIVE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|story", re.I
)
NEGATIVE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|"
    r"outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget",
    re.I,
)

_VOID = {"br", "img", "hr", "input", "meta", "link", "area", "base", "col", "embed",
         "source", "track", "wbr"}
_SKIP = {"script", "style", "noscript", "template", "iframe", "svg"}
_BLOCK = {"p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6", "tr",
          "table", "blockquote", "pre", "section", "article", "br", "dd", "dt",
          "figure", "figcaption"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "score")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str
        self.parent = parent
        self.score: float | None = None

    @property
    def class_id(self) -> str:
        return (self.attrs.get("class", "") + " " + self.attrs.get("id", "")).strip()

    def iter_nodes(self):
        yield self
        for c in self.children:
            if isinstance(c, _Node):
                yield from c.iter_nodes()

    def inner_text(self) -> str:
        parts: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in _SKIP:
                parts.append(c.inner_text())
        return " ".join(p for p in parts if p.strip())

    def link_text_len(self) -> int:
        n = 0
        for c in self.children:
            if isinstance(c, _Node):
                if c.tag == "a":
                    n += len(c.inner_text())
                else:
                    n += c.link_text_len()
        return n


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("html", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            self.cur.children.append(_Node(tag, dict(attrs), self.cur))
            return
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_endtag(self, tag):
        # walk up to nearest matching open tag (tolerant of bad nesting)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def _class_weight(node: _Node) -> float:
    w = 0.0
    s = node.class_id
    if s:
        if NEGATIVE.search(s):
            w -= 25
        if POSITIVE.search(s):
            w += 25
    return w


def _init_score(node: _Node) -> float:
    base = {
        "div": 5.0, "article": 5.0, "section": 5.0,
        "pre": 3.0, "td": 3.0, "blockquote": 3.0,
        "address": -3.0, "ul": -3.0, "ol": -3.0, "li": -3.0,
        "dl": -3.0, "dd": -3.0, "dt": -3.0, "form": -3.0,
        "th": -5.0, "h1": -5.0, "h2": -5.0, "h3": -5.0,
        "h4": -5.0, "h5": -5.0, "h6": -5.0,
    }.get(node.tag, 0.0)
    return base + _class_weight(node)


def _link_density(node: _Node) -> float:
    total = len(node.inner_text())
    if total == 0:
        return 0.0
    return min(1.0, node.link_text_len() / total)


def _extract_blocks(node: _Node, out: list[str], buf: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            buf.append(c)
        elif c.tag in _SKIP:
            continue
        elif c.tag in _BLOCK:
            _flush(out, buf)
            _extract_blocks(c, out, buf)
            _flush(out, buf)
        else:
            _extract_blocks(c, out, buf)


def _flush(out: list[str], buf: list[str]) -> None:
    txt = re.sub(r"\s+", " ", " ".join(buf)).strip()
    buf.clear()
    if txt:
        out.append(txt)


def html_main_content(html: str) -> tuple[str, list[str]]:
    """(title, content_lines) — the engine's analog of
    ``title + extract_text(Document(txt).summary())`` split on newlines
    (deepdoc/parser/html_parser.py:44-49)."""
    tb = _TreeBuilder()
    try:
        tb.feed(unescape_safe(html))
        tb.close()
    except Exception:
        return "", [re.sub(r"<[^>]+>", " ", html).strip()]
    root = tb.root

    title = ""
    for n in root.iter_nodes():
        if n.tag == "title":
            title = re.sub(r"\s+", " ", n.inner_text()).strip()
            break

    # 1. drop unlikely-candidate containers by class/id hint
    def prune(node: _Node) -> None:
        kept = []
        for c in node.children:
            if isinstance(c, _Node):
                s = c.class_id
                if (
                    c.tag not in ("body", "html", "a")
                    and s
                    and UNLIKELY.search(s)
                    and not MAYBE.search(s)
                ):
                    continue
                if c.tag in _SKIP or c.tag == "head":
                    continue
                prune(c)
            kept.append(c)
        node.children = kept

    prune(root)

    # 2. score paragraph-ish nodes into their ancestors
    candidates: dict[int, tuple[_Node, float]] = {}

    def bump(node: _Node, pts: float) -> None:
        if node is None or node.tag in ("html",):
            return
        key = id(node)
        if key not in candidates:
            candidates[key] = (node, _init_score(node))
        n, s = candidates[key]
        candidates[key] = (n, s + pts)

    for n in root.iter_nodes():
        if n.tag not in ("p", "td", "pre"):
            continue
        txt = n.inner_text()
        if len(txt) < 25:
            continue
        pts = 1.0 + txt.count(",") + txt.count("，") + min(len(txt) // 100, 3)
        if n.parent is not None:
            bump(n.parent, pts)
            if n.parent.parent is not None:
                bump(n.parent.parent, pts / 2.0)

    best: _Node | None = None
    best_score = -1e18
    for node, s in candidates.values():
        final = s * (1.0 - _link_density(node))
        if final > best_score:
            best, best_score = node, final

    if best is None:
        # fall back to <body> (or the whole tree)
        for n in root.iter_nodes():
            if n.tag == "body":
                best = n
                break
        best = best or root

    out: list[str] = []
    buf: list[str] = []
    _extract_blocks(best, out, buf)
    _flush(out, buf)
    return title, out


def unescape_safe(html: str) -> str:
    # HTMLParser(convert_charrefs=True) already unescapes character refs in
    # data; avoid double-unescaping by passing raw html through. Kept as a
    # hook for codec sniffing on raw-bytes ingestion (rag/nlp/__init__.py:32-71).
    return html


def html_to_sections(html: str) -> list[str]:
    """Reference contract: ``f"{title}\\n{content}"`` split on "\\n", empties
    removed by the caller (html_parser.py:47-49, book.py:111-112)."""
    title, lines = html_main_content(html)
    return [s for s in ([title] + lines) if s and s.strip()]
