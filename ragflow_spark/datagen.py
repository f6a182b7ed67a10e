"""Deterministic synthetic ``docs_interleaved`` corpus (FIXTURES.md §1).

Every document is a pure function of ``(seed, doc_index)`` — no wall clock, no
global RNG. Profiles mirror the fixture spec: html_boiler 20%, pdf_single_col
20%, pdf_two_col 15%, pdf_tablefig 15%, book_bulleted 10%, paper_shape 10%,
plain_formats 5%, giant_doc 5%.

The generator runs both on the driver (tiny pytest corpora) and inside
mapInPandas partitions (bench corpora) — it only needs the doc index range.
"""

from __future__ import annotations

import random

from ragflow_spark.schemas import PAGE_H, PAGE_W, Geom, pack_geom

# bump when generated content changes for the same (seed, doc_index) —
# cached corpus directories are keyed on this (entry's _corpus_path)
CORPUS_VERSION = 7  # v7: embedded HTML tables in half the md docs

PROFILES = [
    ("html_boiler", 20),
    ("pdf_single_col", 20),
    ("pdf_two_col", 15),
    ("pdf_tablefig", 15),
    ("book_bulleted", 10),
    ("paper_shape", 10),
    ("plain_formats", 5),
    ("giant_doc", 5),
]
_CUM = []
_acc = 0
for _name, _w in PROFILES:
    _acc += _w
    _CUM.append((_acc, _name))

WORDS = (
    "data span table merge layout column page text title chunk token stream "
    "engine parse extract figure caption region detect order sort filter index "
    "shuffle partition broadcast salt skew vector batch arrow pandas spark "
    "iceberg snapshot lineage metric resume cluster executor driver memory "
    "analysis content document boiler strip density link comma heading bullet "
    "section level budget overlap window group join scan pipeline stage"
).split()

CJK_CHARS = "数据分析提取内容文档标题段落表格图片章节条款合并分块令牌预算流水线引擎"


def profile_of(doc_index: int) -> str:
    r = doc_index % 100
    for cum, name in _CUM:
        if r < cum:
            return name
    return "html_boiler"


def _rng(seed: int, doc_index: int) -> random.Random:
    return random.Random((seed << 32) ^ (doc_index * 2654435761 % (1 << 61)))


def _sentence(r: random.Random, lo: int = 6, hi: int = 14, end: str = ".") -> str:
    n = r.randint(lo, hi)
    ws = [r.choice(WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + end


def _cjk_sentence(r: random.Random, lo: int = 8, hi: int = 20) -> str:
    n = r.randint(lo, hi)
    return "".join(r.choice(CJK_CHARS) for _ in range(n)) + "。"


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# ---------------------------------------------------------------- profiles

def _gen_html_boiler(doc_id: str, r: random.Random) -> list[dict]:
    title = _sentence(r, 3, 6, end="")
    nav_links = "".join(
        f'<li><a href="/x/{i}">{r.choice(WORDS)}</a></li>' for i in range(r.randint(6, 12))
    )
    side_links = "".join(
        f'<a href="/t/{i}">{r.choice(WORDS)} {r.choice(WORDS)}</a> ' for i in range(r.randint(5, 10))
    )
    paras = []
    for _ in range(r.randint(3, 8)):
        sents = [_sentence(r, 8, 16, end=r.choice([".", ".", ",", "."])) for _ in range(r.randint(2, 5))]
        paras.append("<p>" + " ".join(sents) + "</p>")
    body = "\n".join(paras)
    footer_links = "".join(f'<a href="/f/{i}">{r.choice(WORDS)}</a>' for i in range(6))
    html = (
        f"<html><head><title>{title}</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head><body>"
        f'<div id="nav" class="navbar menu"><ul>{nav_links}</ul></div>'
        f'<div class="sidebar widget">{side_links}</div>'
        f'<div id="main" class="article content entry"><h1>{title}</h1>{body}</div>'
        f'<div class="footer">{footer_links}</div>'
        "</body></html>"
    )
    return [_span("html", html, "", 0)]


def _text_line_geom(pn: int, line: int, x0: float, width: float, lo: int = -1) -> Geom:
    top = 72.0 + line * 14.0
    return Geom(pn, x0, x0 + width, top, top + 10.0, lo)


def _gen_pdf_single_col(doc_id: str, r: random.Random, pages: int | None = None) -> list[dict]:
    spans: list[dict] = []
    off = 0
    pages = pages or r.randint(2, 4)
    header_txt = f"{_sentence(r, 2, 4, end='')} report"
    footer_txt = "Confidential draft"
    eng = r.random() < 0.7
    lines_per_page = r.randint(20, 34)
    for pn in range(pages):
        # repeated page furniture
        spans.append(_span("header", header_txt, pack_geom(Geom(pn, 72, 400, 20, 32)), off)); off += 1
        spans.append(_span("footer", footer_txt, pack_geom(Geom(pn, 72, 250, 760, 772)), off)); off += 1
        # page number box (junk pattern "<n> / <n>")
        spans.append(_span("text", f"{pn + 1} / {pages}", pack_geom(Geom(pn, 280, 330, 775, 785)), off)); off += 1
        if pn == 0:
            spans.append(_span("title", _sentence(r, 3, 6, end=""), pack_geom(_text_line_geom(pn, 0, 72, 300)), off)); off += 1
        # narrow untagged margin-note scraps (dropped by the scrap filter);
        # offset half a line vertically so they never share a visual line
        if r.random() < 0.4:
            for j in range(r.randint(1, 3)):
                g = Geom(pn, 545, 585, 72.0 + (4 + j * 2) * 14.0 + 5.0,
                         72.0 + (4 + j * 2) * 14.0 + 15.0)
                spans.append(_span("text", f"rev {r.randint(1, 40)}", pack_geom(g), off)); off += 1
        line = 2
        while line < lines_per_page:
            n_lines = r.randint(1, 4)
            sent_parts = []
            for j in range(n_lines):
                if line + j >= lines_per_page:
                    break
                last = j == n_lines - 1 or line + j == lines_per_page - 1
                if eng:
                    txt = _sentence(r, 6, 12, end="." if last else "")
                else:
                    txt = _cjk_sentence(r) if last else _cjk_sentence(r)[:-1]
                sent_parts.append(txt)
            for j, txt in enumerate(sent_parts):
                spans.append(
                    _span("text", txt, pack_geom(_text_line_geom(pn, line + j, 72, 460.0 - (60 if j == len(sent_parts) - 1 else 0))), off)
                )
                off += 1
            line += len(sent_parts)
    return spans


def _gen_pdf_two_col(doc_id: str, r: random.Random) -> list[dict]:
    spans: list[dict] = []
    off = 0
    pages = r.randint(1, 3)
    col_w = 250.0
    for pn in range(pages):
        spans.append(_span("header", "Proceedings", pack_geom(Geom(pn, 72, 300, 20, 32)), off)); off += 1
        n_lines = r.randint(14, 24)
        # interleaved emission order: alternate columns line by line
        for line in range(n_lines):
            for col, x0 in ((0, 54.0), (1, 320.0)):
                txt = _sentence(r, 5, 10, end="." if r.random() < 0.4 else "")
                spans.append(_span("text", txt, pack_geom(_text_line_geom(pn, line, x0, col_w - r.randint(0, 40))), off))
                off += 1
    return spans


def _gen_pdf_tablefig(doc_id: str, r: random.Random) -> list[dict]:
    spans: list[dict] = []
    off = 0
    pages = 2
    n_cols = r.randint(2, 4)
    n_rows = r.randint(2, 4)
    headers = [r.choice(WORDS) for _ in range(n_cols)]
    # half the tables carry a two-row header whose top row has a cell
    # spanning the first two columns (post-TSR SP analog) — exercises
    # rowspan/colspan resolution + hierarchical header concat
    group_header = n_cols >= 3 and r.random() < 0.5
    lo_counter = 0
    for pn in range(pages):
        spans.append(_span("text", _sentence(r, 8, 14), pack_geom(_text_line_geom(pn, 0, 72, 440)), off)); off += 1
        # table region with caption above
        lo = lo_counter; lo_counter += 1
        cap_line = 3
        spans.append(
            _span("table caption", f"Table {pn + 1}: {_sentence(r, 3, 6, end='')}",
                  pack_geom(_text_line_geom(pn, cap_line, 100, 300)), off)
        ); off += 1
        cell_w = 100.0
        row0_line = cap_line + 1
        if group_header:
            # spanning group cell over columns 0-1, plain header over the rest
            g = Geom(pn, 90, 90 + 2 * cell_w - 10,
                     72.0 + row0_line * 14.0, 72.0 + row0_line * 14.0 + 10.0, lo)
            spans.append(_span("table header", f"{r.choice(WORDS)} group", pack_geom(g), off)); off += 1
            for ci in range(2, n_cols):
                g = Geom(pn, 90 + ci * cell_w, 90 + ci * cell_w + cell_w - 10,
                         72.0 + row0_line * 14.0, 72.0 + row0_line * 14.0 + 10.0, lo)
                spans.append(_span("table header", r.choice(WORDS), pack_geom(g), off)); off += 1
            row0_line += 1
        for ri in range(n_rows + 1):  # +1 leaf header row
            for ci in range(n_cols):
                kind = "table header" if ri == 0 else "table"
                txt = headers[ci] if ri == 0 else str(r.randint(1, 999))
                g = Geom(pn, 90 + ci * cell_w, 90 + ci * cell_w + cell_w - 10,
                         72.0 + (row0_line + ri) * 14.0, 72.0 + (row0_line + ri) * 14.0 + 10.0, lo)
                spans.append(_span(kind, txt, pack_geom(g), off)); off += 1
        # duplicate detection of the table's header row (overlapping layout
        # region, +2px jitter, fresh lo) — removed by layouts_cleanup NMS
        if not group_header and r.random() < 0.3:
            dup_lo = lo_counter; lo_counter += 1
            for ci in range(n_cols):
                g = Geom(pn, 92 + ci * cell_w, 92 + ci * cell_w + cell_w - 10,
                         74.0 + row0_line * 14.0, 74.0 + row0_line * 14.0 + 10.0, dup_lo)
                spans.append(_span("table header", headers[ci], pack_geom(g), off)); off += 1
        # credit line to drop (pdf_parser.py:687)
        credit_line = row0_line + n_rows + 1
        g = Geom(pn, 90, 200, 72.0 + credit_line * 14.0, 72.0 + credit_line * 14.0 + 10, lo)
        spans.append(_span("table", "数据来源: internal", pack_geom(g), off)); off += 1
        # figure region with caption below
        lo = lo_counter; lo_counter += 1
        fig_line = credit_line + 3
        fg = Geom(pn, 150, 400, 72.0 + fig_line * 14.0, 72.0 + fig_line * 14.0 + 80.0, lo)
        spans.append(_span("figure", "", pack_geom(fg, blob=f"blob://{doc_id}/{pn}"), off)); off += 1
        spans.append(
            _span("figure caption", f"Figure {pn + 1}: {_sentence(r, 3, 6, end='')}",
                  pack_geom(Geom(pn, 150, 400, 72.0 + fig_line * 14.0 + 86, 72.0 + fig_line * 14.0 + 96)), off)
        ); off += 1
        # trailing text
        for j in range(2):
            spans.append(_span("text", _sentence(r, 6, 12), pack_geom(_text_line_geom(pn, fig_line + 9 + j, 72, 440)), off)); off += 1
    return spans


def _gen_book_bulleted(doc_id: str, r: random.Random) -> list[dict]:
    spans: list[dict] = []
    off = 0
    n_ch = r.randint(2, 4)
    # ToC block at front
    spans.append(_span("txt", "Contents", "", off)); off += 1
    for c in range(n_ch):
        spans.append(_span("txt", f"Chapter {c + 1} {_sentence(r, 2, 4, end='')} ..... {c + 3}", "", off)); off += 1
    for c in range(n_ch):
        spans.append(_span("txt", f"Chapter {c + 1} {_sentence(r, 2, 4, end='')}", "", off)); off += 1
        for s in range(r.randint(2, 3)):
            spans.append(_span("txt", f"{c + 1}.{s + 1} {_sentence(r, 2, 5, end='')}", "", off)); off += 1
            for _ in range(r.randint(2, 5)):
                spans.append(_span("txt", _sentence(r, 10, 20), "", off)); off += 1
        if r.random() < 0.5:
            spans.append(_span("txt", f"Key terms of chapter {c + 1}:", "", off)); off += 1
            spans.append(_span("txt", ", ".join(r.choice(WORDS) for _ in range(8)) + ". " + _sentence(r, 10, 18), "", off)); off += 1
    return spans


def _gen_paper_shape(doc_id: str, r: random.Random) -> list[dict]:
    spans: list[dict] = []
    off = 0
    spans.append(_span("title", _sentence(r, 4, 8, end=""), pack_geom(_text_line_geom(0, 0, 150, 320)), off)); off += 1
    spans.append(_span("text", ", ".join(f"{r.choice(WORDS).capitalize()} {r.choice(WORDS).capitalize()}" for _ in range(3)),
                       pack_geom(_text_line_geom(0, 1, 170, 280)), off)); off += 1
    abstract = "Abstract " + " ".join(_sentence(r, 10, 16) for _ in range(3))
    spans.append(_span("text", abstract, pack_geom(_text_line_geom(0, 3, 90, 430)), off)); off += 1
    line = 5
    for sec in range(1, r.randint(3, 5)):
        spans.append(_span("title", f"{sec}. {_sentence(r, 2, 4, end='')}", pack_geom(_text_line_geom(0, line, 72, 200)), off)); off += 1
        line += 1
        for _ in range(r.randint(3, 6)):
            spans.append(_span("text", _sentence(r, 8, 14), pack_geom(_text_line_geom(0, line, 72, 460)), off)); off += 1
            line += 1
    spans.append(_span("reference", "[1] " + _sentence(r, 6, 10), pack_geom(_text_line_geom(0, line, 72, 400)), off)); off += 1
    return spans


def _gen_plain_formats(doc_id: str, r: random.Random) -> list[dict]:
    """Interleaved markdown + txt + json spans: exercises parse_markdown
    (headings, tables) and parse_json on the distributed strip paths, not
    just in unit tests."""
    import json as _json

    md = (
        f"# {_sentence(r, 3, 5, end='')}\n"
        f"{_sentence(r, 10, 16)}\n\n"
        f"## {_sentence(r, 2, 4, end='')}\n"
        f"{_sentence(r, 8, 14)}\n"
        f"| {r.choice(WORDS)} | {r.choice(WORDS)} |\n|---|---|\n"
        f"| {r.randint(1, 99)} | {r.randint(1, 99)} |\n"
    )
    # half the docs paste an embedded HTML table (one of the reference's
    # three wrapper cases, markdown_parser.py:68-106) after a trailing line
    wrap = r.randint(0, 5)
    if wrap < 3:
        cell = f"<table><tr><td>{r.choice(WORDS)}</td><td>{r.randint(1, 99)}</td></tr></table>"
        html_tbl = [
            f"<html><body>{cell}</body></html>",
            f"<body>{cell}</body>",
            cell,
        ][wrap]
        md += f"{_sentence(r, 6, 10)}\n{html_tbl}\n{_sentence(r, 6, 10)}\n"
    txt = "\n".join(_sentence(r, 8, 14) for _ in range(r.randint(2, 4)))
    js = _json.dumps(
        {
            "title": _sentence(r, 2, 4, end=""),
            "items": [
                {"name": r.choice(WORDS), "score": r.randint(0, 100)}
                for _ in range(r.randint(2, 5))
            ],
            "summary": _sentence(r, 10, 16),
        }
    )
    return [
        _span("md", md, "", 0),
        _span("txt", txt, "", 1),
        _span("json", js, "", 2),
    ]


def _gen_giant_doc(doc_id: str, r: random.Random, span_factor: int = 100) -> list[dict]:
    # heavy tail: 100-1000x median span count (FIXTURES.md: giant_doc)
    pages = max(2, span_factor // 30)
    return _gen_pdf_single_col(doc_id, r, pages=pages)


def gen_doc(seed: int, doc_index: int, giant_factor: int = 100) -> dict:
    """One document row {doc_id, spans} — pure function of (seed, doc_index)."""
    doc_id = f"doc-{doc_index:08d}"
    r = _rng(seed, doc_index)
    profile = profile_of(doc_index)
    if profile == "html_boiler":
        spans = _gen_html_boiler(doc_id, r)
    elif profile == "pdf_single_col":
        spans = _gen_pdf_single_col(doc_id, r)
    elif profile == "pdf_two_col":
        spans = _gen_pdf_two_col(doc_id, r)
    elif profile == "pdf_tablefig":
        spans = _gen_pdf_tablefig(doc_id, r)
    elif profile == "book_bulleted":
        spans = _gen_book_bulleted(doc_id, r)
    elif profile == "paper_shape":
        spans = _gen_paper_shape(doc_id, r)
    elif profile == "plain_formats":
        spans = _gen_plain_formats(doc_id, r)
    else:  # giant_doc
        spans = _gen_giant_doc(doc_id, r, span_factor=giant_factor)
    return {"doc_id": doc_id, "spans": spans}


def gen_docs(seed: int, start: int, count: int, giant_factor: int = 100) -> list[dict]:
    return [gen_doc(seed, i, giant_factor) for i in range(start, start + count)]


def corpus_df(spark, seed: int = 42, count: int = 200, giant_factor: int = 100,
              partitions: int | None = None):
    """Distributed corpus materialization: the *index range* is parallelized
    and documents are generated inside mapInPandas partitions, so a bench
    corpus never sits on the driver."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ragflow_spark.schemas import DOCS_SCHEMA

    partitions = partitions or max(8, count // 2000)
    idx = spark.range(0, count, 1, partitions).withColumnRenamed("id", "doc_index")

    def gen_batch(it):
        for pdf in it:
            rows = [gen_doc(seed, int(i), giant_factor) for i in pdf["doc_index"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [
                        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
                        for r in rows
                    ],
                    # span-count stats column: parquet min/max on it lets the
                    # giant-doc filter prune row groups without decoding spans
                    "n_spans": [len(r["spans"]) for r in rows],
                }
            )

    # StructType.add mutates in place — build a fresh schema each call
    from pyspark.sql import types as T
    schema = T.StructType(
        list(DOCS_SCHEMA.fields) + [T.StructField("n_spans", T.IntegerType(), False)]
    )
    return idx.mapInPandas(gen_batch, schema=schema)


def write_corpus(
    spark,
    path: str,
    count: int,
    seed: int = 42,
    giant_factor: int = 100,
    partitions: int | None = None,
    row_group_bytes: int = 2 * 1024 * 1024,
) -> None:
    """Materialize a corpus parquet tuned for the python-native reader:
    small row groups give the split planner fine-grained, well-balanced
    tasks (row group = the scheduling and salting unit)."""
    (
        corpus_df(spark, seed=seed, count=count, giant_factor=giant_factor,
                  partitions=partitions)
        .write.mode("overwrite")
        .option("parquet.block.size", row_group_bytes)
        .parquet(path)
    )
