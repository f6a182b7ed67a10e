"""Plain-format parsers: markdown / txt / json span kinds.

Reference behavior:
- markdown tables + heading glue   deepdoc/parser/markdown_parser.py:26-106,
                                   rag/app/naive.py:346-366
- txt line split                   rag/app/book.py:100-104,
                                   deepdoc/parser/txt_parser.py:23-64
- recursive size-bounded json split deepdoc/parser/json_parser.py:27-179
"""

from __future__ import annotations

import json
import re

_MD_SEP_ROW = re.compile(r"^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)+\|?\s*$")

# Embedded HTML tables pasted into markdown — the reference's three wrapper
# cases (<html><body><table>, <body><table>, bare <table>), matched at line
# boundaries (markdown_parser.py:68-106).
_HTML_TABLE = re.compile(
    r"(?:\n|^)\s*"
    r"(?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>"
    r"|<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>"
    r"|<table[^>]*>.*?</table>)"
    r"\s*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)


def parse_markdown(text: str) -> list[tuple[str, str]]:
    """Returns [(section_text, kind)] — kind 'table' for pipe tables rendered
    to HTML and for embedded HTML ``<table>`` blocks (kept verbatim, three
    wrapper cases per markdown_parser.py:68-106), 'title' for headings
    (glued to their following body line), 'text' otherwise. Document order
    is preserved: html-table blocks split the text and the line scanner
    runs on each remainder segment in place."""
    out: list[tuple[str, str]] = []
    last = 0
    if "<table" in text.lower():
        for m in _HTML_TABLE.finditer(text):
            _parse_md_lines(text[last:m.start()], out)
            out.append((m.group().strip(), "table"))
            last = m.end()
    _parse_md_lines(text[last:], out)
    return out


def _parse_md_lines(text: str, out: list[tuple[str, str]]) -> None:
    lines = text.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        # pipe-table block: a header row, a separator row, data rows
        if (
            "|" in line
            and i + 1 < n
            and _MD_SEP_ROW.match(lines[i + 1] or "")
        ):
            tbl = [line]
            j = i + 2
            while j < n and "|" in lines[j] and lines[j].strip():
                tbl.append(lines[j])
                j += 1
            out.append((_md_table_html(tbl), "table"))
            i = j
            continue
        if line.strip().startswith("#"):
            # glue the heading to its following body line (naive.py:357-361)
            sec = line
            if i + 1 < n and lines[i + 1].strip() and not lines[i + 1].strip().startswith("#"):
                sec = sec + "\n" + lines[i + 1]
                i += 1
            out.append((sec, "title"))
        elif line.strip():
            out.append((line, "text"))
        i += 1


def _md_cells(row: str) -> list[str]:
    row = row.strip()
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|"):
        row = row[:-1]
    return [c.strip() for c in row.split("|")]


def _md_table_html(rows: list[str]) -> str:
    head = _md_cells(rows[0])
    body = [_md_cells(r) for r in rows[1:]]
    h = "".join(f"<th>{c}</th>" for c in head)
    b = "".join("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in body)
    return f"<table><tr>{h}</tr>{b}</table>"


def parse_txt(text: str) -> list[str]:
    """Line split, empties dropped (book.py:103-104)."""
    return [ln for ln in text.split("\n") if ln.strip()]


def parse_json(text: str, max_chunk_size: int = 2000, min_chunk_size: int | None = None) -> list[str]:
    """Recursive size-bounded JSON splitter (json_parser.py:27-179): lists
    become index-keyed dicts; a subtree is added to the current chunk while
    its serialized size fits, else a new chunk starts once the current one
    reached min size. JSONL: one parse per line."""
    max_size = max_chunk_size * 2
    min_size = min_chunk_size if min_chunk_size is not None else max(max_chunk_size - 200, 50)

    def jsize(d) -> int:
        return len(json.dumps(d, ensure_ascii=False))

    def to_dicts(data):
        if isinstance(data, dict):
            return {k: to_dicts(v) for k, v in data.items()}
        if isinstance(data, list):
            return {str(i): to_dicts(v) for i, v in enumerate(data)}
        return data

    def set_nested(d: dict, path: list[str], value) -> None:
        for key in path[:-1]:
            d = d.setdefault(key, {})
        d[path[-1]] = value

    def split(data, path: list[str], chunks: list[dict]) -> None:
        if isinstance(data, dict):
            for key, value in data.items():
                new_path = path + [key]
                remaining = max_size - jsize(chunks[-1])
                if jsize({key: value}) < remaining:
                    set_nested(chunks[-1], new_path, value)
                else:
                    if jsize(chunks[-1]) >= min_size:
                        chunks.append({})
                    split(value, new_path, chunks)
        else:
            set_nested(chunks[-1], path, data)

    def split_one(txt: str) -> list[str]:
        try:
            data = json.loads(txt)
        except Exception:
            return [txt] if txt.strip() else []
        chunks: list[dict] = [{}]
        split(to_dicts(data), [], chunks)
        if chunks and not chunks[-1]:
            chunks.pop()
        return [json.dumps(c, ensure_ascii=False) for c in chunks]

    stripped = text.strip()
    if "\n" in stripped and all(
        ln.strip().startswith("{") for ln in stripped.split("\n") if ln.strip()
    ):
        out: list[str] = []
        for ln in stripped.split("\n"):
            if ln.strip():
                out.extend(split_one(ln))
        return out
    return split_one(text)
