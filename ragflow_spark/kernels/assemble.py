"""Table/figure region assembly — the interleaved text+media re-assembly.

Reference behavior (deepdoc/parser/pdf_parser.py:668-879 _extract_table_figure
+ deepdoc/vision/table_structure_recognizer.py:135-501 construct_table),
re-expressed for clean span structs:

- group table/figure boxes by (page, layout-region id)
- drop data-source credit lines            (pdf_parser.py:687-689)
- merge a table that continues on the next page into its predecessor when
  the vertical gap is < 23x mean height    (pdf_parser.py:708-728)
- assign each caption to the nearest table-or-figure group by squared
  (y, x) distance, x-distance zero when x-ranges overlap
                                           (pdf_parser.py:730-780)
- reconstruct the table grid from cell geometry (row = top-cluster,
  column = x0-cluster) and render either HTML or "header: value; ..."
  description rows                         (table_structure_recognizer.py:353-501)

Outputs one span per group: kind table/figure, caption text prepended,
media_ref preserved for figures.
"""

from __future__ import annotations

import numpy as np

from ragflow_spark.kernels.layout import drop_credits, page_mean_height
from ragflow_spark.schemas import PAGE_H


def _y_dis(a: dict, b: dict) -> float:
    ac = a["pn"] * PAGE_H + (a["top"] + a["bottom"]) / 2
    bc = b["pn"] * PAGE_H + (b["top"] + b["bottom"]) / 2
    return abs(ac - bc)


def _x_dis(a: dict, b: dict) -> float:
    if not (a["x1"] < b["x0"] or a["x0"] > b["x1"]):
        return 0.0
    return min(abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]))


def _group_key(b: dict, fallback_idx: int) -> tuple:
    lo = b["lo"] if b["lo"] >= 0 else 10_000 + fallback_idx
    return (b["pn"], lo)


def group_regions(boxes: list[dict]) -> tuple[list[dict], dict, dict]:
    """Pop table/figure boxes into groups keyed by (page, layoutno).
    Boxes without a layoutno fall back to contiguous-run grouping."""
    rest: list[dict] = []
    tables: dict[tuple, list[dict]] = {}
    figures: dict[tuple, list[dict]] = {}
    run_idx = 0
    prev_kind = None
    for b in boxes:
        k = b["kind"]
        if k not in ("table", "figure"):
            rest.append(b)
            prev_kind = k
            continue
        if k != prev_kind:
            run_idx += 1
        prev_kind = k
        key = _group_key(b, run_idx)
        (tables if k == "table" else figures).setdefault(key, []).append(b)
    return rest, tables, figures


def merge_cross_page_tables(tables: dict, mean_h: dict[int, float]) -> dict:
    """pdf_parser.py:708-728: adjacent-page continuation merge."""
    items = sorted(
        tables.items(),
        key=lambda kv: (kv[1][0]["pn"] * PAGE_H + kv[1][0]["top"], kv[1][0]["x0"]),
    )
    merged: list[tuple] = []
    out: dict[tuple, list[dict]] = {}
    for k, bxs in items:
        if out:
            k0, bxs0 = merged[-1]
            pn0, pn = bxs0[0]["pn"], bxs[0]["pn"]
            gap = (bxs[0]["pn"] * PAGE_H + bxs[0]["top"]) - (
                bxs0[-1]["pn"] * PAGE_H + bxs0[-1]["bottom"]
            )
            if pn - pn0 == 1 and gap <= mean_h.get(pn, 10.0) * 23:
                out[k0].extend(bxs)
                continue
        out[k] = list(bxs)
        merged.append((k, out[k]))
    return out


def assign_captions(
    rest: list[dict], tables: dict, figures: dict
) -> tuple[list[dict], dict[tuple, list[str]], dict[tuple, list[str]]]:
    """1-NN caption assignment by squared spatial distance
    (pdf_parser.py:743-780); a caption goes to whichever of the nearest
    table / nearest figure group is closer."""
    tbl_caps: dict[tuple, list[str]] = {k: [] for k in tables}
    fig_caps: dict[tuple, list[str]] = {k: [] for k in figures}
    remaining: list[dict] = []
    for c in rest:
        if c["kind"] not in ("table caption", "figure caption"):
            remaining.append(c)
            continue

        def nearest(groups: dict) -> tuple[tuple | None, float]:
            mink, minv = None, float("inf")
            for k, bxs in groups.items():
                for b in bxs:
                    d = _y_dis(c, b) ** 2 + _x_dis(c, b) ** 2
                    if d < minv:
                        mink, minv = k, d
            return mink, minv

        tk, tv = nearest(tables)
        fk, fv = nearest(figures)
        if tv < fv and tk is not None:
            tbl_caps[tk].append(c["text"] or "")
        elif fk is not None:
            fig_caps[fk].append(c["text"] or "")
        # caption with no group at all: dropped (reference pops it regardless)
    return remaining, tbl_caps, fig_caps


def construct_table(cells: list[dict], html: bool = False) -> str:
    """Grid reconstruction from cell geometry. Rows cluster on global top
    (threshold = mean cell height / 2), columns on x0 (threshold = mean cell
    width / 2) — the closed-form analog of the reference's R/C tagging +
    __desc_table / __html_table render (table_structure_recognizer.py:160-197,
    353-501). First row is the header row."""
    cells = [c for c in cells if (c["text"] or "").strip()]
    if not cells:
        return ""
    tops = np.array([c["pn"] * PAGE_H + c["top"] for c in cells])
    x0s = np.array([c["x0"] for c in cells])
    hts = np.array([c["bottom"] - c["top"] for c in cells])
    wds = np.array([c["x1"] - c["x0"] for c in cells])
    row_thr = max(float(np.mean(hts)) / 2, 1.0)
    col_thr = max(float(np.mean(wds)) / 2, 1.0)

    def cluster(vals: np.ndarray, thr: float) -> np.ndarray:
        order = np.argsort(vals, kind="stable")
        ids = np.zeros(len(vals), dtype=np.int64)
        cur = 0
        prev = None
        for idx in order:
            v = vals[idx]
            if prev is not None and v - prev > thr:
                cur += 1
            ids[idx] = cur
            prev = v
        return ids

    rn = cluster(tops, row_thr)
    cn = cluster(x0s, col_thr)
    n_rows, n_cols = int(rn.max()) + 1, int(cn.max()) + 1
    grid: list[list[str]] = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for c, r_, c_ in zip(cells, rn, cn):
        t = (c["text"] or "").strip()
        grid[r_][c_] = (grid[r_][c_] + " " + t).strip() if grid[r_][c_] else t

    if html:
        head = "".join(f"<th>{v}</th>" for v in grid[0])
        body = "".join(
            "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>" for row in grid[1:]
        )
        return f"<table><tr>{head}</tr>{body}</table>"
    headers = grid[0]
    lines = []
    for row in grid[1:]:
        parts = [f"{h}: {v}" for h, v in zip(headers, row) if v]
        if parts:
            lines.append("; ".join(parts))
    if not lines:  # single-row table: emit the header row itself
        lines = ["; ".join(v for v in headers if v)]
    return "\n".join(lines)


def assemble(boxes: list[dict], html_tables: bool = False) -> tuple[list[dict], list[dict]]:
    """Full assembly pass. Returns (remaining_boxes, media_spans) where each
    media span is a dict {kind, text, media_ref, pn, x0, x1, top, bottom, lo}
    positioned at its group origin for interleaved re-insertion."""
    boxes = drop_credits(boxes)
    mean_h = page_mean_height(boxes)
    rest, tables, figures = group_regions(boxes)
    tables = merge_cross_page_tables(tables, mean_h)
    rest, tbl_caps, fig_caps = assign_captions(rest, tables, figures)

    media: list[dict] = []
    for k, bxs in figures.items():
        texts = fig_caps.get(k, []) + [b["text"] for b in bxs if (b["text"] or "").strip()]
        txt = "\n".join(t for t in texts if t)
        ref = next((b["media_ref"] for b in bxs if b["media_ref"]), "")
        first = min(bxs, key=lambda b: (b["pn"] * PAGE_H + b["top"], b["x0"]))
        media.append(
            {
                "kind": "figure",
                "text": txt,
                "media_ref": ref,
                "pn": first["pn"],
                "x0": first["x0"],
                "x1": max(b["x1"] for b in bxs),
                "top": first["top"],
                "bottom": max(b["pn"] * PAGE_H + b["bottom"] for b in bxs) - first["pn"] * PAGE_H,
                "lo": -1,
            }
        )
    for k, bxs in tables.items():
        body = construct_table(bxs, html=html_tables)
        if not body:
            continue
        caps = tbl_caps.get(k, [])
        txt = ("\n".join(caps) + "\n" + body).strip() if caps else body
        first = min(bxs, key=lambda b: (b["pn"] * PAGE_H + b["top"], b["x0"]))
        media.append(
            {
                "kind": "table",
                "text": txt,
                "media_ref": "",
                "pn": first["pn"],
                "x0": first["x0"],
                "x1": max(b["x1"] for b in bxs),
                "top": first["top"],
                "bottom": max(b["pn"] * PAGE_H + b["bottom"] for b in bxs) - first["pn"] * PAGE_H,
                "lo": -1,
            }
        )
    return rest, media
