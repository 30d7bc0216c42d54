"""OCR word model + text-to-cell assignment
(ref: src/img2table/ocr/data.py, src/img2table/ocr/base.py:10-23,
src/img2table/ocr/tesseract.py:99-141).

Words use the reference's hOCR-style schema: (page, class, id, parent,
value, confidence, x1, y1, x2, y2); hierarchy via id/parent strings.  The
polars cross-join + group semantics of get_text_table are reproduced with
pandas/numpy: a word lands in a cell iff the intersection covers > 50% of
the word bbox; words group into lines by `parent` (joined with " " in
document order), lines sort by (y1, x1) and join with "\n".
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd


WORD_COLUMNS = ["page", "class", "id", "parent", "value", "confidence",
                "x1", "y1", "x2", "y2"]


@dataclass
class OCRWords:
    """Columnar word table (hOCR schema) for one document."""

    df: pd.DataFrame  # columns WORD_COLUMNS

    @classmethod
    def from_records(cls, records: list[dict]) -> "OCRWords":
        df = pd.DataFrame(records, columns=WORD_COLUMNS)
        return cls(df=df)

    def page(self, page_number: int = 0) -> "OCRWords":
        return OCRWords(df=self.df[self.df["page"] == page_number])

    def _relevant_words(self, min_confidence: int) -> pd.DataFrame:
        d = self.df
        d = d[(d["class"] == "ocrx_word") & d["value"].notna()
              & (d["confidence"] >= min_confidence)]
        return d

    def get_text_cell(self, cell, margin: int = 0, page_number: Optional[int] = None,
                      min_confidence: int = 50) -> Optional[str]:
        """(ref ocr/data.py:19-84)"""
        bbox = cell.bbox(margin=margin)
        d = self._relevant_words(min_confidence)
        if page_number:
            d = d[d["page"] == page_number]
        if len(d) == 0:
            return None
        x1 = d["x1"].to_numpy()
        y1 = d["y1"].to_numpy()
        x2 = d["x2"].to_numpy()
        y2 = d["y2"].to_numpy()
        xl = np.maximum(x1, bbox[0])
        yt = np.maximum(y1, bbox[1])
        xr = np.minimum(x2, bbox[2])
        yb = np.minimum(y2, bbox[3])
        has_int = (xr > xl) & (yb > yt)
        w_area = (x2 - x1) * (y2 - y1)
        int_area = np.where(has_int, (xr - xl) * (yb - yt), 0)
        contained = has_int & (int_area / np.maximum(w_area, 1) > 0.5)
        dc = d[contained]
        if len(dc) == 0:
            return None
        grouped = dc.groupby("parent", sort=False).agg(
            y1=("y1", "min"), x1=("x1", "min"),
            value=("value", lambda v: list(v)),
        ).sort_values(["y1", "x1"], kind="stable")
        text = "\n".join(" ".join(line).strip() for line in grouped["value"]).strip()
        return text or None


def assign_text_to_table(table, words: Optional[OCRWords], min_confidence: int = 50):
    """Set Cell.content for every table slot (ref ocr/data.py:86-151)."""
    if words is None:
        return table
    d = words._relevant_words(min_confidence)
    if len(d) == 0:
        return table
    wx1 = d["x1"].to_numpy()
    wy1 = d["y1"].to_numpy()
    wx2 = d["x2"].to_numpy()
    wy2 = d["y2"].to_numpy()
    w_area = (wx2 - wx1) * (wy2 - wy1)
    parents = d["parent"].to_numpy()
    values = d["value"].to_numpy()

    for id_row, row in enumerate(table.items):
        for id_col, cell in enumerate(row.items):
            xl = np.maximum(wx1, cell.x1)
            yt = np.maximum(wy1, cell.y1)
            xr = np.minimum(wx2, cell.x2)
            yb = np.minimum(wy2, cell.y2)
            has_int = (xr > xl) & (yb > yt)
            int_area = np.where(has_int, (xr - xl) * (yb - yt), 0)
            sel = has_int & (int_area / np.maximum(w_area, 1) > 0.5)
            if not sel.any():
                continue
            # group words by parent in document order -> line text + line bbox
            lines: dict = {}
            for p, v, y, x in zip(parents[sel], values[sel], wy1[sel], wx1[sel]):
                if p not in lines:
                    lines[p] = [[], int(y), int(x)]
                entry = lines[p]
                entry[0].append(v)
                entry[1] = min(entry[1], int(y))
                entry[2] = min(entry[2], int(x))
            ordered = sorted(lines.values(), key=lambda e: (e[1], e[2]))
            text = "\n".join(" ".join(e[0]) for e in ordered)
            cell.content = text or None
    return table


# --- hOCR parsing (TesseractOCR-compatible word provider) ---

_NOISE_RE = re.compile(r"^(\s|\||L|_|;|\*)*$")
_CONF_RE = re.compile(r"x_wconf \d{1,2}")
_BBOX_RE = re.compile(r"bbox \d{1,4} \d{1,4} \d{1,4} \d{1,4}")


def parse_hocr(hocr: str, page: int = 0) -> list[dict]:
    """Parse hOCR HTML into word-schema records
    (ref ocr/tesseract.py:99-141: class, id, parent-id, noise-stripped
    value, 1-2-digit x_wconf, bbox)."""
    from html.parser import HTMLParser

    records: list[dict] = []
    elements: list[dict] = []  # parse tree nodes

    class _P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.stack: list[dict] = []

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            node = {"tag": tag, "attrs": a, "children": [], "text": [],
                    "parent": self.stack[-1] if self.stack else None}
            if self.stack:
                self.stack[-1]["children"].append(node)
            elements.append(node)
            if tag not in ("meta", "br", "img", "link"):
                self.stack.append(node)

        def handle_endtag(self, tag):
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i]["tag"] == tag:
                    del self.stack[i:]
                    break

        def handle_data(self, data):
            if self.stack:
                self.stack[-1]["text"].append(data)

    parser = _P()
    parser.feed(hocr)

    def element_string(node) -> Optional[str]:
        """bs4 .string semantics: the single string descendant, if unique."""
        texts = [t for t in node["text"] if t.strip() or t]
        el_children = node["children"]
        if not el_children:
            joined = "".join(node["text"])
            return joined if joined else None
        if len(el_children) == 1 and not "".join(node["text"]).strip():
            return element_string(el_children[0])
        return None

    for node in elements:
        a = node["attrs"]
        if "class" not in a:
            continue
        title = a.get("title", "")
        bboxes = _BBOX_RE.findall(title)
        if not bboxes:
            continue
        s = element_string(node)
        value = None
        if s is not None:
            value = _NOISE_RE.sub("", s).strip() or None
        conf_m = _CONF_RE.findall(title)
        confidence = int(conf_m[0].split()[1]) if conf_m else None
        parent = node["parent"]
        parent_id = parent["attrs"].get("id") if parent else None
        x1, y1, x2, y2 = (int(v) for v in re.sub(r"^bbox\s", "", bboxes[0]).split())
        records.append({
            "page": page, "class": a["class"].split()[0], "id": a.get("id"),
            "parent": parent_id, "value": value, "confidence": confidence,
            "x1": x1, "y1": y1, "x2": x2, "y2": y2,
        })
    return records


def load_words_csv(path: str, sep: str = ";") -> OCRWords:
    """Load the reference's OCR fixture CSV (schema ocr/base.py:10-23)."""
    df = pd.read_csv(path, sep=sep)
    df.columns = [c.strip() for c in df.columns]
    return OCRWords(df=df[WORD_COLUMNS])
