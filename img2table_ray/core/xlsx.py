"""Minimal xlsx writer/reader over stdlib zipfile — replaces the reference's
xlsxwriter sink (ref: src/img2table/document/base/__init__.py:144-189 +
tables/objects/extraction.py:176-206).

Writer semantics mirror the reference: one worksheet per extracted table
named "Page {p+1} - Table {i+1}", merged cells written once via merge
ranges, values as inline strings.  The reader exists for round-trip tests
and for comparing against the reference's expected.xlsx fixture.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.sax.saxutils import escape

from img2table_ray.core.spans import CellPosition, create_all_rectangles


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(extracted) -> str:
    """Worksheet XML for one ExtractedTable (inline strings + mergeCells)."""
    # group duplicated merged cells exactly like the reference
    dict_cells: dict = {}
    for id_row, row in extracted.content.items():
        for id_col, cell in enumerate(row):
            key = (cell.bbox.x1, cell.bbox.y1, cell.bbox.x2, cell.bbox.y2, cell.value)
            dict_cells.setdefault(key, []).append(CellPosition(cell=cell, row=id_row, col=id_col))

    values: dict = {}  # (row, col) -> str | None
    merges: list[tuple[int, int, int, int]] = []
    for positions in dict_cells.values():
        if len(positions) == 1:
            cp = positions[0]
            values[(cp.row, cp.col)] = cp.cell.value
        else:
            for span in create_all_rectangles(cell_positions=positions):
                merges.append((span.top_row, span.col_left, span.bottom_row, span.col_right))
                values[(span.top_row, span.col_left)] = span.value

    rows_xml = []
    n_rows = len(extracted.content)
    for r in range(n_rows):
        cells_xml = []
        for (rr, cc), v in sorted(values.items()):
            if rr != r or v is None:
                continue
            ref = f"{_col_letter(cc)}{r + 1}"
            cells_xml.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(v)}</t></is></c>"
            )
        rows_xml.append(f'<row r="{r + 1}">' + "".join(cells_xml) + "</row>")

    merge_xml = ""
    if merges:
        refs = "".join(
            f'<mergeCell ref="{_col_letter(c1)}{r1 + 1}:{_col_letter(c2)}{r2 + 1}"/>'
            for r1, c1, r2, c2 in merges
        )
        merge_xml = f'<mergeCells count="{len(merges)}">{refs}</mergeCells>'

    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData>" + merge_xml + "</worksheet>"
    )


def tables_to_xlsx(tables_by_page: dict[int, list]) -> bytes:
    """Write {page: [ExtractedTable]} -> xlsx bytes, one sheet per table
    named like the reference (base/__init__.py:173-179)."""
    sheets = []
    for page, tables in tables_by_page.items():
        for idx, tb in enumerate(tables):
            sheets.append((f"Page {page + 1} - Table {idx + 1}", tb))

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(len(sheets))
            )
            + "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_entries = "".join(
            f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_entries}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(sheets))
            )
            + "</Relationships>",
        )
        for i, (_, tb) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(tb))
    return buf.getvalue()


def read_xlsx_values(data: bytes) -> dict[str, list[list]]:
    """Read an xlsx into {sheet_name: 2D value grid} (sharedStrings +
    inline strings; merged ranges NOT expanded — merge anchors carry the
    value, like openpyxl)."""
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    z = zipfile.ZipFile(BytesIO(data))
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", ns):
            shared.append("".join(
                t.text or ""
                for t in si.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")
            ))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    out = {}
    for i, s in enumerate(wb.find("m:sheets", ns)):
        name = s.get("name")
        root = ET.fromstring(z.read(f"xl/worksheets/sheet{i + 1}.xml"))
        cells = {}
        max_r = max_c = -1
        for c in root.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}c"):
            ref = c.get("r")
            m = re.match(r"([A-Z]+)(\d+)", ref)
            col = sum((ord(ch) - 64) * 26 ** k for k, ch in enumerate(reversed(m.group(1)))) - 1
            row = int(m.group(2)) - 1
            t = c.get("t")
            val = None
            if t == "inlineStr":
                tt = c.find("m:is/m:t", ns)
                val = tt.text if tt is not None else None
            else:
                v = c.find("m:v", ns)
                if v is not None:
                    val = shared[int(v.text)] if t == "s" else v.text
            cells[(row, col)] = val
            max_r, max_c = max(max_r, row), max(max_c, col)
        grid = [[cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)]
        out[name] = grid
    return out
