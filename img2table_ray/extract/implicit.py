"""Implicit row/column line recovery from whitespaces
(ref: src/img2table/tables/processing/bordered_tables/tables/implicit.py).
"""

from __future__ import annotations

from img2table_ray.core.objects import Cell, Line, Table
from img2table_ray.extract.borderless.model import ImageSegment, Whitespace
from img2table_ray.extract.borderless.whitespaces import get_whitespaces


def implicit_rows_lines(table: Table, segment: ImageSegment) -> list[Line]:
    """(ref implicit.py:12-54)"""
    h_ws = get_whitespaces(segment=segment, vertical=False, pct=1)

    if h_ws[0].y1 > segment.y1:
        up_ws = Whitespace(cells=[Cell(x1=min(ws.x1 for ws in h_ws),
                                       x2=max(ws.x2 for ws in h_ws),
                                       y1=segment.y1,
                                       y2=min(el.y1 for el in segment.elements))])
        h_ws.insert(0, up_ws)

    if h_ws[-1].y2 < segment.y2:
        down_ws = Whitespace(cells=[Cell(x1=min(ws.x1 for ws in h_ws),
                                         x2=max(ws.x2 for ws in h_ws),
                                         y1=segment.y2,
                                         y2=max(el.y2 for el in segment.elements))])
        h_ws.append(down_ws)

    if len(h_ws) > 2:
        max_width = max(w.width for w in h_ws)
        full_ws_h = sorted([ws.height for ws in h_ws[1:-1] if ws.width == max_width])
        min_height = (0.5 * full_ws_h[len(full_ws_h) // 2 + len(full_ws_h) % 2 - 1]
                      if len(full_ws_h) >= 3 else 1)
        h_ws = [h_ws[0]] + [ws for ws in h_ws[1:-1] if ws.height >= min_height] + [h_ws[-1]]

    created_lines = []
    table_lines = table.lines
    for ws in h_ws:
        if not any(ln for ln in table_lines if ws.y1 <= ln.y1 <= ws.y2 and ln.horizontal):
            created_lines.append(Line(x1=table.x1, y1=(ws.y1 + ws.y2) // 2,
                                      x2=table.x2, y2=(ws.y1 + ws.y2) // 2))
    return created_lines


def implicit_columns_lines(table: Table, segment: ImageSegment, char_length: float) -> list[Line]:
    """(ref implicit.py:57-80)"""
    v_ws = get_whitespaces(segment=segment, vertical=True, min_width=char_length, pct=1)

    created_lines = []
    table_lines = table.lines
    for ws in v_ws:
        if not any(ln for ln in table_lines if ws.x1 <= ln.x1 <= ws.x2 and ln.vertical):
            created_lines.append(Line(x1=(ws.x1 + ws.x2) // 2, y1=table.y1,
                                      x2=(ws.x1 + ws.x2) // 2, y2=table.y2))
    return created_lines
