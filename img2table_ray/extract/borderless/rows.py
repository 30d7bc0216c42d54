"""Row-delimiter identification for column groups (ref: src/img2table/
tables/processing/borderless_tables/rows.py).
"""

from __future__ import annotations

from img2table_ray.core.objects import Cell
from img2table_ray.extract.borderless.model import ColumnGroup, Whitespace
from img2table_ray.extract.borderless.whitespaces import get_whitespaces


def identify_row_delimiters(column_group: ColumnGroup) -> list[Cell]:
    """(ref rows.py:7-69)"""
    h_ws = get_whitespaces(segment=column_group, vertical=False, pct=0.66)

    if h_ws[0].y1 > column_group.y1:
        h_ws.insert(0, Whitespace(cells=[Cell(x1=min(ws.x1 for ws in h_ws),
                                              x2=max(ws.x2 for ws in h_ws),
                                              y1=column_group.y1,
                                              y2=min(el.y1 for el in column_group.elements))]))
    if h_ws[-1].y2 < column_group.y2:
        h_ws.append(Whitespace(cells=[Cell(x1=min(ws.x1 for ws in h_ws),
                                           x2=max(ws.x2 for ws in h_ws),
                                           y1=column_group.y2,
                                           y2=max(el.y2 for el in column_group.elements))]))

    if len(h_ws) > 2:
        max_width = max(w.width for w in h_ws)
        full_ws_h = sorted([ws.height for ws in h_ws[1:-1] if ws.width == max_width])
        min_height = (0.5 * full_ws_h[len(full_ws_h) // 2 + len(full_ws_h) % 2 - 1]
                      if len(full_ws_h) >= 3 else 1)
        h_ws = [h_ws[0]] + [ws for ws in h_ws[1:-1] if ws.height >= min_height] + [h_ws[-1]]

    deleted_idx = []
    for i in range(len(h_ws)):
        for j in range(i, len(h_ws)):
            adjacent = len({h_ws[i].y1, h_ws[i].y2} & {h_ws[j].y1, h_ws[j].y2}) > 0
            if adjacent:
                if h_ws[i].width > h_ws[j].width:
                    deleted_idx.append(j)
                elif h_ws[i].width < h_ws[j].width:
                    deleted_idx.append(i)
    h_ws = [ws for idx, ws in enumerate(h_ws) if idx not in deleted_idx]

    final_delims = []
    for ws in h_ws:
        if ws.y1 == column_group.y1 or ws.y2 == column_group.y2:
            continue
        final_delims.append(Cell(x1=ws.x1, x2=ws.x2,
                                 y1=(ws.y1 + ws.y2) // 2, y2=(ws.y1 + ws.y2) // 2))

    x1_els = min(el.x1 for el in column_group.elements)
    x2_els = max(el.x2 for el in column_group.elements)
    y1_els = min(el.y1 for el in column_group.elements)
    y2_els = max(el.y2 for el in column_group.elements)
    final_delims += [Cell(x1=x1_els, x2=x2_els, y1=y1_els, y2=y1_els),
                     Cell(x1=x1_els, x2=x2_els, y1=y2_els, y2=y2_els)]

    return sorted(final_delims, key=lambda d: d.y1)


def filter_coherent_row_delimiters(row_delimiters: list[Cell],
                                   column_group: ColumnGroup) -> list[Cell]:
    """(ref rows.py:72-121)"""
    max_width = max(d.width for d in row_delimiters)

    to_delete = []
    for idx, delim in enumerate(row_delimiters):
        if delim.width >= 0.95 * max_width:
            continue

        upper_delim = row_delimiters[idx - 1]
        upper_area = Cell(x1=max(delim.x1, upper_delim.x1), y1=upper_delim.y2,
                          x2=min(delim.x2, upper_delim.x2), y2=delim.y1)
        upper_columns = sorted(
            [col for col in column_group.columns
             if min(upper_area.y2, col.y2) - max(upper_area.y1, col.y1) >= 0.8 * upper_area.height
             and upper_area.x1 <= col.x1 <= upper_area.x2],
            key=lambda c: c.x1)
        upper_elements = ([el for el in column_group.elements
                           if el.y1 >= upper_area.y1 and el.y2 <= upper_area.y2
                           and el.x1 >= upper_columns[0].x2 and el.x2 <= upper_columns[-1].x1]
                          if upper_columns else [])

        bottom_delim = row_delimiters[idx + 1]
        bottom_area = Cell(x1=max(delim.x1, bottom_delim.x1), y1=delim.y2,
                           x2=min(delim.x2, bottom_delim.x2), y2=bottom_delim.y1)
        bottom_columns = sorted(
            [col for col in column_group.columns
             if min(bottom_area.y2, col.y2) - max(bottom_area.y1, col.y1) >= 0.8 * bottom_area.height
             and bottom_area.x1 <= col.x1 <= bottom_area.x2],
            key=lambda c: c.x1)
        bottom_elements = ([el for el in column_group.elements
                            if el.y1 >= bottom_area.y1 and el.y2 <= bottom_area.y2
                            and el.x1 >= bottom_columns[0].x2 and el.x2 <= bottom_columns[-1].x1]
                           if bottom_columns else [])

        if len(upper_elements) * len(bottom_elements) == 0:
            to_delete.append(idx)

    return [d for idx, d in enumerate(row_delimiters) if idx not in to_delete]


def correct_delimiter_width(row_delimiters: list[Cell], contours: list[Cell]) -> list[Cell]:
    """(ref rows.py:124-151)"""
    x_min = min(d.x1 for d in row_delimiters)
    x_max = max(d.x2 for d in row_delimiters)

    for idx, delim in enumerate(row_delimiters):
        if delim.width == x_max - x_min:
            continue
        left_contours = [c for c in contours
                         if c.y1 + c.height // 6 < delim.y1 < c.y2 - c.height // 6
                         and min(c.x2, delim.x1) - max(c.x1, x_min) > 0]
        delim_x_min = max([c.x2 for c in left_contours] + [x_min])
        right_contours = [c for c in contours
                          if c.y1 + c.height // 6 < delim.y1 < c.y2 - c.height // 6
                          and min(c.x2, x_max) - max(c.x1, delim.x2) > 0]
        delim_x_max = min([c.x1 for c in right_contours] + [x_max])
        row_delimiters[idx].x1 = delim_x_min
        row_delimiters[idx].x2 = delim_x_max

    return row_delimiters


def identify_delimiter_group_rows(column_group: ColumnGroup,
                                  contours: list[Cell]) -> list[Cell]:
    """(ref rows.py:154-174)"""
    row_delimiters = identify_row_delimiters(column_group=column_group)
    if row_delimiters:
        coherent = filter_coherent_row_delimiters(row_delimiters=row_delimiters,
                                                  column_group=column_group)
        corrected = correct_delimiter_width(row_delimiters=coherent, contours=contours)
        return corrected if len(corrected) >= 3 else []
    return []
