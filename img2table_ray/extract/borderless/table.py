"""Borderless table creation + coherency checks (ref: src/img2table/tables/
processing/borderless_tables/table/*).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from img2table_ray.core.objects import Cell, Line, Table
from img2table_ray.extract.borderless.model import ColumnGroup
from img2table_ray.extract.cells import get_cells
from img2table_ray.extract.tables import cluster_to_table


def get_table(columns: ColumnGroup, row_delimiters: list[Cell],
              contours: list[Cell]) -> Optional[Table]:
    """(ref table/table_creation.py:10-42)"""
    v_lines = []
    for col in columns.columns:
        seq = iter(sorted([c for v_ws in col.whitespaces for c in v_ws.ws.cells],
                          key=lambda c: c.y1 + c.y2))
        line_groups = [[next(seq)]]
        for c in seq:
            if c.y1 > line_groups[-1][-1].y2:
                line_groups.append([])
            line_groups[-1].append(c)
        v_lines += [Line(x1=(gp[0].x1 + gp[0].x2) // 2, y1=gp[0].y1,
                         x2=(gp[0].x1 + gp[0].x2) // 2, y2=gp[-1].y2)
                    for gp in line_groups]

    h_lines = [Line(x1=d.x1, x2=d.x2, y1=d.y1, y2=d.y2) for d in row_delimiters]

    cells = get_cells(horizontal_lines=h_lines, vertical_lines=v_lines)
    table = cluster_to_table(cluster_cells=cells, elements=contours, borderless=True)
    return table if table.nb_columns >= 3 and table.nb_rows >= 2 else None


def check_row_coherency(table: Table, median_line_sep: float) -> bool:
    """(ref table/coherency.py:6-20)"""
    if table.nb_rows < 2:
        return False
    median_row_sep = np.median(
        [(lower.y1 + lower.y2 - upper.y1 - upper.y2) / 2
         for upper, lower in zip(table.items, table.items[1:])]
    )
    return median_row_sep >= median_line_sep / 3


def check_column_coherency(table: Table, char_length: float) -> bool:
    """(ref table/coherency.py:23-40)"""
    if table.nb_columns < 2:
        return False
    col_widths = []
    for idx in range(table.nb_columns):
        col_elements = [row.items[idx] for row in table.items]
        col_widths.append(min(el.x2 for el in col_elements) - max(el.x1 for el in col_elements))
    return np.median(col_widths) >= 3 * char_length


def check_table_coherency(table: Table, median_line_sep: float, char_length: float) -> bool:
    return (check_row_coherency(table=table, median_line_sep=median_line_sep)
            and check_column_coherency(table=table, char_length=char_length))


def identify_table(columns: ColumnGroup, row_delimiters: list[Cell], contours: list[Cell],
                   median_line_sep: float, char_length: float) -> Optional[Table]:
    """(ref table/__init__.py:10-31)"""
    table = get_table(columns=columns, row_delimiters=row_delimiters, contours=contours)
    if table is not None and check_table_coherency(table=table,
                                                   median_line_sep=median_line_sep,
                                                   char_length=char_length):
        return table
    return None
