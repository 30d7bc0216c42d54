"""Cell-grid identification from detected ruling lines
(ref: src/img2table/tables/processing/bordered_tables/cells/*), numpy/Python.
"""

from __future__ import annotations

import numpy as np

from img2table_ray.core.objects import Cell, Line


def identify_cells(h_lines_arr: np.ndarray, v_lines_arr: np.ndarray) -> np.ndarray:
    """Candidate cell bands from h-line pairs + v-line delimiters
    (ref cells/identification.py:9-90, order of operations preserved)."""
    potential_cells = []
    n = h_lines_arr.shape[0]
    for i in range(n):
        x1i, y1i, x2i, y2i = (int(v) for v in h_lines_arr[i])
        for j in range(n):
            x1j, y1j, x2j, y2j = (int(v) for v in h_lines_arr[j])
            if y1i >= y1j:
                continue
            denom = (x2i - x1i) or 1
            l_corresponds = -0.02 <= (x1i - x1j) / denom <= 0.02
            r_corresponds = -0.02 <= (x2i - x2j) / denom <= 0.02
            l_contained = (x1i <= x1j <= x2i) or (x1j <= x1i <= x2j)
            r_contained = (x1i <= x2j <= x2i) or (x1j <= x2i <= x2j)
            if (l_corresponds or l_contained) and (r_corresponds or r_contained):
                potential_cells.append([max(x1i, x1j), min(x2i, x2j), y1i, y2j])

    if not potential_cells:
        return np.empty((0, 4), dtype=np.int64)

    # Two-pass dedup: keep lowest lower bound per (x1, x2, y1), then highest
    # upper bound per (x1, x2, y2) (ref identification.py:39-60)
    potential_cells = sorted(potential_cells)
    dedup_upper = []
    prev = (0, 0, 0)
    for x1, x2, y1, y2 in potential_cells:
        if (x1, x2, y1) != prev:
            dedup_upper.append([x1, x2, y2, -y1])
        prev = (x1, x2, y1)

    dedup_upper = sorted(dedup_upper)
    dedup_lower = []
    prev = (0, 0, 0)
    for x1, x2, y2, neg_y1 in dedup_upper:
        if (x1, x2, y2) != prev:
            dedup_lower.append([x1, x2, -neg_y1, y2])
        prev = (x1, x2, y2)

    cells = []
    for x1, x2, y1, y2 in dedup_lower:
        margin = max(5, (x2 - x1) * 0.025)
        delimiters = []
        for j in range(v_lines_arr.shape[0]):
            x1v, y1v, x2v, y2v = (int(v) for v in v_lines_arr[j])
            if x1 - margin <= x1v <= x2 + margin:
                overlap = min(y2, y2v) - max(y1, y1v)
                tolerance = max(5, min(10, 0.1 * (y2 - y1)))
                if y2 - y1 - overlap <= tolerance:
                    delimiters.append(x1v)
        if len(delimiters) >= 2:
            delimiters = sorted(delimiters)
            for d1, d2 in zip(delimiters, delimiters[1:]):
                cells.append([d1, y1, d2, y2])

    return np.array(cells, dtype=np.int64) if cells else np.empty((0, 4), dtype=np.int64)


def get_cells_dataframe(horizontal_lines: list[Line], vertical_lines: list[Line]) -> list[Cell]:
    if len(horizontal_lines) * len(vertical_lines) == 0:
        return []
    h_arr = np.array([[ln.x1, ln.y1, ln.x2, ln.y2] for ln in horizontal_lines], dtype=np.int64)
    v_arr = np.array([[ln.x1, ln.y1, ln.x2, ln.y2] for ln in vertical_lines], dtype=np.int64)
    cells_array = identify_cells(h_lines_arr=h_arr, v_lines_arr=v_arr)
    return [Cell(x1=int(c[0]), y1=int(c[1]), x2=int(c[2]), y2=int(c[3])) for c in cells_array]


def deduplicate_cells(cells: list[Cell]) -> list[Cell]:
    """Paint coverage smallest-first; keep cell iff >= 25% uncovered
    (ref cells/deduplication.py:7-25)."""
    x_max = max([c.x2 for c in cells] + [0])
    y_max = max([c.y2 for c in cells] + [0])
    coverage = np.ones((y_max, x_max), dtype=np.uint8)
    dedup = []
    for c in sorted(cells, key=lambda c: c.area):
        cropped = coverage[c.y1 : c.y2, c.x1 : c.x2]
        if cropped.sum() >= 0.25 * c.area:
            dedup.append(c)
            coverage[c.y1 : c.y2, c.x1 : c.x2] = 0
    return dedup


def get_cells(horizontal_lines: list[Line], vertical_lines: list[Line]) -> list[Cell]:
    cells = get_cells_dataframe(horizontal_lines=horizontal_lines, vertical_lines=vertical_lines)
    return deduplicate_cells(cells=cells)
