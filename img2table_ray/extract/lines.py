"""Ruling-line detection (ref: src/img2table/tables/processing/
bordered_tables/lines.py), numpy-only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from img2table_ray.core.objects import Cell, Line
from img2table_ray.imgops.ccl import connected_components_with_stats
from img2table_ray.imgops.kernels import (
    bilateral3_color,
    laplacian3_abs,
    morph_close,
    morph_open,
    rgb2gray,
)


def identify_straight_lines(thresh: np.ndarray, min_line_length: float,
                            char_length: float, vertical: bool = True) -> list[Line]:
    """(ref lines.py:10-84): morphology chain OPEN(len/3) -> CLOSE(3x1
    hollow) -> CLOSE(len/6 dotted) -> OPEN(min_line_length), then per-CC
    subpixel centering."""
    d1 = round(min_line_length / 3) or 1
    kw, kh = (1, d1) if vertical else (d1, 1)
    mask = morph_open(thresh, kw, kh)

    hw, hh = (3, 1) if vertical else (1, 3)
    mask_closed = morph_close(mask, hw, hh)

    d2 = round(min_line_length / 6) or 1
    dw, dh = (1, d2) if vertical else (d2, 1)
    mask_dotted = morph_close(mask_closed, dw, dh)

    d3 = int(min_line_length) or 1
    fw, fh = (1, d3) if vertical else (d3, 1)
    final_mask = morph_open(mask_dotted, fw, fh)

    _, _, stats = connected_components_with_stats(final_mask)

    lines = []
    for idx in range(1, len(stats)):
        x, y, w, h, area = (int(v) for v in stats[idx])
        if max(w, h) / min(w, h) < 5 and min(w, h) >= char_length:
            continue
        if max(w, h) < min_line_length:
            continue

        cropped = thresh[y : y + h, x : x + w]
        if w >= h:
            non_blank = np.where(cropped.sum(axis=0) > 0)
            line_rows = np.where((cropped.sum(axis=1) / 255) >= 0.5 * w)
            if len(line_rows[0]) == 0:
                continue
            line = Line(x1=x + int(np.min(non_blank)),
                        y1=y + round(float(np.mean(line_rows))),
                        x2=x + int(np.max(non_blank)),
                        y2=y + round(float(np.mean(line_rows))),
                        thickness=int(np.max(line_rows) - np.min(line_rows) + 1))
        else:
            non_blank = np.where(cropped.sum(axis=1) > 0)
            line_cols = np.where((cropped.sum(axis=0) / 255) >= 0.5 * h)
            if len(line_cols[0]) == 0:
                continue
            line = Line(x1=x + round(float(np.mean(line_cols))),
                        y1=y + int(np.min(non_blank)),
                        x2=x + round(float(np.mean(line_cols))),
                        y2=y + int(np.max(non_blank)),
                        thickness=int(np.max(line_cols) - np.min(line_cols) + 1))
        lines.append(line)
    return lines


def detect_lines(img: np.ndarray, contours: Optional[list[Cell]],
                 char_length: Optional[float],
                 min_line_length: Optional[float]) -> tuple[list[Line], list[Line]]:
    """(ref lines.py:87-120): bilateral blur -> Laplacian edges -> zero out
    text contours -> binarize at min(2.5*mean, max) -> directional line
    identification."""
    blur = bilateral3_color(img, 40.0, 80.0)
    gray = rgb2gray(blur)

    edge_img = laplacian3_abs(gray)

    for c in contours:
        edge_img[c.y1 - 1 : c.y2 + 1, c.x1 - 1 : c.x2 + 1] = 0
    binary_img = (
        255 * (edge_img >= min(2.5 * np.mean(edge_img), np.max(edge_img)))
    ).astype(np.uint8)

    h_lines = identify_straight_lines(thresh=binary_img, min_line_length=min_line_length,
                                      char_length=char_length, vertical=False)
    v_lines = identify_straight_lines(thresh=binary_img, min_line_length=min_line_length,
                                      char_length=char_length, vertical=True)
    return h_lines, v_lines
