"""Text-mask identification via adaptive RLSA (ref: src/img2table/tables/
processing/borderless_tables/layout/rlsa.py, after Nikolaou et al. 2010
"Segmentation of historical machine-printed documents using Adaptive Run
Length Smoothing" — public algorithm).  numba kernels -> numpy/Python with
row-run vectorization.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from img2table_ray.core.objects import Line, Table
from img2table_ray.imgops.ccl import connected_components_with_stats
from img2table_ray.imgops.kernels import dilate, erode, window_sum


def remove_noise(cc: np.ndarray, cc_stats: np.ndarray, average_height: float,
                 median_width: float) -> np.ndarray:
    """(ref rlsa.py:17-51) zero out noisy CC labels in-place."""
    for idx in range(1, len(cc_stats)):
        x, y, w, h, area = (int(v) for v in cc_stats[idx])
        is_dash = (w / h >= 2) and (0.5 * median_width <= w <= 1.5 * median_width)
        if is_dash:
            continue
        cond_height = h < average_height / 3
        cond_elongation = max(h, w) / max(min(h, w), 1) < 0.33
        cond_low_density = area / (max(w, 1) * max(h, 1)) < 0.08
        if cond_height or cond_elongation or cond_low_density:
            sub = cc[y : y + h, x : x + w]
            sub[sub == idx] = 0
    return cc


def adaptive_rlsa(cc: np.ndarray, cc_stats: np.ndarray, a: float, th: float,
                  c: float) -> np.ndarray:
    """(ref rlsa.py:54-118) run-length smoothing between horizontally
    adjacent CCs subject to distance / height-ratio / overlap / no-other-CC
    conditions.  Vectorized over consecutive nonzero pixels per row."""
    rsla_img = (cc > 0).astype(np.uint8)
    h, w = cc.shape
    x1s = cc_stats[:, 0]
    y1s = cc_stats[:, 1]
    ws = cc_stats[:, 2]
    hs = cc_stats[:, 3]

    for row in range(h):
        cc_row = cc[row]
        cols = np.nonzero(cc_row)[0]
        if len(cols) < 2:
            continue
        labs = cc_row[cols]
        prev_cols, cur_cols = cols[:-1], cols[1:]
        prev_labs, cur_labs = labs[:-1], labs[1:]

        # same-label fills (gap inside one CC, e.g. hollow glyphs);
        # obstacle pixels (-1) never fill — the reference skips them before
        # the same-label branch (rlsa.py:80-82)
        same = (prev_labs == cur_labs) & (prev_labs != -1)
        for p, q in zip(prev_cols[same], cur_cols[same]):
            rsla_img[row, p:q] = 1

        # candidate pairs: different labels, neither is an obstacle (-1)
        cand = (~same) & (prev_labs != -1) & (cur_labs != -1)
        if not cand.any():
            continue
        pl = prev_labs[cand].astype(np.int64)
        cl = cur_labs[cand].astype(np.int64)
        p = prev_cols[cand]
        q = cur_cols[cand]
        length = q - p - 1
        hc, hp = hs[cl], hs[pl]
        height_ratio = np.maximum(hc, hp) / np.maximum(np.minimum(hc, hp), 1)
        h_overlap = np.minimum(y1s[cl] + hc, y1s[pl] + hp) - np.maximum(y1s[cl], y1s[pl])
        ok = (
            (length <= a * np.minimum(hc, hp))
            & (height_ratio <= th)
            & (h_overlap >= c * np.minimum(hc, hp))
        )
        if not ok.any():
            continue
        ylo = max(0, row - 2)
        yhi = min(row + 3, h)
        for i in np.where(ok)[0]:
            # no-other-CC check in the +-2 row band between the two CCs
            window = cc[ylo:yhi, p[i] + 1 : q[i]]
            allowed = {-1, 0, int(cl[i]), int(pl[i])}
            others = np.unique(window)
            if all(int(v) in allowed for v in others):
                rsla_img[row, p[i] : q[i]] = 1
    return rsla_img


def find_obstacles(img: np.ndarray, min_width: float) -> np.ndarray:
    """(ref rlsa.py:121-159) vertical empty corridors of width >= min_width
    and height > h/5."""
    mask = np.zeros(img.shape, dtype=bool)
    min_width = int(np.ceil(min_width))
    h, w = img.shape
    if w <= min_width:
        return mask
    # windowed any over [col, col+min_width) for cols 0..w-min_width-1
    on = (img > 0).astype(np.uint8)
    s = window_sum(on, min_width, 1, ax=0, ay=0)  # anchor at window start
    has = s[:, : w - min_width] > 0  # (h, w-min_width)

    for col in range(w - min_width):
        rows = np.nonzero(has[:, col])[0]
        prev = -1
        for r in rows:
            if r - prev - 1 > h / 5:
                mask[prev + 1 : r, col : col + min_width] = True
            prev = r
        # trailing gap (reference keeps the last loop row h-1)
        if (h - 1) - prev > h / 5:
            mask[prev + 1 : h, col : col + min_width] = True
    return mask


def get_text_mask(thresh: np.ndarray, cc_stats_rlsa: np.ndarray, char_length: float,
                  median_width: float) -> np.ndarray:
    """(ref rlsa.py:162-236) transition-count text/non-text classification."""
    text_mask = np.zeros(thresh.shape, dtype=bool)

    heights = cc_stats_rlsa[1:, 3].astype(np.float64)
    areas = cc_stats_rlsa[1:, 4].astype(np.float64)
    denum = areas.sum()
    Hm = float((heights * areas).sum() / max(denum, 1))

    on = thresh == 255
    for idx in range(len(cc_stats_rlsa)):
        x, y, w, h, area = (int(v) for v in cc_stats_rlsa[idx])
        if (w / h >= 2) and (0.5 * median_width <= w <= 1.5 * median_width):
            text_mask[y : y + h, x : x + w] = True
            continue
        if idx == 0 or min(w, h) <= 2 * char_length / 3:
            continue

        sub = on[y : y + h, x : x + w]
        # horizontal white->black transitions (thresh==255 counts as "black")
        h_tc = int(sub[:, 0].sum()) + int((sub[:, 1:] & ~sub[:, :-1]).sum())
        # vertical transitions + columns containing pixels
        v_tc = int(sub[0, :].sum()) + int((sub[1:, :] & ~sub[:-1, :]).sum())
        nb_cols = int(sub.any(axis=0).sum())

        H = h
        R = w / max(h, 1)
        THx = h_tc / max(nb_cols, 1)
        TVx = v_tc / max(nb_cols, 1)
        THy = h_tc / max(h, 1)

        is_text = False
        if (0.8 * Hm <= H <= 1.2 * Hm) or (0.8 * Hm > H and 1.2 < THx < 3.5):
            is_text = True
        elif (THx < 0.2 and R > 5 and 0.95 < TVx < 1.05) or (THx > 5 and R < 0.2 and 0.95 < THy < 1.05):
            is_text = False
        elif 1.2 * Hm < H and 1.2 < THx < 3.5 and 1.2 < TVx < 3.5:
            is_text = True
        if is_text:
            text_mask[y : y + h, x : x + w] = True
    return text_mask


def identify_text_mask(thresh: np.ndarray, lines: list[Line], char_length: float,
                       existing_tables: Optional[list[Table]] = None) -> np.ndarray:
    """(ref rlsa.py:239-305)"""
    # mask detected ruling lines (cv2.rectangle filled -> slice assignment;
    # cv2 rectangle coordinates are INCLUSIVE of the end point)
    for line in lines:
        if line.horizontal and line.length >= 3 * char_length:
            thresh[max(0, line.y1 - line.thickness // 2 - 1) : line.y2 + line.thickness // 2 + 2,
                   line.x1 : line.x2 + 1] = 0
        elif line.vertical and line.length >= 2 * char_length:
            thresh[line.y1 : line.y2 + 1,
                   max(0, line.x1 - line.thickness // 2 - 1) : line.x2 + line.thickness // 2 + 2] = 0

    thresh = dilate(thresh, 2, 1)

    n, cc, cc_stats = connected_components_with_stats(thresh)
    if len(cc_stats) <= 1:
        return thresh

    average_height = float(np.mean(cc_stats[1:, 3]))
    median_width = float(np.median(cc_stats[1:, 2]))
    cc_denoised = remove_noise(cc=cc, cc_stats=cc_stats, average_height=average_height,
                               median_width=median_width)

    rlsa_small = adaptive_rlsa(cc=cc_denoised, cc_stats=cc_stats, a=1, th=3.5, c=0.4)
    rlsa_small = erode((255 * (rlsa_small > 0)).astype(np.uint8), 1, 2)

    mask_obstacles = find_obstacles(img=np.maximum(rlsa_small, thresh), min_width=char_length)
    cc_obstacles = cc_denoised.copy()
    cc_obstacles[mask_obstacles] = -1

    rlsa_image = adaptive_rlsa(cc=cc_obstacles, cc_stats=cc_stats, a=5, th=3.5, c=0.4)

    _, _, cc_stats_rlsa = connected_components_with_stats(
        (255 * (rlsa_image > 0)).astype(np.uint8)
    )

    text_mask = get_text_mask(thresh=thresh, cc_stats_rlsa=cc_stats_rlsa,
                              char_length=char_length, median_width=median_width)

    cc_final = cc_obstacles.copy()
    cc_final[~text_mask] = -1
    rlsa_final = adaptive_rlsa(cc=cc_final, cc_stats=cc_stats, a=1.25, th=3.5, c=0.4)

    for tb in existing_tables or []:
        rlsa_final[tb.y1 : tb.y2, tb.x1 : tb.x2] = 0

    return erode((255 * rlsa_final).astype(np.uint8), 1, 2)
