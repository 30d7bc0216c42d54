"""Connected-component labeling with stats — numpy/run-based replacement for
cv2.connectedComponentsWithStats(img, 8, CV_32S).

Two-pass run-merging: rows are split into foreground runs (vectorized), runs
are unioned across adjacent rows (8-connectivity: x-ranges within +-1), and
final labels are renumbered in raster order of each component's first run —
matching OpenCV's observable label ordering (background = 0, components in
top-left first-appearance order).

Returns (n_labels, labels, stats) where stats[i] = [x, y, w, h, area] like
cv2 (stats[0] = background row covering the full image).
"""

from __future__ import annotations

import numpy as np


def connected_components_with_stats(binary: np.ndarray):
    h, w = binary.shape
    fg = binary > 0

    # --- extract runs per row (vectorized over the whole image) ---
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = fg
    diff = np.diff(padded.astype(np.int8), axis=1)
    starts_r, starts_c = np.where(diff == 1)   # run starts (col index in image coords)
    ends_r, ends_c = np.where(diff == -1)      # run ends (exclusive)
    # diff guarantees starts and ends pair up row by row in order
    n_runs = len(starts_r)
    if n_runs == 0:
        labels = np.zeros((h, w), dtype=np.int32)
        stats = np.array([[0, 0, w, h, h * w]], dtype=np.int32)
        return 1, labels, stats

    run_row = starts_r
    run_x1 = starts_c
    run_x2 = ends_c  # exclusive

    # --- union runs between consecutive rows (8-connectivity) ---
    # Vectorized adjacency: runs are raster-sorted, so with a row-keyed
    # coordinate (row*W2 + x, W2 > max x) ONE global searchsorted pair finds,
    # for every run, the index range of previous-row runs whose x-interval
    # touches it (diagonal contact included).  Only the union-find over the
    # resulting pair list is a Python loop (~one iteration per contact).
    parent = np.arange(n_runs, dtype=np.int64)

    W2 = w + 2
    prev_key_x2 = (run_row + 1) * W2 + run_x2  # prev-row runs shifted down
    prev_key_x1 = (run_row + 1) * W2 + run_x1
    lo = np.searchsorted(prev_key_x2, run_row * W2 + run_x1 - 1, side="right")
    hi = np.searchsorted(prev_key_x1, run_row * W2 + run_x2 + 1, side="left")
    counts = np.maximum(hi - lo, 0)
    total_pairs = int(counts.sum())
    if total_pairs:
        a_idx = np.repeat(np.arange(n_runs), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        b_idx = (np.arange(total_pairs, dtype=np.int64)
                 - np.repeat(cum, counts) + np.repeat(lo, counts))
        # Vectorized min-label union (Shiloach–Vishkin shape): hook each
        # edge's larger current label onto the smaller, then pointer-jump
        # to compress; O(E) numpy work per round, rounds ~ O(log n).
        # Which run ends up the root does not matter — final labels are
        # renumbered by raster order of each component's first run below.
        while True:
            pa = parent[a_idx]
            pb = parent[b_idx]
            lo_lab = np.minimum(pa, pb)
            hi_lab = np.maximum(pa, pb)
            before = parent.copy()
            np.minimum.at(parent, hi_lab, lo_lab)
            while True:
                pp = parent[parent]
                if np.array_equal(pp, parent):
                    break
                parent = pp
            if np.array_equal(parent, before):
                break

    roots = parent

    # --- renumber components in raster order of first run ---
    # first occurrence order of roots in run order (runs already raster-sorted)
    _, first_idx, inv = np.unique(roots, return_index=True, return_inverse=True)
    order = np.argsort(first_idx)  # component rank by first run position
    rank_of_unique = np.empty_like(order)
    rank_of_unique[order] = np.arange(len(order))
    comp = rank_of_unique[inv] + 1  # 1-based labels, raster order
    n_comp = len(order)

    # --- stats per component ---
    run_len = run_x2 - run_x1
    x1s = np.full(n_comp + 1, w, dtype=np.int64)
    x2s = np.zeros(n_comp + 1, dtype=np.int64)
    y1s = np.full(n_comp + 1, h, dtype=np.int64)
    y2s = np.zeros(n_comp + 1, dtype=np.int64)
    areas = np.zeros(n_comp + 1, dtype=np.int64)
    np.minimum.at(x1s, comp, run_x1)
    np.maximum.at(x2s, comp, run_x2)
    np.minimum.at(y1s, comp, run_row)
    np.maximum.at(y2s, comp, run_row + 1)
    np.add.at(areas, comp, run_len)

    stats = np.zeros((n_comp + 1, 5), dtype=np.int32)
    stats[0] = [0, 0, w, h, h * w - int(areas[1:].sum())]
    stats[1:, 0] = x1s[1:]
    stats[1:, 1] = y1s[1:]
    stats[1:, 2] = x2s[1:] - x1s[1:]
    stats[1:, 3] = y2s[1:] - y1s[1:]
    stats[1:, 4] = areas[1:]

    # --- label image (vectorized run expansion, no per-run Python) ---
    labels = np.zeros(h * w, dtype=np.int32)
    total = int(run_len.sum())
    cum = np.concatenate(([0], np.cumsum(run_len)[:-1]))
    offsets = np.arange(total, dtype=np.int64) - np.repeat(cum, run_len)
    flat_idx = np.repeat(run_row.astype(np.int64) * w + run_x1, run_len) + offsets
    labels[flat_idx] = np.repeat(comp.astype(np.int32), run_len)

    return n_comp + 1, labels.reshape(h, w), stats
