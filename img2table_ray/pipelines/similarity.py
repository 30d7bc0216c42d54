"""Similarity search over the ``embeddings`` table — Ray-Data-native.

* ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast via
  ``ray.put`` once; each batch computes one float64 matmul against it and
  emits (query_id, candidate, sim) rows; a final small global top-k per
  query runs via groupby.  This is the exact baseline.
* ``ann_ivf_topk`` — the scale path: a one-pass IVF (k-means-lite with
  deterministic seeds) assigns every vector to a centroid bucket; queries
  probe only the ``nprobe`` nearest buckets.  Approximate by design ->
  rows-only correctness check; the exact baseline above is the oracle-backed
  entry.

All similarity math upcasts the float32 storage to float64 so the DuckDB
oracle (``embedding::DOUBLE[]``) agrees; ranking uses round-6 sims with
vec_id tie-break so ordering is engine-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data

from img2table_ray.sources.readers import read_parquet_clean

N_QUERIES = 8  # queries = vec_id < N_QUERIES (deterministic subset)
TOP_K = 10
TRAIN_CAP = 4096  # max vectors pulled to the driver for IVF training


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _load_queries(sf_dir: str):
    """Filtered read of ONLY the query vectors (predicate pushdown on
    vec_id) — the driver never materializes the full embeddings table."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    ids = np.asarray(tbl["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.argsort(ids)
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    return ids[order], _normalize(mat[order])


def train_centroids(sf_dir: str, nlist: int, cap: int = TRAIN_CAP) -> np.ndarray:
    """IVF centroids from a BOUNDED deterministic sample (<= ~cap vectors):
    the sample predicate (vec_id % stride == 0) is evaluated distributed in
    ``map_batches``; only the sampled rows reach the driver, so training
    memory is O(cap), not O(corpus)."""
    n_total = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    stride = max(1, n_total // cap)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["vec_id"] % stride == 0]

    sample = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
        .map_batches(pick, batch_format="pandas", batch_size=8192)
        .to_pandas()
        .sort_values("vec_id")
    )
    mat = _normalize(np.array(sample["embedding"].tolist(), dtype=np.float64))
    return _kmeans_lite(mat, nlist)


def ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact brute-force cosine top-k for the first N_QUERIES vectors.

    Columns: query_id, vec_id, sim (round 4), rank (1-based).  Self-matches
    excluded.  Rank order: round-6 sim desc, vec_id asc.
    """
    qids, qmat = _load_queries(sf_dir)
    ref = ray.put((qids, qmat))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q_mat = ray.get(ref)
        bm = np.array(batch["embedding"].tolist(), dtype=np.float64)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        bm = bm / bn[:, None]
        sims = q_mat @ bm.T  # (nq, nb)
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        nq, nb = sims.shape
        qcol = np.repeat(q_ids, nb)
        vcol = np.tile(bids, nq)
        scol = np.round(sims.ravel(), 6)
        keep = qcol != vcol
        df = pd.DataFrame({"query_id": qcol[keep], "vec_id": vcol[keep],
                           "sim6": scol[keep]})
        # per-batch partial top-k (combiner): only k rows per query leave the batch
        df = df.sort_values(["query_id", "sim6", "vec_id"],
                            ascending=[True, False, True])
        return df.groupby("query_id", as_index=False).head(TOP_K)

    scored = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pandas", batch_size=4096)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim6", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "vec_id": g["vec_id"].astype("int64"),
                "sim": g["sim6"].to_numpy(),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _kmeans_lite(mat: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic k-means on normalized vectors (init = evenly spaced rows)."""
    n = len(mat)
    cent = mat[np.linspace(0, n - 1, k).astype(np.int64)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def ann_ivf_topk(sf_dir: str, nlist: int = 16, nprobe: int = 6,
                 nassign: int = 2) -> pd.DataFrame:
    """IVF-style approximate top-k (the 100 TB scale path).

    Centroids are trained on a bounded distributed sample (``train_centroids``
    — O(TRAIN_CAP) driver memory), broadcast via ``ray.put``; each batch
    assigns its vectors to their ``nassign`` nearest centroid buckets
    (multi-probe assignment — recall insurance when true neighbors straddle
    a Voronoi boundary) and only scores vectors sharing a bucket with the
    query's ``nprobe`` probed buckets.  Rows-only in the driver gate
    (approximate by construction); quality is pinned in CI instead:
    ``tests/test_scale_guards.py::test_ivf_recall_at_10`` asserts
    recall@10 >= 0.9 vs the exact ``ann_topk``.  The defaults reach 0.95 on
    the synthetic near-orthogonal test embeddings (the hard case — real
    clustered embeddings prune far better at the same recall).
    """
    cent = train_centroids(sf_dir, nlist)
    qids, qmat = _load_queries(sf_dir)
    qprobe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qids, qmat, cent, qprobe))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q_mat, centroids, q_probe = ray.get(ref)
        bm = np.array(batch["embedding"].tolist(), dtype=np.float64)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        bm = bm / bn[:, None]
        buckets = np.argsort(-(bm @ centroids.T), axis=1)[:, :nassign]
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        frames = []
        for qi in range(len(q_ids)):
            probe_mask = np.isin(buckets, q_probe[qi]).any(axis=1)
            if not probe_mask.any():
                continue
            sims = bm[probe_mask] @ q_mat[qi]
            cand_ids = bids[probe_mask]
            keep = cand_ids != q_ids[qi]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(keep.sum(), q_ids[qi], dtype=np.int64),
                        "vec_id": cand_ids[keep],
                        "sim6": np.round(sims[keep], 6),
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "sim6": pd.Series(dtype="float64")})
        df = pd.concat(frames, ignore_index=True)
        df = df.sort_values(["query_id", "sim6", "vec_id"],
                            ascending=[True, False, True])
        return df.groupby("query_id", as_index=False).head(TOP_K)

    scored = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pandas", batch_size=4096)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim6", "vec_id"], ascending=[False, True]).head(TOP_K)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "vec_id": g["vec_id"].astype("int64"),
                "sim": g["sim6"].to_numpy(),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")
