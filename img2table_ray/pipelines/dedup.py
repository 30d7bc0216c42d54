"""Deduplication operators over the ``documents`` table — Ray-Data-native.

Five families (per the engine charter): exact hash dedup, MinHash+LSH
near-dup, SimHash, n-gram Jaccard verification, embedding-cosine near-dup.
All hashes are MD5-derived so the DuckDB oracles in
:mod:`img2table_ray.pipelines.oracles` reproduce them exactly.

Scale notes (100 TB design, tested single-node):

* ``exact_dedup``: content-hash in a vectorized ``map_batches``, then a
  *partial* min-reduce per batch (combiner) before the global
  ``groupby(hash)`` — the shuffle moves one row per (hash, batch), not one
  per document.
* ``minhash_lsh_pairs``: signature computation is embarrassingly parallel
  per batch; the only shuffle is the (band, band_hash) groupby whose groups
  are tiny (near-dup buckets).  Hot buckets (identical boilerplate) are
  capped per group with a documented limit rather than exploding O(n²).
* ``embedding_dup_pairs`` / brute-force ANN: the comparison side is
  broadcast via ``ray.put`` once, never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from img2table_ray.functions import hashing

SHINGLE_K = 3  # word-shingle width
NUM_HASHES = 16  # minhash signature length
BAND_SIZE = 2  # rows per LSH band -> 8 bands
JACCARD_NUM = 1  # keep pairs with n_inter * JACCARD_DEN >= n_union * JACCARD_NUM
JACCARD_DEN = 2  # i.e. Jaccard >= 0.5, compared in exact integer arithmetic
MAX_BUCKET = 64  # cap pairs per LSH bucket (hot-key guard; deterministic order)


def _docs(sf_dir: str) -> ray.data.Dataset:
    from img2table_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """One surviving doc per exact text hash: (content_hash, doc_id=min id).

    Pattern: vectorized hash -> per-batch combiner (min doc_id per hash) ->
    small global groupby.  Oracle: GROUP BY md5(text) with min(doc_id).
    """

    def hash_and_combine(batch: pd.DataFrame) -> pd.DataFrame:
        h = hashing.md5_hex_many(batch["text"].tolist())
        part = (
            pd.DataFrame({"content_hash": h, "doc_id": batch["doc_id"]})
            .groupby("content_hash", as_index=False)["doc_id"]
            .min()
        )
        return part

    partial = _docs(sf_dir).map_batches(
        hash_and_combine, batch_format="pandas", batch_size=4096
    )
    # right-size blocks before the shuffle: the combiner output is a small
    # fraction of the input, and Ray's sort-shuffle task count scales with
    # input blocks (at 100 TB this coalesce is a no-op relative to data size)
    partial = partial.repartition(8)
    return partial.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))


class _MinHashStage:
    """Actor-pool stage: shingle + minhash + LSH band hashes per batch.

    Emits exploded (doc_id, band, band_hash) rows.  Unique shingles are
    hashed once per batch (see hashing.minhash_signatures).
    """

    def __init__(self) -> None:
        # warm state: nothing heavy today, but regexes are compiled on import
        # and this is where a tokenizer model would be loaded once per actor.
        pass

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = [hashing.normalize_text(t) for t in batch["text"]]
        shingle_lists = [
            hashing.shingles_of(hashing.tokens_of(t), SHINGLE_K) for t in texts
        ]
        sigs = hashing.minhash_signatures(shingle_lists, NUM_HASHES)
        doc_ids: list[int] = []
        bands: list[int] = []
        bhashes: list[str] = []
        for doc_id, sig in zip(batch["doc_id"], sigs):
            if not sig:
                continue  # < SHINGLE_K tokens: no shingles, excluded
            bh = hashing.band_hashes(sig, BAND_SIZE)
            doc_ids.extend([doc_id] * len(bh))
            bands.extend(range(len(bh)))
            bhashes.extend(bh)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "band": pd.Series(bands, dtype="int64"),
                "band_hash": pd.Series(bhashes, dtype="object"),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All (a<b) pairs within one LSH bucket, capped at MAX_BUCKET docs."""
    ids = np.sort(group["doc_id"].unique())[:MAX_BUCKET]
    if len(ids) < 2:
        return pd.DataFrame({"doc_id_a": pd.Series(dtype="int64"),
                             "doc_id_b": pd.Series(dtype="int64")})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_id_a": ids[ia], "doc_id_b": ids[ib]})


def minhash_lsh_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct candidate near-dup pairs (doc_id_a < doc_id_b) from MinHash-LSH.

    shingle(k=3) -> 16 minhashes -> 8 bands of 2 -> groupby(band, band_hash)
    -> pairs -> distinct.
    """
    from img2table_ray.stages.util import actor_concurrency

    # small batches -> enough tasks to fill the pool (signature hashing is
    # the CPU-heavy stage; 1024-row batches left most actors idle)
    exploded = _docs(sf_dir).map_batches(
        _MinHashStage,
        batch_format="pandas",
        batch_size=256,
        concurrency=actor_concurrency(),
    )
    pairs = exploded.repartition(8).groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # distinct pairs: native aggregate (no per-group Python), drop the count
    from ray.data.aggregate import Count

    return (
        pairs.repartition(8)
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """LSH candidates verified by exact n-gram Jaccard >= 1/2.

    Columns: doc_id_a, doc_id_b, n_inter, n_union (exact integers).

    The verify side fetches the two shingle sets per pair.  Candidate sets
    are tiny relative to the corpus, so the shingle lookup for *candidate
    docs only* is broadcast via ``ray.put`` (at 100 TB this becomes a
    bucketed join keyed by doc_id; the broadcast is the documented
    small-side fast path).
    """
    cand = minhash_lsh_pairs(sf_dir)
    cand_tbl = pa.concat_tables(
        [b for b in cand.iter_batches(batch_size=65536, batch_format="pyarrow")]
        or [pa.table({"doc_id_a": pa.array([], pa.int64()),
                      "doc_id_b": pa.array([], pa.int64())})]
    )
    needed = set(cand_tbl["doc_id_a"].to_pylist()) | set(
        cand_tbl["doc_id_b"].to_pylist()
    )

    # build shingle sets for candidate docs only (small side), broadcast once
    def collect_shingles(batch: pd.DataFrame) -> pd.DataFrame:
        rows = batch[batch["doc_id"].isin(needed)]
        out = {
            "doc_id": rows["doc_id"].astype("int64"),
            "shingles": [
                list(
                    set(
                        hashing.shingles_of(
                            hashing.tokens_of(hashing.normalize_text(t)), SHINGLE_K
                        )
                    )
                )
                for t in rows["text"]
            ],
        }
        return pd.DataFrame(out)

    shingle_ds = _docs(sf_dir).map_batches(
        collect_shingles, batch_format="pandas", batch_size=4096
    )
    lookup: dict[int, frozenset] = {}
    for b in shingle_ds.iter_batches(batch_size=65536, batch_format="pandas"):
        for doc_id, sh in zip(b["doc_id"], b["shingles"]):
            lookup[int(doc_id)] = frozenset(sh)
    lookup_ref = ray.put(lookup)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        inter = np.empty(len(batch), dtype=np.int64)
        union = np.empty(len(batch), dtype=np.int64)
        for i, (a, b_) in enumerate(zip(batch["doc_id_a"], batch["doc_id_b"])):
            sa, sb = lk.get(int(a), frozenset()), lk.get(int(b_), frozenset())
            inter[i] = len(sa & sb)
            union[i] = len(sa | sb)
        out = pd.DataFrame(
            {
                "doc_id_a": batch["doc_id_a"].astype("int64"),
                "doc_id_b": batch["doc_id_b"].astype("int64"),
                "n_inter": inter,
                "n_union": union,
            }
        )
        return out[out["n_inter"] * JACCARD_DEN >= out["n_union"] * JACCARD_NUM]

    return ray.data.from_arrow(cand_tbl).map_batches(
        verify, batch_format="pandas", batch_size=8192
    )


def simhash_near_dup(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs: group by simhash band (4 x 15-bit chunks),
    verify Hamming distance <= max_hamming.  Columns: doc_id_a, doc_id_b,
    hamming.  Rows-only check (bit-twiddling SQL oracle omitted)."""

    def sim(batch: pd.DataFrame) -> pd.DataFrame:
        token_lists = [
            hashing.tokens_of(hashing.normalize_text(t)) for t in batch["text"]
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "simhash": hashing.simhash60_many(token_lists),
            }
        )

    sims = _docs(sf_dir).map_batches(sim, batch_format="pandas", batch_size=2048)

    def explode_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sh = batch["simhash"].to_numpy()
        frames = []
        for c in range(4):
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"],
                        "simhash": sh,
                        "chunk": np.full(n, c, dtype=np.int64),
                        "chunk_val": (sh >> (15 * c)) & 0x7FFF,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    exploded = sims.map_batches(explode_chunks, batch_format="pandas")

    def chunk_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()[:MAX_BUCKET]
        hs = g["simhash"].to_numpy()[:MAX_BUCKET]
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_id_a": pd.Series(dtype="int64"),
                 "doc_id_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([int(v).bit_count() for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_id_a": ids[ia][keep], "doc_id_b": ids[ib][keep],
             "hamming": ham[keep]}
        )

    pairs = exploded.repartition(8).groupby(["chunk", "chunk_val"]).map_groups(
        chunk_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Min as _Min

    return (
        pairs.repartition(8)
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(_Min("hamming", alias_name="hamming"))
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.42) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs (vec_id_a < vec_id_b, sim >= threshold).

    The default threshold (0.42) is tuned to the synthetic corpus, whose
    vectors are near-orthogonal (max pairwise cosine ~0.51) — a production
    near-dup run would use ~0.95+.

    The full embedding matrix is broadcast once via ``ray.put`` (it is the
    small side: n x 64 floats); each batch does one float64 matmul against
    it.  Columns: vec_id_a, vec_id_b, sim (round 4).  Ranking/thresholding
    uses round-6 values so the DuckDB double oracle agrees exactly.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat, norms))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat, all_norms = ray.get(ref)
        bm = np.array(batch["embedding"].tolist(), dtype=np.float64)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        sims = (bm @ all_mat.T) / bn[:, None] / all_norms[None, :]
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        ra, ca = np.where(np.round(sims, 6) >= threshold)
        keep = bids[ra] < all_ids[ca]
        ra, ca = ra[keep], ca[keep]
        return pd.DataFrame(
            {
                "vec_id_a": bids[ra],
                "vec_id_b": all_ids[ca],
                "sim": np.round(sims[ra, ca], 6),
            }
        )

    from img2table_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(fn, batch_format="pandas", batch_size=2048)
