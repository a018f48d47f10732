"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix, per-batch partial top-k → driver merge (one streaming
  pass, no shuffle)
- LSH-bucketed variant (random hyperplanes): the scale path — bucket
  vectors once, search only matching buckets.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix via ONE
    flatten+reshape memcpy (no per-row Python). Ragged rows (not a real
    embedding column) fall back to the per-row path for correctness."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()  # honors offsets/slices for list and fixed_size_list
    vals = np.asarray(flat, dtype=np.float64)
    n = len(arr)
    if n == 0:
        return vals.reshape(0, 0)
    if arr.null_count == 0:
        import pyarrow.compute as pc

        mm = pc.min_max(pc.list_value_length(arr))
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        # rows must ALL be the same length — a bare divisibility check
        # would silently mis-reshape ragged rows whose total happens to
        # divide evenly
        if lo == hi and hi is not None:
            return vals.reshape(n, int(hi))
    return np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])


def topk_cosine(ds: rd.Dataset, query: np.ndarray, k: int = 10,
                embedding_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Exact top-k by cosine similarity: per-batch vectorized partial
    top-k, merged on the driver (partials are k rows per batch)."""
    q = np.asarray(query, np.float64)
    qn = q / np.linalg.norm(q)

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, embedding_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qn) / norms
        ids = batch.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        try:  # deterministic tie-break: sim DESC then id ASC — so the
            # merged top-k is layout-independent even with exact ties
            # (byte-identical vectors), matching the driver merge's key
            order = np.lexsort((np.asarray(ids), -sims))
        except (TypeError, ValueError):  # non-numeric ids: stable by position
            order = np.argsort(-sims, kind="stable")
        top = order[:k]
        return pa.table({
            id_col: ids.take(pa.array(top)),
            "sim": pa.array(sims[top]),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    # sort key (-sim, id) == nlargest by (sim, -id) but works for
    # string ids too (the per-batch fallback already tolerates them)
    best = sorted(rows, key=lambda r: (-r["sim"], r[id_col]))[:k]
    return pd.DataFrame(best)


class HyperplaneLsh:
    """Seeded random-hyperplane LSH for cosine similarity."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)


def add_lsh_bucket(ds: rd.Dataset, dim: int, embedding_col: str = "embedding",
                   n_bits: int = 16, seed: int = 42) -> rd.Dataset:
    """Bucket stage for the ANN scale path: one int64 bucket per vector.
    Query-time: hash the query, scan only rows whose bucket matches
    (plus neighbors at hamming ≤ 1 for recall)."""
    class Bucketer:
        def __init__(self):
            self.lsh = HyperplaneLsh(dim, n_bits, seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, embedding_col)
            return batch.append_column("lsh_bucket", pa.array(self.lsh.bucket(m)))

    return ds.map_batches(Bucketer(), batch_format="pyarrow")


def build_ivf_centroids(ds: rd.Dataset, embedding_col: str = "embedding",
                        n_centroids: int = 64, sample_per_batch: int = 1024,
                        iters: int = 10, seed: int = 42) -> np.ndarray:
    """IVF coarse quantizer: k-means on a deterministic stride sample
    (driver-side numpy — centroids are tiny and broadcast)."""
    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, embedding_col)
        stride = max(1, len(m) // sample_per_batch)
        return pa.table({"v": pa.array(list(m[::stride].astype(np.float32)))})

    samples = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        samples.extend(np.asarray(x, np.float64) for x in b.column("v").to_pylist())
    x = np.stack(samples)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(x))
    cent = x[rng.choice(len(x), k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def add_ivf_bucket(ds: rd.Dataset, centroids: np.ndarray,
                   embedding_col: str = "embedding") -> rd.Dataset:
    """Assign each vector to its nearest centroid (one gather-free
    matmul per batch; centroids ship once per actor)."""
    class Assigner:
        def __init__(self):
            self.cent = centroids

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, embedding_col)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return batch.append_column(
                "ivf_bucket", pa.array(np.argmax(m @ self.cent.T, axis=1).astype(np.int32)))

    return ds.map_batches(Assigner(), batch_format="pyarrow")


def topk_cosine_ivf(ds_bucketed: rd.Dataset, centroids: np.ndarray,
                    query: np.ndarray, k: int, nprobe: int = 4,
                    embedding_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Probe only the ``nprobe`` centroids nearest the query — the IVF
    scale path (scan fraction ≈ nprobe/n_centroids)."""
    q = np.asarray(query, np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = pa.array(np.argsort(-(centroids @ qn))[:nprobe].astype(np.int32))
    import pyarrow.compute as pc

    cand = ds_bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_bucket"), value_set=probe)),
        batch_format="pyarrow",
    )
    return topk_cosine(cand, query, k, embedding_col, id_col)


def topk_cosine_lsh(ds_bucketed: rd.Dataset, query: np.ndarray, k: int,
                    dim: int, embedding_col: str = "embedding",
                    id_col: str = "vec_id", n_bits: int = 16, seed: int = 42) -> pd.DataFrame:
    """Search only buckets within hamming ≤ 1 of the query's bucket."""
    lsh = HyperplaneLsh(dim, n_bits, seed)
    qb = int(lsh.bucket(np.asarray(query, np.float64)[None, :])[0])
    near = pa.array([qb] + [qb ^ (1 << i) for i in range(n_bits)], pa.int64())
    import pyarrow.compute as pc

    cand = ds_bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b.column("lsh_bucket"), value_set=near)),
        batch_format="pyarrow",
    )
    return topk_cosine(cand, query, k, embedding_col, id_col)
