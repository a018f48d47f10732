"""Deduplication for document corpora.

- exact: sha256(text) hash-partition + per-group min-id keep
- MinHash + LSH: shingle → minhash → band → bucket groupby → candidate
  pairs → signature-similarity verify → connected components
- SimHash: 64-bit token-hash sketch, banded for candidate generation
- n-gram Jaccard: exact pairwise verification kernel

Shuffle anatomy: one groupby on the content hash (exact) or on
(band_id, band_hash) (near-dup). Everything upstream is per-batch
vectorized; sketches are tiny compared to the documents, so the
shuffle moves signatures, not text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_PRIME = (1 << 61) - 1


def _sha256_col(texts: list[str]) -> list[str]:
    return [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]


def add_content_hash(ds: rd.Dataset, text_col: str, out_col: str = "content_sha256") -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, pa.array(_sha256_col(batch.column(text_col).to_pylist())))
    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keep the min-id row per distinct text (hash-partitioned)."""
    hashed = add_content_hash(ds, text_col)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[id_col].idxmin()]]

    out = hashed.groupby("content_sha256").map_groups(keep_min, batch_format="pandas")
    return out.drop_columns(["content_sha256"])


# --------------------------------------------------------------------------
# shingles + minhash (vectorized per batch)
# --------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte shingle hashes via a vectorized polynomial rolling
    hash over the utf-8 bytes."""
    b = np.frombuffer(text.encode(), np.uint8)
    n = len(b) - k + 1
    if n <= 0:
        return np.array([0], np.uint64)
    # stacked view: n × k matrix of byte windows
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    w = b[idx].astype(np.uint64)
    weights = np.power(np.uint64(1000003), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)  # wrapping mod 2^64
    h = (w * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _minhash_sig(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x+b) mod p over the shingle set."""
    x = shingles % np.uint64(_PRIME)
    v = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_PRIME)
    return v.min(axis=1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PRIME, num_perm, dtype=np.uint64)
    b = rng.integers(0, _PRIME, num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation params generated once per actor."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64,
                 shingle_k: int = 5, seed: int = 42):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        sigs = np.stack([
            _minhash_sig(_shingle_hashes(t or "", self.k), self.a, self.b)
            for t in texts
        ])
        return pa.table({
            self.id_col: pa.array(ids),
            "minhash": pa.array(list(sigs.astype(np.uint64))),
        })


def minhash_signatures(ds: rd.Dataset, text_col: str, id_col: str,
                       num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                       concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, shingle_k, seed),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def lsh_candidate_pairs(sig_ds: rd.Dataset, id_col: str, num_perm: int = 64,
                        bands: int = 16) -> rd.Dataset:
    """Explode signatures to (band_id, band_hash) rows; docs sharing a
    bucket are candidates. Returns (id_a, id_b, est_jaccard) pairs."""
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = [np.asarray(s, np.uint64) for s in batch.column("minhash").to_pylist()]
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for i, sig in zip(ids, sigs):
            for bnd in range(bands):
                seg = sig[bnd * rows_per_band:(bnd + 1) * rows_per_band]
                out_id.append(i)
                out_band.append(bnd)
                out_hash.append(hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest())
                out_sig.append(sig.tobytes())
        return pa.table({id_col: out_id, "band": out_band, "bucket": out_hash,
                         "sig": pa.array(out_sig, pa.binary())})

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                                 "id_b": pd.Series([], dtype=g[id_col].dtype),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = list(g[id_col])
        sigs = [np.frombuffer(s, np.uint64) for s in g["sig"]]
        a_, b_, j_ = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_.append(ids[i])
                b_.append(ids[j])
                j_.append(float((sigs[i] == sigs[j]).mean()))
        return pd.DataFrame({"id_a": a_, "id_b": b_, "est_jaccard": j_})

    cand = exploded.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")

    # dedupe pairs found in multiple bands: group on the pair
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pandas")


def minhash_dedup(ds: rd.Dataset, text_col: str, id_col: str, threshold: float = 0.8,
                  num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                  seed: int = 42) -> rd.Dataset:
    """Full near-dedup: signatures → LSH candidates → threshold →
    connected components (driver union-find over the SMALL pair set —
    documented assumption: near-dup pairs ≪ corpus) → drop non-canonical."""
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k, seed)
    pairs = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    # the pair set is small (near-dup candidates only); filter on driver —
    # guards against the empty-schema dataset an all-empty groupby yields
    edges = [e for e in pairs.take_all() if e.get("est_jaccard", 0.0) >= threshold]

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for e in edges:
        a, b = find(e["id_a"]), find(e["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    drop = {x for x in parent if find(x) != x}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        mask = pc.invert(pc.is_in(ids, value_set=pa.array(list(drop), ids.type)))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow") if drop else ds


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (weighted bit-vote)."""
    acc = np.zeros(64, np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in (text or "").split():
        h = np.uint64(int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(ds: rd.Dataset, text_col: str, out_col: str = "simhash") -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(np.array(vals, np.uint64)))
    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_candidates(ds_with_simhash: rd.Dataset, id_col: str,
                       max_hamming: int = 3) -> rd.Dataset:
    """Band the 64-bit simhash into 4×16-bit chunks: any pair within
    hamming ≤ 3 shares at least one exact chunk (pigeonhole)."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = np.asarray(batch.column("simhash"), np.uint64)
        out = {"id": [], "band": [], "chunk": [], "simhash": []}
        for i, h in zip(ids, hs):
            for bnd in range(4):
                out["id"].append(i)
                out["band"].append(bnd)
                out["chunk"].append(int((int(h) >> (16 * bnd)) & 0xFFFF))
                out["simhash"].append(int(h))
        return pa.table(out)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=g["id"].dtype),
                                 "id_b": pd.Series([], dtype=g["id"].dtype),
                                 "hamming": pd.Series([], dtype="int64")})
        g = g.sort_values("id")
        ids, hs = list(g["id"]), list(g["simhash"])
        a_, b_, d_ = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(hs[i]) ^ int(hs[j])).count("1")
                if d <= max_hamming and ids[i] != ids[j]:
                    a_.append(ids[i]); b_.append(ids[j]); d_.append(d)
        return pd.DataFrame({"id_a": pd.Series(a_, dtype=g["id"].dtype),
                             "id_b": pd.Series(b_, dtype=g["id"].dtype),
                             "hamming": pd.Series(d_, dtype="int64")})

    exploded = ds_with_simhash.map_batches(explode, batch_format="pyarrow")
    cand = exploded.groupby(["band", "chunk"]).map_groups(pairs, batch_format="pandas")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pandas")


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def embedding_near_duplicates(
    ds: rd.Dataset,
    embedding_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_bits: int = 12,
    seed: int = 42,
) -> rd.Dataset:
    """Near-duplicate pairs by embedding cosine similarity.

    Scale path: hyperplane-LSH bucket each vector (one map_batches),
    groupby bucket, exact pairwise cosine within buckets (bounded by
    bucket size). Near-identical vectors agree on all hyperplane signs,
    so true near-dups share a bucket with high probability; recall can
    be raised by unioning multiple seeds."""
    import numpy as np

    from ..ann import HyperplaneLsh, _batch_matrix

    first = ds.take(1)
    dim = len(first[0][embedding_col]) if first else 0

    class Bucketer:
        def __init__(self):
            self.lsh = HyperplaneLsh(dim, n_bits, seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, embedding_col)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            unit = m / norms[:, None]
            return pa.table({
                id_col: batch.column(id_col),
                "bucket": pa.array(self.lsh.bucket(m)),
                "unit": pa.array(list(unit.astype(np.float32))),
            })

    bucketed = ds.map_batches(Bucketer, batch_format="pyarrow", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = list(g[id_col])
        m = np.stack([np.asarray(u, np.float64) for u in g["unit"]])
        sims = m @ m.T
        iu = np.triu_indices(len(ids), 1)
        ok = sims[iu] >= threshold
        return pd.DataFrame({
            "id_a": np.asarray(ids)[iu[0][ok]],
            "id_b": np.asarray(ids)[iu[1][ok]],
            "cosine": sims[iu][ok],
        })

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")


# --------------------------------------------------------------------------
# n-gram jaccard (exact verification kernel)
# --------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
