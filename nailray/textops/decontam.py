"""Benchmark decontamination: flag or drop documents whose text
contains any snippet from a (small) contamination set — the eval-leak
scrub every training-data pipeline runs before a corpus ships.

Scale shape: the snippet set is the broadcast side — it ships to each
actor ONCE (constructor args travel through the object store, not per
batch) and compiles into chunked RE2 literal-alternation patterns in
``__init__``. Matching is then a single vectorized
``pc.match_substring_regex`` pass per chunk over the zero-copy Arrow
text column — linear in corpus bytes, never per-snippet Python loops
over rows. For snippet sets too large for an alternation (millions),
shard the set and run this stage once per shard, OR-ing the flags
(each pass stays one linear scan)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .analysis import _upsert_column

# RE2 pattern-size ceiling: literals per alternation chunk
_CHUNK = 512


class Decontaminator:
    """Task-stage callable: snippet patterns compiled once on the
    driver, shipped with the UDF (deserialized once per warm worker)."""

    def __init__(self, snippets: list[str], text_col: str = "text",
                 out_col: str = "contaminated"):
        self.text_col = text_col
        self.out_col = out_col
        snips = [s for s in snippets if s]  # '' would match every doc
        self.patterns = [
            "|".join(re.escape(s) for s in snips[i:i + _CHUNK])
            for i in range(0, len(snips), _CHUNK)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(self.text_col), "")
        mask = None
        for p in self.patterns:
            hit = pc.match_substring_regex(txt, p)
            mask = hit if mask is None else pc.or_(mask, hit)
        if mask is None:
            mask = pa.array([False] * len(batch), pa.bool_())
        return _upsert_column(batch, self.out_col, mask)


def flag_contaminated(ds: rd.Dataset, snippets: list[str],
                      text_col: str = "text",
                      out_col: str = "contaminated",
                      concurrency=None) -> rd.Dataset:
    """Append a boolean ``out_col``: does the document contain any
    snippet (exact substring match)?"""
    # stateless-task stage: the chunked alternation patterns compile on
    # the driver, ship once with the UDF, and deserialize once per
    # worker -- same amortization as actor __init__ without pool
    # startup (measured 2.4 -> 0.7 s at sf0.1).
    from ..shuffle import task_concurrency

    return ds.map_batches(Decontaminator(list(snippets), text_col, out_col),
                          batch_format="pyarrow",
                          concurrency=task_concurrency(concurrency))


def decontaminate(ds: rd.Dataset, snippets: list[str],
                  text_col: str = "text", concurrency=None) -> rd.Dataset:
    """Drop contaminated documents; schema passes through unchanged."""
    out_col = "__contam__"
    flagged = flag_contaminated(ds, snippets, text_col, out_col, concurrency)

    def keep_clean(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch.column(out_col))
        return batch.filter(mask).drop_columns([out_col])

    return flagged.map_batches(keep_clean, batch_format="pyarrow")


# --------------------------------------------------------------------------
# n-gram (shingle) decontamination — the eval-overlap scrub used for
# benchmark leakage: flag any document sharing an n-token shingle with
# the benchmark set, not just exact substrings.
# --------------------------------------------------------------------------

import numpy as np
import pandas as pd

_NGRAM_B = np.uint64(0x100000001B3)


def _token_hash_stream(texts) -> tuple[np.ndarray, np.ndarray]:
    """(token_hash, doc_index) arrays for a batch of texts: one Arrow
    split+flatten, empties dropped, hashes via the pandas string hasher
    (content-stable across blocks)."""
    txt = pc.fill_null(texts, "")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.split_pattern_regex(txt, pattern=r"\s+")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(len(lens)), lens)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = pd.Series(flat.to_pandas().to_numpy()[keep])
    if len(toks) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    th = pd.util.hash_pandas_object(toks, index=False).to_numpy(np.uint64)
    return th, idx[keep]


def _ngram_hashes(th: np.ndarray, idx: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash of every n-token window that stays
    inside one document (windows crossing a doc boundary are masked by
    comparing the repeated doc index at both window ends)."""
    if len(th) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    w = np.lib.stride_tricks.sliding_window_view(th, n)
    acc = w[:, 0].copy()
    for j in range(1, n):
        acc = acc * _NGRAM_B + w[:, j]
    same_doc = idx[: len(idx) - n + 1] == idx[n - 1:]
    return acc[same_doc], idx[: len(idx) - n + 1][same_doc]


def flag_contaminated_ngrams(ds: rd.Dataset, benchmark_texts: list[str],
                             n: int = 13, text_col: str = "text",
                             out_col: str = "contaminated") -> rd.Dataset:
    """Append a boolean ``out_col``: does the document share ANY
    n-token shingle with the benchmark set?

    The benchmark side folds to a sorted uint64 shingle-hash array on
    the driver (8 bytes per distinct benchmark shingle — benchmark sets
    are thousands of documents, so KBs–MBs) and broadcasts once via
    ``ray.put``. Per batch, corpus shingles hash through one
    vectorized rolling-polynomial pass and membership is a single
    ``searchsorted`` — linear in corpus tokens, no shuffle. Hash
    collisions (≈ #shingles²/2⁶⁴) can only over-flag."""
    import ray as _ray

    bth, bidx = _token_hash_stream(pa.array(benchmark_texts, pa.string()))
    bh, _ = _ngram_hashes(bth, bidx, n)
    bench = np.unique(bh)
    ref = _ray.put(bench)

    def fn(batch: pa.Table) -> pa.Table:
        th, idx = _token_hash_stream(batch.column(text_col))
        gh, gidx = _ngram_hashes(th, idx, n)
        flags = np.zeros(len(batch), bool)
        b = _ray.get(ref)
        if len(gh) and len(b):
            pos = np.searchsorted(b, gh)
            pos[pos == len(b)] = 0
            flags[gidx[b[pos] == gh]] = True
        return _upsert_column(batch, out_col, pa.array(flags))

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate_ngrams(ds: rd.Dataset, benchmark_texts: list[str],
                         n: int = 13, text_col: str = "text") -> rd.Dataset:
    """Drop documents sharing any n-token shingle with the benchmark
    set; schema passes through unchanged."""
    out_col = "__contam_ng__"
    flagged = flag_contaminated_ngrams(ds, benchmark_texts, n, text_col, out_col)

    def keep_clean(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(batch.column(out_col))) \
                    .drop_columns([out_col])

    return flagged.map_batches(keep_clean, batch_format="pyarrow")


def flag_contaminated_embeddings(ds: rd.Dataset, benchmark,
                                 embedding_col: str = "embedding",
                                 threshold: float = 0.95,
                                 out_col: str = "contaminated") -> rd.Dataset:
    """SEMANTIC decontamination: flag rows whose embedding is too close
    (max cosine >= ``threshold``) to ANY vector in the benchmark/eval
    set — catching paraphrased leakage the n-gram scrub misses.

    Scale shape: the (m x d) benchmark matrix is row-normalized once
    and broadcast via ``ray.put`` (read per task, never re-shipped per
    batch); each batch pays ONE (Bxd)@(dxm) matmul and a row max — no
    shuffle, linear in corpus rows.  For benchmark sets too big for one
    matmul (millions of rows), shard the set and OR the flags, or
    route through :func:`nailray.ann.topk_cosine_ivf`'s bucketing."""
    import numpy as np
    import ray

    from ..ann import _batch_matrix

    bm = np.asarray(benchmark, np.float64)
    if bm.ndim != 2:
        raise ValueError("benchmark must be an (m, d) matrix")
    norms = np.linalg.norm(bm, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put(np.ascontiguousarray((bm / norms[:, None]).T))
    # only the scalar count enters the closure — capturing `bm` itself
    # would serialize the whole matrix with the pickled UDF, defeating
    # the ray.put broadcast above
    n_bench = int(bm.shape[0])
    del bm, norms

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0 or n_bench == 0:
            return batch.append_column(
                "max_benchmark_cosine",
                pa.array([0.0] * batch.num_rows, pa.float64())) \
                .append_column(out_col,
                               pa.array([False] * batch.num_rows))
        m = _batch_matrix(batch, embedding_col)
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        sims = (m / mn[:, None]) @ ray.get(ref)
        mx = sims.max(axis=1)
        return batch.append_column(
            "max_benchmark_cosine", pa.array(mx, pa.float64())) \
            .append_column(out_col, pa.array(mx >= threshold))

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate_embeddings(ds: rd.Dataset, benchmark,
                             embedding_col: str = "embedding",
                             threshold: float = 0.95) -> rd.Dataset:
    """Drop rows semantically too close to the benchmark set; schema
    passes through unchanged."""
    out_col = "__contam_emb__"
    flagged = flag_contaminated_embeddings(ds, benchmark, embedding_col,
                                           threshold, out_col)

    def keep_clean(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(batch.column(out_col))) \
                    .drop_columns([out_col, "max_benchmark_cosine"])

    return flagged.map_batches(keep_clean, batch_format="pyarrow")
