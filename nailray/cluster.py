"""Distributed clustering over an embedding column (list<float>).

- :func:`kmeans_embeddings` — full-data Lloyd's k-means expressed as a
  sequence of Ray Data passes: every iteration is ONE ``map_batches``
  scan that folds each block to a (k, dim) partial-sum matrix + k
  counts; the driver reduces those tiny partials and re-broadcasts the
  centroids.  Nothing per-row ever reaches the driver; the only
  driver-held state is the (k, dim) centroid matrix.  Spherical
  (cosine) by default — the SemDeDup / corpus-clustering convention —
  or plain Euclidean with ``normalize=False``.
- :func:`semantic_dedup` — SemDeDup-style near-duplicate pruning
  (Abbas et al. 2023, arXiv:2303.09540): cluster, then inside each
  cluster keep one representative per cosine-epsilon ball.  The
  per-cluster quadratic runs inside :func:`nailray.shuffle.group_map`
  partitions (cluster id is the partition key), capped and logged like
  ``embedding_near_dup``.

Initialisation is deterministic and blocking-independent: the k rows
with the smallest ``sha256(id)`` digests seed the centroids (a partial
top-k merge — every block contributes at most k candidate rows), so
reruns and different block layouts produce identical clusterings.
No counterpart exists in the reference (its stats live in
`src/utils/stats.rs`); this is the corpus-curation extension family.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .ann import _batch_matrix

logger = logging.getLogger(__name__)


def _id_digests(ids) -> np.ndarray:
    """Stable uint64 digest per id — first 8 bytes of
    ``sha256(str(id))`` — the deterministic, layout-free seed/survivor
    order (and what the semantic_dedup SQL oracle reproduces with
    DuckDB's ``sha256(CAST(id AS VARCHAR))``).  Arrow inputs hash
    through :func:`~nailray.encode.codecs.base.digest_column`'s
    zero-copy buffer slices; everything else falls back to a plain
    loop (small sets: per-cluster survivor ordering)."""
    if isinstance(ids, (pa.Array, pa.ChunkedArray)):
        from .encode.codecs.base import digest_column

        hx = digest_column(pc.cast(ids, pa.string()))
        return np.array([int(h[:16], 16) for h in hx.to_pylist()],
                        np.uint64)
    vals = ids.tolist() if hasattr(ids, "tolist") else list(ids)
    out = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):
        h = hashlib.sha256(str(v).encode()).digest()
        out[i] = int.from_bytes(h[:8], "big")
    return out


def _init_centroids(ds_vec: rd.Dataset, k: int, embedding_col: str,
                    id_col: str, normalize: bool) -> np.ndarray:
    """k seed vectors: the rows with the k smallest sha256(id)
    digests.  Partial top-k per block (≤ k rows each) → driver merge."""
    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, embedding_col)
        d = _id_digests(batch.column(id_col).combine_chunks())
        top = np.argsort(d, kind="stable")[:k]
        return pa.table({
            "digest": pa.array(d[top].astype(np.uint64)),
            "vec": pa.array(list(m[top].astype(np.float64)))})

    cands: list[tuple[int, np.ndarray]] = []
    for b in ds_vec.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        dg = np.asarray(b.column("digest"), np.uint64)
        vecs = b.column("vec")
        for i in range(len(dg)):
            cands.append((int(dg[i]),
                          np.asarray(vecs[i].as_py(), np.float64)))
    if not cands:
        raise ValueError("kmeans_embeddings: empty input dataset")
    cands.sort(key=lambda t: t[0])
    cent = np.stack([v for _, v in cands[:k]])
    if normalize:
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _segment_sums(m2: np.ndarray, lab: np.ndarray, k_eff: int,
                  dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-cluster (sums, counts) via sort + reduceat — np.add.at's
    buffered scatter is ~10x slower on wide blocks. THE single
    segment-sum used by both the distributed per-block partial and the
    one-task small-input fit, so a fix lands in one place."""
    order = np.argsort(lab, kind="stable")
    sl = lab[order]
    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
    sums = np.zeros((k_eff, dim), np.float64)
    if len(sl):
        sums[sl[bounds]] = np.add.reduceat(m2[order], bounds, axis=0)
    counts = np.bincount(lab, minlength=k_eff).astype(np.int64)
    return sums, counts


def _assign(m: np.ndarray, cent: np.ndarray, normalize: bool):
    """(normalized_rows, labels, per-row objective) via one matmul."""
    if normalize:
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent.T
        lab = np.argmax(sims, axis=1)
        return m, lab, sims[np.arange(len(m)), lab]
    d2 = (np.sum(m * m, axis=1, keepdims=True) - 2.0 * (m @ cent.T)
          + np.sum(cent * cent, axis=1))
    lab = np.argmin(d2, axis=1)
    return m, lab, -d2[np.arange(len(m)), lab]


def _lloyd_centroids(ds_vec: rd.Dataset, cent: np.ndarray, n_iter: int,
                     embedding_col: str, normalize: bool) -> np.ndarray:
    """n_iter Lloyd rounds; each folds every block to one
    (k·dim + k)-number partial (sums + counts as two binary cells)."""
    k_eff, dim = cent.shape
    for _ in range(n_iter):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _batch_matrix(batch, embedding_col)
            if len(m) == 0:
                return pa.table({"sums": pa.array([], pa.binary()),
                                 "counts": pa.array([], pa.binary())})
            m2, lab, _ = _assign(m, c, normalize)
            sums, counts = _segment_sums(m2, lab, k_eff, dim)
            return pa.table({"sums": pa.array([sums.tobytes()]),
                             "counts": pa.array([counts.tobytes()])})

        tot = np.zeros((k_eff, dim), np.float64)
        cnt = np.zeros(k_eff, np.int64)
        for b in ds_vec.map_batches(partial, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
            for s, c in zip(b.column("sums").to_pylist(),
                            b.column("counts").to_pylist()):
                tot += np.frombuffer(s, np.float64).reshape(k_eff, dim)
                cnt += np.frombuffer(c, np.int64)
        new = cent.copy()  # empty clusters keep their old centroid
        nz = cnt > 0
        new[nz] = tot[nz] / cnt[nz, None]
        if normalize:
            new = new / np.maximum(
                np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cent = new
    return cent


def _fit_small_impl(k: int, n_iter: int, normalize: bool,
                    embedding_col: str, id_col: str, *blocks):
    """Whole init+Lloyd fit in ONE worker task — the small-input
    short-circuit (same pattern as connected components' ≤1M-edge
    single-task path).  Rows are canonicalized by digest order first,
    so the result is bit-stable across block layouts (the distributed
    path's per-block partial sums may differ from this in float ulps —
    both are valid Lloyd fixpoints of the same deterministic init)."""
    ts = [b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
          for b in blocks if b is not None and len(b)]
    t = pa.concat_tables(ts, promote_options="default")
    m = _batch_matrix(t, embedding_col)
    dig = _id_digests(t.column(id_col).combine_chunks())
    order = np.argsort(dig, kind="stable")  # canonical row order
    m = m[order]
    cent = m[:min(k, len(m))].astype(np.float64).copy()
    if normalize:
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    k_eff, dim = cent.shape
    for _ in range(n_iter):
        m2, lab, _ = _assign(m, cent, normalize)
        sums, cnt = _segment_sums(m2, lab, k_eff, dim)
        new = cent.copy()
        nz = cnt > 0
        new[nz] = sums[nz] / cnt[nz, None]
        if normalize:
            new = new / np.maximum(
                np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cent = new
    return cent


_SMALL_FIT_BYTES = 1 << 30  # one task holds ~4 matrix copies: cap input


def _fit_centroids(ds_vec: rd.Dataset, k: int, n_iter: int,
                   embedding_col: str, id_col: str, normalize: bool,
                   small_input_rows: int,
                   cheap_metadata: bool = True) -> np.ndarray:
    """Route between the one-task small-input fit (n_iter sequential
    Ray pipelines cost ~0.5 s of fixed scheduling each — pure overhead
    when the whole table fits one worker) and the distributed
    partial-sum loop.  The short-circuit requires BOTH a row-count cap
    and a byte cap (2M rows of 1024-dim embeddings are 16 GB — fine
    distributed, fatal in one task), and is only consulted when
    ``cheap_metadata`` (materialized or plain file-backed input) — a
    non-cached derived pipeline must not pay a full extra pass just to
    pick a route."""
    import ray

    if cheap_metadata:
        n = ds_vec.count()
        if n == 0:
            raise ValueError("kmeans_embeddings: empty input dataset")
        size = None
        try:
            size = ds_vec.size_bytes()
        except Exception:
            pass
        if n <= small_input_rows and (size is None or
                                      size <= _SMALL_FIT_BYTES):
            refs = [bref for bundle in ds_vec.iter_internal_ref_bundles()
                    for bref in bundle.block_refs]
            fit = ray.remote(num_cpus=1)(_fit_small_impl)
            return ray.get(fit.remote(k, n_iter, normalize, embedding_col,
                                      id_col, *refs))
    cent = _init_centroids(ds_vec, k, embedding_col, id_col, normalize)
    return _lloyd_centroids(ds_vec, cent, n_iter, embedding_col, normalize)


def _label_pass(ds_vec: rd.Dataset, cent: np.ndarray, embedding_col: str,
                id_col: str, normalize: bool,
                with_vectors: bool = False,
                part_mod: int | None = None) -> rd.Dataset:
    """One streaming pass assigning every row to its centroid.
    ``with_vectors`` carries the embedding through (as ``vec``) and
    ``part_mod`` appends ``part = cluster % part_mod`` — so callers
    needing a partition key don't pay a second full-data pass."""
    cent_ref = ray.put(cent)

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _batch_matrix(batch, embedding_col)
        if len(m) == 0:
            lab = np.array([], np.int32)
            obj = np.array([], np.float64)
        else:
            _, lab, obj = _assign(m, c, normalize)
        cols = {id_col: batch.column(id_col),
                "cluster": pa.array(lab.astype(np.int32)),
                "sim": pa.array(obj, pa.float64())}
        if with_vectors:
            cols["vec"] = batch.column(embedding_col)
        if part_mod is not None:
            cols["part"] = pa.array(
                (lab.astype(np.int64) % part_mod), pa.int64())
        return pa.table(cols)

    return ds_vec.map_batches(label, batch_format="pyarrow")


def kmeans_embeddings(ds: rd.Dataset, k: int = 16, n_iter: int = 10,
                      embedding_col: str = "embedding",
                      id_col: str = "vec_id", normalize: bool = True,
                      compute_inertia: bool = False,
                      small_input_rows: int = 2_000_000,
                      cache_input: bool | str = "auto"):
    """Full-data distributed Lloyd's k-means.

    Returns ``(assignments, centroids, inertia)``: a Dataset of
    ``(id_col, cluster, sim)`` rows (``sim`` = cosine to the winning
    centroid when ``normalize``, else negative squared distance), the
    final ``(k, dim)`` float64 centroid matrix, and the summed
    objective (``None`` unless ``compute_inertia`` — it costs one
    extra streaming pass).

    Scale shape: init is a partial top-k merge (≤ k rows/block cross);
    each Lloyd iteration folds every block to ONE ``(k·dim + k)``
    binary partial via a single matmul + ``np.add.at`` segment-sum,
    the driver reduces ``O(blocks)`` such partials and ``ray.put``s
    the new centroids; the labelling pass streams.  The input is
    consumed ``n_iter + 2`` times, so ``cache_input="auto"``
    (:func:`nailray.io.resolve_cache_input`) materializes derived
    pipelines and re-reads file-backed ones."""
    from .io import resolve_cache_input as _resolve_cache_input

    from .io import is_plain_file_read as _is_plain_file_read

    cheap = _is_plain_file_read(ds)
    if _resolve_cache_input(ds, cache_input):
        ds = ds.materialize()
        cheap = True
    ds_vec = ds.select_columns([id_col, embedding_col])

    cent = _fit_centroids(ds_vec, k, n_iter, embedding_col, id_col,
                          normalize, small_input_rows,
                          cheap_metadata=cheap)
    assignments = _label_pass(ds_vec, cent, embedding_col, id_col, normalize)

    inertia = None
    if compute_inertia:
        inertia = 0.0
        fold = assignments.map_batches(
            lambda b: pa.table({"s": pa.array([float(np.sum(
                np.asarray(b.column("sim"), np.float64)))
                if b.num_rows else 0.0])}),
            batch_format="pyarrow")
        for b in fold.iter_batches(batch_format="pyarrow"):
            inertia += float(pc.sum(b.column("s")).as_py() or 0.0)
        # the fold consumed the assignment pipeline once; hand the
        # caller a fresh (lazy) labelling pass over the same centroids
        assignments = _label_pass(ds_vec, cent, embedding_col, id_col,
                                  normalize)
    return assignments, cent, inertia


def semantic_dedup(ds: rd.Dataset, k: int = 16, threshold: float = 0.95,
                   n_iter: int = 5, embedding_col: str = "embedding",
                   id_col: str = "vec_id", keep: str = "min",
                   max_pairs_per_cluster: int = 2_000_000,
                   num_partitions: int | None = None,
                   small_input_rows: int = 2_000_000,
                   cache_input: bool | str = "auto") -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then inside each cluster drop all but one representative of every
    cosine-``threshold`` ball (greedy keep-first over sha256-digest
    order — deterministic and layout-independent; ``keep`` = "min" /
    "max" picks which end of the digest order survives).  Returns the
    surviving ``(id_col, cluster)`` rows.

    Scale shape: centroid fitting is the tiny-exchange Lloyd loop
    above; the per-cluster quadratic runs inside
    :func:`~nailray.shuffle.group_map` partitions keyed by
    ``cluster % n_parts`` with the pair budget capped per cluster and
    coverage loss logged (uncompared rows all survive — recall loss,
    never false drops), the same contract as ``embedding_near_dup``."""
    from .io import is_plain_file_read as _is_plain_file_read
    from .io import resolve_cache_input as _resolve_cache_input
    from .shuffle import group_map, partition_count

    if keep not in ("min", "max"):
        raise ValueError(
            f"semantic_dedup: keep must be 'min' or 'max', got {keep!r}")
    cheap = _is_plain_file_read(ds)
    if _resolve_cache_input(ds, cache_input):
        ds = ds.materialize()
        cheap = True
    ds_vec = ds.select_columns([id_col, embedding_col])
    cent = _fit_centroids(ds_vec, k, n_iter, embedding_col, id_col, True,
                          small_input_rows, cheap_metadata=cheap)

    n_parts = min(partition_count(num_partitions), max(k, 1))
    parts = _label_pass(ds_vec, cent, embedding_col, id_col, True,
                        with_vectors=True, part_mod=n_parts)

    def dedup_part(df):
        outs = []
        for _, g in df.groupby("cluster", sort=True):
            outs.append(_dedup_cluster(g, id_col, threshold, keep,
                                       max_pairs_per_cluster))
        import pandas as pd

        if not outs:
            return df[[id_col, "cluster"]]
        return pd.concat(outs, ignore_index=True)

    return group_map(parts, "part", dedup_part, n_parts,
                     batch_format="pandas")


def _dedup_cluster(df, id_col: str, threshold: float, keep: str,
                   max_pairs: int):
    if len(df) <= 1:
        return df[[id_col, "cluster"]].reset_index(drop=True)
    m = np.stack([np.asarray(v, np.float64) for v in df["vec"]])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    # Arrow-path digests: pc.cast-to-string form matches _init_centroids'
    # seeding order for every id type (str(v) on a pandas Series would
    # diverge for bool/timestamp ids)
    dig = _id_digests(pa.Array.from_pandas(df[id_col]))
    order = np.argsort(dig, kind="stable")
    if keep == "max":
        order = order[::-1]
    n = len(df)
    if n * (n - 1) // 2 > max_pairs:
        cap = max(2, int((2 * max_pairs) ** 0.5))
        logger.warning(
            "semantic_dedup: cluster of %d rows exceeds pair budget %d; "
            "comparing only the first %d rows in digest order (the rest "
            "all survive — recall loss, never false drops)",
            n, max_pairs, cap)
        order = order[:cap]
    mo = m[order]
    sims = mo @ mo.T
    alive = np.ones(len(order), bool)
    for i in range(len(order)):
        if alive[i]:
            alive[i + 1:] &= ~(sims[i, i + 1:] >= threshold)
    kept = np.zeros(n, bool)
    kept[order[alive]] = True
    if len(order) < n:
        kept[np.setdiff1d(np.arange(n), order)] = True
    return df.loc[kept, [id_col, "cluster"]].reset_index(drop=True)
