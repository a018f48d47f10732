"""sample (random / stratified / first / last), split, preview
(SURVEY §2.6: src/commands/sample.rs, split.rs, preview.rs).

Deterministic seeded sampling uses a splitmix-style integer hash of an
id column — exactly reproducible in ANSI SQL for the correctness oracle
(unlike RANDOM()-based sampling)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..expr import resolve_column

HASH_MULT = 2654435761  # Knuth multiplicative hash, fits in uint32 domain
HASH_MOD = 1 << 32


def _hash_u32(ids: pa.ChunkedArray | pa.Array, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(hash mod 2^32, validity) for an id column. Null ids fill with 0
    BEFORE the numpy cast — a null-bearing int column converts to
    float64-with-NaN and ``NaN.astype(uint64)`` is platform-dependent
    garbage; callers AND the validity in so null-id rows drop
    deterministically (SQL NULL-comparison semantics)."""
    valid = np.asarray(pc.is_valid(ids))
    v = np.asarray(pc.fill_null(pc.cast(ids, pa.int64()), 0)).astype(np.uint64)
    return (v * np.uint64(HASH_MULT) + np.uint64(seed)) % np.uint64(HASH_MOD), valid


def _hash_mask(ids: pa.ChunkedArray, seed: int, keep_num: int, keep_den: int) -> pa.Array:
    """keep iff ((id*HASH_MULT + seed) mod 2^32) * den < num * 2^32.

    SQL equivalent: ((id * 2654435761 + seed) % 4294967296) * den < num * 4294967296
    """
    h, valid = _hash_u32(ids, seed)
    return pa.array((h * np.uint64(keep_den)
                     < np.uint64(keep_num) * np.uint64(HASH_MOD)) & valid)


def sample_hash(ds: rd.Dataset, id_column: str, fraction: float, seed: int = 42) -> rd.Dataset:
    """Deterministic hash sample of ~fraction rows, keyed on an integer
    id column (reference's seeded path: hash(rn||seed) mod filter,
    src/commands/sample.rs:82-104)."""
    num = int(round(fraction * 1_000_000))
    col = resolve_column(ds.schema().names, id_column)
    return ds.map_batches(
        lambda b: b.filter(_hash_mask(b.column(col), seed, num, 1_000_000)),
        batch_format="pyarrow",
    )


def mix_sources(
    ds: rd.Dataset,
    group_col: str,
    rates: dict[str, float],
    id_column: str,
    seed: int = 42,
    default_rate: float = 1.0,
) -> rd.Dataset:
    """Per-group deterministic downsampling — training-corpus domain
    mixing (keep web at 20%, books at 100%, ...). Each row keeps iff
    hash(id, seed) < rate(group); rates are exact at corpus scale and
    the same row set is selected regardless of block layout, so a
    resumed/re-run job reproduces the mix bit-for-bit.

    Vectorized per batch: one `pc.index_in` maps the group column to a
    rate-numerator array (unknown groups → ``default_rate``), then one
    uint64 hash compare — no shuffle, no driver state; scale-safe at
    any corpus size. SQL-equivalent (the oracle): keep iff
    ``((id*2654435761 + seed) % 2^32) * 10^6 < CASE group ... END * 2^32``.
    """
    names = ds.schema().names
    gcol = resolve_column(names, group_col)
    icol = resolve_column(names, id_column)
    keys = list(rates)
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} out of [0,1]: {r}")
    nums = np.array(
        [int(round(r * 1_000_000)) for r in rates.values()]
        + [int(round(default_rate * 1_000_000))], dtype=np.uint64)
    key_arr = pa.array(keys, pa.string())

    def fn(b: pa.Table) -> pa.Table:
        # null ids drop deterministically (SQL semantics) via _hash_u32
        h, valid = _hash_u32(b.column(icol), seed)
        idx = pc.fill_null(
            pc.index_in(pc.cast(b.column(gcol), pa.string()), key_arr),
            len(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        num = nums[idx]
        return b.filter(pa.array((h * np.uint64(1_000_000)
                                  < num * np.uint64(HASH_MOD)) & valid))

    return ds.map_batches(fn, batch_format="pyarrow")


def _aes_key_batch(b: pa.Table, icol: str, wcol: str, seed: int) -> pa.Table:
    """THE A-ES key derivation shared by :func:`weighted_sample` and
    :func:`weighted_sample_per_group` (one definition so the SQL-oracle
    contract can't silently diverge): key = ln(u)/w with
    u = (hash_u32(id)+0.5)/2^32; rows with null ids, null weights or
    w <= 0 are filtered out."""
    h, valid = _hash_u32(b.column(icol), seed)
    u = (h.astype(np.float64) + 0.5) / HASH_MOD
    w = np.asarray(pc.cast(pc.fill_null(b.column(wcol), 0.0), pa.float64()))
    ok = valid & np.isfinite(w) & (w > 0)
    key = np.where(ok, np.log(u) / np.where(ok, w, 1.0), -np.inf)
    return b.append_column("__aes_key", pa.array(key)).filter(pa.array(ok))


def weighted_sample(ds: rd.Dataset, n: int, weight_col: str,
                    id_column: str, seed: int = 42,
                    keep_key: bool = False) -> rd.Dataset:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, 2006): each row gets key ``ln(u)/w`` with ``u`` a
    deterministic hash-uniform of its id (``(hash+0.5)/2^32`` — never
    0) and ``w`` its weight; the global top-``n`` keys are an exact
    weighted sample without replacement. The quality-weighted corpus
    downsample ("keep 1M docs, biased by quality score") in one pass.

    Deterministic: the same (id, weight) rows are selected regardless
    of block layout or cluster size, and the key is SQL-replicable so
    the oracle is exact. Rows with null ids, null weights or ``w <= 0``
    are excluded (SQL-comparison semantics). Scale shape: one
    map_batches computes keys, then the partial top-k reduction — at
    most ``n`` rows per block reach the final merge; no shuffle."""
    from .sorting import topk

    names = ds.schema().names
    wcol = resolve_column(names, weight_col)
    icol = resolve_column(names, id_column)

    import functools

    keyed = ds.map_batches(
        functools.partial(_aes_key_batch, icol=icol, wcol=wcol, seed=seed),
        batch_format="pyarrow")
    out = topk(keyed, ["__aes_key", icol], n, descending=[True, False])
    return out if keep_key else out.drop_columns(["__aes_key"])


def weighted_sample_per_group(ds: rd.Dataset, group_keys: list[str] | str,
                              n: int, weight_col: str, id_column: str,
                              seed: int = 42) -> rd.Dataset:
    """Per-group weighted sampling without replacement: keep ``n`` rows
    per group, selected by the same A-ES key as
    :func:`weighted_sample` — the "cap each domain at n docs, biased by
    quality score" pass. Rides the grouped top-k two-level reduction
    (≤ n rows per (block, group) enter the exchange). Deterministic and
    SQL-replicable (``ROW_NUMBER() OVER (PARTITION BY g ORDER BY
    ln(u)/w DESC, id) <= n``); rows with null ids or ``w <= 0`` are
    excluded."""
    from .sorting import topk_per_group

    names = ds.schema().names
    wcol = resolve_column(names, weight_col)
    icol = resolve_column(names, id_column)

    import functools

    keyed = ds.map_batches(
        functools.partial(_aes_key_batch, icol=icol, wcol=wcol, seed=seed),
        batch_format="pyarrow")
    out = topk_per_group(keyed, group_keys, ["__aes_key", icol], n,
                         descending=[True, False])
    return out.drop_columns(["__aes_key"])


def sample_random(ds: rd.Dataset, n: int, total: int | None = None, seed: int = 42) -> rd.Dataset:
    """~n uniform rows without replacement (seeded, distributed)."""
    total = total if total is not None else ds.count()
    if n >= total:
        return ds
    return ds.random_sample(n / total, seed=seed)


def sample_first(ds: rd.Dataset, n: int) -> rd.Dataset:
    return ds.limit(n)


def sample_stratified(
    ds: rd.Dataset, strat_column: str, n: int, id_column: str, seed: int = 42
) -> rd.Dataset:
    """Per-category proportional allocation with rounding repair
    (src/commands/sample.rs:135-269), then per-category deterministic
    hash-rank selection. One groupby for counts (small), one pass to tag."""
    col = resolve_column(ds.schema().names, strat_column)
    from ray.data.aggregate import Count

    counts = {r[col]: r["count()"] for r in
              ds.groupby(col).aggregate(Count()).take_all()}
    total = sum(counts.values())
    alloc = {k: int(n * v / total) for k, v in counts.items()}
    # rounding repair: hand out the remainder to the largest categories
    rem = n - sum(alloc.values())
    for k in sorted(counts, key=lambda k: (-counts[k], str(k)))[:rem]:
        alloc[k] += 1

    # per category keep the alloc[k] smallest hash values: compute a
    # per-row hash rank threshold via a per-category quantile would need
    # a shuffle; instead use hash fraction with exact trim per category.
    frac = {k: alloc[k] / counts[k] for k in counts}

    def fn(batch: pa.Table) -> pa.Table:
        h, valid = _hash_u32(batch.column(id_column), seed)
        cats = batch.column(col).to_pylist()
        thresh = np.fromiter((frac.get(c, 0.0) for c in cats), np.float64, len(cats))
        return batch.filter(pa.array((h < thresh * HASH_MOD) & valid))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_hash(
    ds: rd.Dataset, ratios: list[float], id_column: str, seed: int = 42
) -> list[rd.Dataset]:
    """Deterministic hash split into len(ratios) datasets (sums to 1;
    reference: src/commands/split.rs:30-260). Each split is an
    independent lazy dataset filtered by hash range — no materialize."""
    s = sum(ratios)
    ratios = [r / s for r in ratios]
    bounds = np.cumsum([0.0] + ratios)
    col = resolve_column(ds.schema().names, id_column)
    outs = []
    for i in range(len(ratios)):
        lo, hi = bounds[i], bounds[i + 1]

        def fn(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            h_u, valid = _hash_u32(batch.column(col), seed)
            h = h_u.astype(np.float64) / HASH_MOD
            return batch.filter(pa.array((h >= lo) & (h < hi) & valid))

        outs.append(ds.map_batches(fn, batch_format="pyarrow"))
    return outs


def split_proportionately(ds: rd.Dataset, ratios: list[float]) -> list[rd.Dataset]:
    """Exact-count split preserving order (ds.split_proportionately)."""
    return ds.split_proportionately(ratios[:-1]) if len(ratios) > 1 else [ds]


def preview(ds: rd.Dataset, n: int = 5, total: int | None = None, seed: int = 42):
    """Uniform random N rows without replacement (driver-side small result,
    src/commands/preview.rs:42-100)."""
    total = total if total is not None else ds.count()
    if total <= n:
        return ds.take_all()
    frac = min(1.0, (n * 3) / total)
    rows = ds.random_sample(frac, seed=seed).take(n)
    return rows


def sample_per_group(ds: rd.Dataset, group_keys: list[str] | str, n: int,
                     id_column: str, seed: int = 42,
                     num_partitions: int | None = None) -> rd.Dataset:
    """Deterministic per-group downsample: keep ``n`` rows per group,
    chosen by splitmix-hash order of the integer id — the "cap each
    domain at N documents" pass of a training-data pipeline, exactly
    reproducible in SQL (``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
    (id * 2654435761 + seed) % 4294967296, id) <= n``).

    Scale shape = :func:`~..sorting.topk_per_group`: each block
    pre-reduces to its local n per group, so at most n rows per
    (block, group) enter the coarse hash exchange — no global sort."""
    from .sorting import topk_per_group

    col = resolve_column(ds.schema().names, id_column)

    def add_order(b: pa.Table) -> pa.Table:
        h, _ = _hash_u32(b.column(col), seed)  # order key; null ids hash as 0
        return b.append_column("__h", pa.array(h.astype(np.int64)))

    with_h = ds.map_batches(add_order, batch_format="pyarrow")
    out = topk_per_group(with_h, group_keys, ["__h", col], n,
                         descending=False, num_partitions=num_partitions)
    return out.drop_columns(["__h"])
