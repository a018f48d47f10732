"""Mergeable sketches for web-scale profiling: HyperLogLog distinct
counts and Count-Min + exact-verify heavy hitters.

Both follow the same distributed shape: every block folds into a tiny
fixed-size summary inside ``map_batches`` (numpy-vectorized), summaries
merge associatively on the driver (KBs, not data), and anything that
must be exact gets a second broadcast-filtered exact pass. Nothing
shuffles the raw column.

References: Flajolet et al., "HyperLogLog" (AofA 2007); Cormode &
Muthukrishnan, "An Improved Data Stream Summary: The Count-Min Sketch"
(J. Algorithms 2005).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _hash64(values: pd.Series) -> np.ndarray:
    """Stable 64-bit hashes of a column (pandas siphash). NO float64
    canonicalization here, unlike ``shuffle.hash_partition``: a sketch
    collision MERGES distinct values (a >2^53 id column would collapse
    by orders of magnitude), whereas a partition collision only
    co-locates. Dtype stability across blocks holds because callers
    hash ``drop_null()``-ed columns of one schema — int columns never
    null-widen to float."""
    return pd.util.hash_pandas_object(values, index=False).to_numpy(np.uint64)


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

def _hll_idx_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-hash (register index, leading-run rank) pairs."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad to end runs
    # rank = leading zeros of `rest` + 1. floor(log2) must be exact:
    # float64(rest) rounds 64-bit ints, so take the top 53 bits (shift
    # 11, exact in float64) when nonzero, the raw value otherwise
    # (rest ≥ 2^p - 1 > 0 always — the padding guarantees it).
    f = (rest >> np.uint64(11)).astype(np.float64)
    big = f > 0
    log2 = np.empty(len(h), np.int64)
    log2[big] = np.floor(np.log2(f[big])).astype(np.int64) + 11
    log2[~big] = np.floor(np.log2(rest[~big].astype(np.float64))).astype(np.int64)
    ranks = (63 - log2 + 1).astype(np.int8)
    return idx, ranks


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """Fold a batch of 64-bit hashes into 2^p max-leading-run registers."""
    idx, ranks = _hll_idx_ranks(h, p)
    regs = np.zeros(1 << p, np.int8)
    np.maximum.at(regs, idx, ranks)
    return regs


def _grouped_hll_registers(codes: np.ndarray, h: np.ndarray, p: int,
                           n_groups: int) -> np.ndarray:
    """Dense ``(n_groups, 2^p)`` int8 register matrix from per-row group
    codes + hashes via ONE argsort and a segment max — no per-group
    Python loop (a high-cardinality ``by`` used to pay one
    ``_hll_registers`` call per key per block)."""
    m = 1 << p
    regs = np.zeros(n_groups * m, np.int8)
    if len(h):
        idx, ranks = _hll_idx_ranks(h, p)
        comb = codes.astype(np.int64) * m + idx
        order = np.argsort(comb, kind="stable")
        comb_s = comb[order]
        ranks_s = ranks[order]
        is_new = np.empty(len(comb_s), bool)
        is_new[0] = True
        np.not_equal(comb_s[1:], comb_s[:-1], out=is_new[1:])
        starts = np.flatnonzero(is_new)
        regs[comb_s[starts]] = np.maximum.reduceat(ranks_s, starts)
    return regs.reshape(n_groups, m)


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def _hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Row-wise :func:`_hll_estimate` over a ``(G, m)`` register matrix
    (same math, one numpy pass). All-zero rows estimate 0 — they fall
    out of the linear-counting branch naturally (``m·log(m/m) = 0``)."""
    g, m = regs.shape
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
    zeros = np.sum(regs == 0, axis=1)
    lin = m * np.log(m / np.maximum(zeros, 1))
    use_lin = (est <= 2.5 * m) & (zeros > 0)
    return np.rint(np.where(use_lin, lin, est)).astype(np.int64)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 14) -> int:
    """Approximate distinct count (~1.04/sqrt(2^p) standard error, i.e.
    ~0.8% at the default p=14 / 16 KiB of state). Per-block registers
    merge by element-wise max — one tiny row per block crosses the wire."""
    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(column).drop_null().to_pandas()
        if len(s) == 0:
            return pa.table({"regs": pa.array([], pa.large_binary())})
        regs = _hll_registers(_hash64(s), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    merged = np.zeros(1 << p, np.int8)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for payload in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(payload, np.int8))
    return int(round(_hll_estimate(merged)))


# --------------------------------------------------------------------------
# Count-Min heavy hitters with exact verify
# --------------------------------------------------------------------------

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5], np.uint64)


def _cms_fold(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    cms = np.zeros((depth, width), np.int64)
    for d in range(depth):
        mixed = (h ^ _CMS_SEEDS[d]) * np.uint64(0xFF51AFD7ED558CCD)
        mixed ^= mixed >> np.uint64(33)
        cols = (mixed % np.uint64(width)).astype(np.int64)
        np.add.at(cms[d], cols, 1)
    return cms


def heavy_hitters(ds: rd.Dataset, column: str, k: int,
                  width: int = 8192, depth: int = 4,
                  candidates_per_block: int | None = None) -> pd.DataFrame:
    """Top-k most frequent values with EXACT counts, two passes:

    1. sketch pass: each block folds into a Count-Min sketch plus its
       local top candidates (sketches sum associatively on the driver —
       ``depth × width × 8`` bytes per block, never the raw column);
    2. verify pass: the candidate union is broadcast and exact counts
       come from a pre-combined :func:`nailray.shuffle.grouped_agg` over
       ONLY candidate rows.

    Exactness caveat: the result is exact for every returned value; the
    top-k SET is guaranteed only when a global heavy hitter is locally
    heavy in at least one block (use a generous ``candidates_per_block``
    for near-uniform distributions)."""
    import ray as _ray

    from .shuffle import grouped_agg

    cpb = candidates_per_block or max(4 * k, 32)

    def partial(batch: pa.Table) -> pa.Table:
        col_t = batch.column(column).type
        s = batch.column(column).drop_null().to_pandas()
        if len(s) == 0:
            return pa.table({"cms": pa.array([], pa.large_binary()),
                             "cand": pa.array([], pa.large_list(col_t))})
        cms = _cms_fold(_hash64(s), width, depth)
        top = s.value_counts().head(cpb)
        cand_arr = pa.Array.from_pandas(
            top.index.to_series().reset_index(drop=True), type=col_t)
        return pa.table({
            "cms": pa.array([cms.tobytes()], pa.large_binary()),
            "cand": pa.array([cand_arr.to_pylist()],
                             pa.large_list(col_t)),
        })

    cms = np.zeros((depth, width), np.int64)
    cand: set[str] = set()
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for payload in b.column("cms").to_pylist():
            cms += np.frombuffer(payload, np.int64).reshape(depth, width)
        for lst in b.column("cand").to_pylist():
            cand.update(lst)

    if not cand:
        return pd.DataFrame({column: [], "count": []})
    s = ds.schema()
    base = s.base_schema if hasattr(s, "base_schema") else s
    vs_ref = _ray.put(pa.array(sorted(cand), base.field(column).type))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.select([column]).filter(
            pc.is_in(batch.column(column), value_set=_ray.get(vs_ref)))

    exact = grouped_agg(
        ds.map_batches(keep_candidates, batch_format="pyarrow"),
        [column], {"count": (column, "size")})
    df = pa.concat_tables(
        list(exact.iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas()
    df = df.sort_values(["count", column], ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True)
    return df


def cms_estimate(cms: np.ndarray, values: pd.Series,
                 width: int, depth: int) -> np.ndarray:
    """Point-query upper-bound estimates from a folded sketch (min over
    rows) — exposed for tests and composition."""
    h = _hash64(values)
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        mixed = (h ^ _CMS_SEEDS[d]) * np.uint64(0xFF51AFD7ED558CCD)
        mixed ^= mixed >> np.uint64(33)
        cols = (mixed % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, cms[d][cols])
    return est


# --------------------------------------------------------------------------
# Bloom filter (broadcast key-membership prefilter)
# --------------------------------------------------------------------------

class BloomFilter:
    """Immutable Bloom filter over 64-bit key hashes.

    Double hashing (Kirsch & Mitzenmacher 2006) over the two
    independent 32-bit halves of the key hash: position_i =
    (hi + i*(lo|1)) & (m-1) with m a power of two; the odd step makes
    the probe sequence a permutation. (Deriving both from the same low
    bits — e.g. step = h|1 — correlates all k probes under the mod-m
    mask and costs ~15× in false positives, measured.)
    ``bits_per_key=12`` with ``k = round(12·ln2) = 8`` probes gives
    ~0.3% false positives."""

    def __init__(self, expected_keys: int, bits_per_key: int = 12):
        m = 1 << max(6, int(np.ceil(np.log2(max(1, expected_keys) * bits_per_key))))
        self.m = m
        self.k = max(1, int(round(bits_per_key * np.log(2))))
        self.bits = np.zeros(m >> 3, np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        base = h >> np.uint64(32)
        step = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        for i in range(self.k):
            pos = (base + np.uint64(i) * step) & np.uint64(self.m - 1)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        base = h >> np.uint64(32)
        step = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        out = np.ones(len(h), bool)
        for i in range(self.k):
            pos = (base + np.uint64(i) * step) & np.uint64(self.m - 1)
            bit = self.bits[(pos >> np.uint64(3)).astype(np.int64)] \
                & np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
            out &= bit != 0
        return out

    def merge(self, other: "BloomFilter") -> None:
        np.bitwise_or(self.bits, other.bits, out=self.bits)


def _bloom_key_hashes(col: pa.ChunkedArray | pa.Array, key_type: pa.DataType) -> np.ndarray:
    """Dtype-stable hashes of an Arrow key column: normalize to the
    exchange type FIRST (int widths / int-vs-float pandas block drift
    would split equal keys, see shuffle.hash_partition), then drop
    nulls — SQL join semantics: null keys never match."""
    import pyarrow.compute as pc

    arr = pc.cast(col, key_type).drop_null()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return _hash64(arr.to_pandas())


def build_bloom(ds: rd.Dataset, column: str, expected_keys: int | None = None,
                bits_per_key: int = 12) -> BloomFilter:
    """Fold a dataset's key column into one Bloom filter.

    Each block contributes its own fixed-size bitmap partial
    (``expected_keys·bits_per_key/8`` bytes — independent of row count);
    partials OR-merge on the driver. On a multi-node cluster the OR is
    associative, so a tree merge is a drop-in if block count × bitmap
    size outgrows the driver."""
    from .ops.combine import _norm_key_type

    s = ds.schema()
    base = s.base_schema if hasattr(s, "base_schema") else s
    key_type = _norm_key_type(base.field(column).type)
    if expected_keys is None:
        expected_keys = ds.count()

    def partial(batch: pa.Table) -> pa.Table:
        h = _bloom_key_hashes(batch.column(column), key_type)
        bf = BloomFilter(expected_keys, bits_per_key)
        bf.add_hashes(h)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.large_binary())})

    merged = BloomFilter(expected_keys, bits_per_key)
    for b in ds.select_columns([column]) \
               .map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for payload in b.column("bits").to_pylist():
            np.bitwise_or(merged.bits,
                          np.frombuffer(payload, np.uint8), out=merged.bits)
    return merged


# --------------------------------------------------------------------------
# t-digest (Dunning & Ertl 2019, merging variant) — mergeable quantile
# sketch: the one-pass streaming complement to ops.quantile.exact_quantiles
# --------------------------------------------------------------------------

class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function: centroid
    sizes are bounded tightest at the tails, so extreme quantiles stay
    sharp. State is two parallel arrays (means, weights) capped at
    ~delta/2 + 2 centroids (one per unit k-cell) — a few KB regardless
    of input size, mergeable associatively (per-block partials fold
    like the other sketches here; the driver merges one tiny digest
    per block)."""

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = int(delta)
        self.means = np.empty(0) if means is None else means
        self.weights = np.empty(0) if weights is None else weights

    # -- construction ------------------------------------------------
    @classmethod
    def of(cls, values: np.ndarray, delta: int = 200) -> "TDigest":
        d = cls(delta)
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            v = np.sort(v)
            d.means, d.weights = d._compress(v, np.ones(len(v)))
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        if not len(other.means):
            return self
        if not len(self.means):
            self.means, self.weights = other.means, other.weights
            return self
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(m, kind="stable")
        self.means, self.weights = self._compress(m[order], w[order])
        return self

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """One VECTORIZED pass over sorted (mean, weight) pairs: each
        input centroid is assigned to the unit k-cell its right-edge
        quantile falls in under the k1 scale, and cells fold with one
        ``np.add.reduceat`` — no Python loop (the greedy scalar
        variant ran ~200k rows/s/core; this is one numpy pass). Cells
        are unit k-intervals, so cluster sizes honor the same
        tail-tight bound; the cell count — hence the state — is
        bounded by ~delta/2 + 2 regardless of input size."""
        total = weights.sum()
        qr = np.cumsum(weights) / total
        k = self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * qr - 1, -1, 1))
        cell = np.floor(k).astype(np.int64)
        is_new = np.empty(len(cell), bool)
        is_new[0] = True
        np.not_equal(cell[1:], cell[:-1], out=is_new[1:])
        starts = np.flatnonzero(is_new)
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        return msum / wsum, wsum

    # -- queries -------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Value estimate at quantile q via linear interpolation between
        centroid midpoints; queries beyond the extreme midpoints clamp
        to the boundary centroid means (no singleton special-case —
        tail accuracy comes from the k1 scale keeping tail cells
        near-singleton)."""
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        target = q * total
        # cumulative weight at centroid midpoints
        cum = np.cumsum(w) - w / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, payload: bytes, delta: int = 200) -> "TDigest":
        arr = np.frombuffer(payload, "<f8")
        n = len(arr) // 2
        return cls(delta, arr[:n].copy(), arr[n:].copy())


def approx_quantiles_tdigest(ds: rd.Dataset, column: str,
                             quantiles: list[float],
                             delta: int = 200) -> dict[float, float]:
    """One-pass mergeable approximate quantiles: each block folds to a
    ~delta-centroid t-digest (a few KB), the driver merges one digest
    per block — O(blocks·delta) driver work, no shuffle, no second
    pass. For exact answers (multi-pass) use
    :func:`nailray.ops.quantile.exact_quantiles`; this is the
    streaming/continuous-monitoring variant (rank error ~O(1/delta),
    tightest at the tails under the k1 scale)."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        v = np.asarray(_pc.cast(batch.column(column).drop_null(), pa.float64()))
        d = TDigest.of(v, delta)
        return pa.table({"td": pa.array([d.to_bytes()], pa.large_binary())})

    merged = TDigest(delta)
    for b in ds.select_columns([column]) \
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
               .iter_batches(batch_format="pyarrow"):
        if "td" not in b.column_names:
            continue
        for payload in b.column("td").to_pylist():
            merged = merged.merge(TDigest.from_bytes(payload, delta))
    return {q: merged.quantile(q) for q in quantiles}


def approx_distinct_by(ds: rd.Dataset, keys: list[str] | str, col: str,
                       p: int = 12,
                       num_partitions: int | None = None) -> rd.Dataset:
    """Per-group approximate distinct count — the 100 TB complement to
    :func:`nailray.ops.aggregates.distinct_count_by`: where the exact
    op's exchange carries every distinct (key, value) pair, this one
    carries ONE ``2^p``-byte HLL register blob per (block, key)
    (~0.8k keys/MB at p=12), so a key with a billion distinct values
    costs the same wire bytes as a key with ten.

    Scale shape: one hash pass per block + per-key register fold →
    hash-partitioned :func:`~nailray.shuffle.group_map` where registers
    max-merge per key and the estimate comes out.  Both the partial and
    the combine emit keys at the input's DECLARED Arrow types (the
    ``grouped_agg`` ``_typed`` discipline) — a null-containing block's
    pandas float-widening can't produce a conflicting block schema or
    round big int keys.  Group-key NULLs are their own group;
    all-NULL-value groups estimate 0 (matching the exact op's SQL
    COUNT(DISTINCT) convention).  Standard error ≈ 1.04/sqrt(2^p)
    (~1.6 % at the default p=12 / 4 KiB per key)."""
    from .shuffle import group_map, hash_partition, int_types_mapper, \
        partition_count

    if isinstance(keys, str):
        keys = [c.strip() for c in keys.split(",") if c.strip()]
    if col in keys:
        raise ValueError(
            f"approx_distinct_by: column {col!r} is also a group key")
    if not 4 <= p <= 18:
        raise ValueError(
            f"approx_distinct_by: p must be in [4, 18] (2^p registers "
            f"per key), got {p}")
    n_parts = partition_count(num_partitions)
    m = 1 << p

    def _norm_kv(kv) -> tuple:
        """Group label → hashable tuple with ONE null spelling (None):
        pandas labels nulls as nan / pd.NA / None depending on dtype."""
        kv = kv if isinstance(kv, tuple) else (kv,)
        return tuple(
            None if v is None or v is pd.NA
            or (isinstance(v, float) and v != v) else v
            for v in kv)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select(keys + [col]).combine_chunks()
        key_types = {k: t.schema.field(k).type for k in keys}
        valid = pc.is_valid(t.column(col))
        # null-drop the VALUE at the Arrow level: an int column with
        # nulls would widen to float64 in pandas and hash differently
        # from null-free blocks (_hash64's dtype-stability contract)
        # int_types_mapper keeps keys AND the value column at nullable
        # pandas dtypes — every block hashes the value under the SAME
        # dtype (the default conversion would widen only null-containing
        # blocks to float64 and hash identical values differently)
        sub = t.filter(valid).to_pandas(types_mapper=int_types_mapper)
        out_keys: list[tuple] = []
        out_regs: list[bytes] = []
        if len(sub):
            # ONE argsorted segment-max builds every group's registers
            # (codes align with size().index order under sort=False)
            gb = sub.groupby(keys, dropna=False, sort=False)
            codes = gb.ngroup().to_numpy(np.int64)
            labels = list(gb.size().index)
            regs2d = _grouped_hll_registers(
                codes, _hash64(sub[col]), p, len(labels))
            out_keys = [_norm_kv(kv) for kv in labels]
            out_regs = [row.tobytes() for row in regs2d]
        # all-NULL-value groups still surface (zero registers → 0 if
        # nothing else merges in); arrow-side filter is usually empty
        rest = t.filter(pc.invert(valid)).select(keys)
        if rest.num_rows:
            seen = set(out_keys)
            rdf = rest.to_pandas(types_mapper=int_types_mapper) \
                      .drop_duplicates()
            for kv in rdf.itertuples(index=False, name=None):
                kv = _norm_kv(kv)
                if kv not in seen:
                    seen.add(kv)
                    out_keys.append(kv)
                    out_regs.append(bytes(m))
        # object-dtype columns: pandas would infer float64 for
        # [bigint, None] and round ids beyond 2^53 before the typed
        # Arrow conversion could preserve them
        kdf = pd.DataFrame({k: pd.Series([kv[i] for kv in out_keys],
                                         dtype=object)
                            for i, k in enumerate(keys)})
        arrays = {k: pa.Array.from_pandas(kdf[k], type=key_types[k])
                  for k in keys}
        out = pa.table({**arrays,
                        "__regs": pa.array(out_regs, pa.large_binary())})
        part = hash_partition(out.select(keys).to_pandas(), keys, n_parts)
        return out.append_column("__part", pa.array(part, pa.int64()))

    parts = ds.select_columns(keys + [col]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pa.Table) -> pa.Table:
        key_types = {k: g.schema.field(k).type for k in keys}
        df = g.to_pandas(types_mapper=int_types_mapper)
        if not len(df):
            return pa.table({**{k: pa.nulls(0, key_types[k])
                                for k in keys},
                             "n_distinct_approx": pa.nulls(0, pa.int64())})
        # register rows stack into one (rows, m) matrix; per-key merge
        # is an argsorted segment max over it, estimates row-wise —
        # no per-key Python loop
        gb = df.groupby(keys, dropna=False, sort=False)
        codes = gb.ngroup().to_numpy(np.int64)
        labels = list(gb.size().index)
        arr = np.frombuffer(b"".join(df["__regs"]), np.int8) \
                .reshape(len(df), m)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        is_new = np.empty(len(codes_s), bool)
        is_new[0] = True
        np.not_equal(codes_s[1:], codes_s[:-1], out=is_new[1:])
        starts = np.flatnonzero(is_new)
        merged = np.maximum.reduceat(arr[order], starts, axis=0)
        # reduceat segments come out in code order (codes_s is sorted)
        ests = _hll_estimate_rows(merged)
        rows_keys = [_norm_kv(kv) for kv in labels]
        kdf = pd.DataFrame({k: pd.Series([kv[i] for kv in rows_keys],
                                         dtype=object)
                            for i, k in enumerate(keys)})
        arrays = {k: pa.Array.from_pandas(kdf[k], type=key_types[k])
                  for k in keys}
        return pa.table({**arrays,
                         "n_distinct_approx": pa.array(ests, pa.int64())})

    return group_map(parts, "__part", combine, n_parts)


def approx_quantiles_tdigest_by(ds: rd.Dataset, column: str, by: str,
                                quantiles: list[float], delta: int = 200,
                                num_partitions: int | None = None,
                                exchange: str | None = None) -> rd.Dataset:
    """Grouped one-pass approximate quantiles — the unbounded-group
    complement to the exact :func:`nailray.ops.quantile.quantiles_by`
    (which needs each group to fit a partition): one ~delta-centroid
    t-digest per (block, key) crosses the wire — a few KB regardless of
    group size, so a billion-row key costs the same exchange bytes as a
    ten-row key.  Digests merge per key inside hash partitions; merge
    order is fixed by sorting payload bytes, so a given block layout
    always reproduces the same estimate (t-digest compression is lossy,
    so unlike the grouped HLL the VALUE shifts within the error bound
    when the block split changes — rank accuracy holds regardless).
    Returns
    ``(by, q, value)``; rank error ~O(1/delta), tightest at the tails
    under the k1 scale.  NULL values drop per key; a NULL key forms its
    own group; an all-NULL-value key is omitted.  The per-block digest
    build loops once per key PRESENT IN THE BLOCK (each iteration a
    vectorized compress) — the bound is keys/block, same discipline as
    the grouped-HLL register build."""
    import pyarrow.compute as pc

    from .shuffle import (group_map, hash_partition, int_types_mapper,
                          partition_count)

    q_list = sorted(float(q) for q in quantiles)
    if not q_list or any(q < 0.0 or q > 1.0 for q in q_list):
        raise ValueError("quantiles must be fractions in [0, 1]")
    n_parts = partition_count(num_partitions)
    qs_np = np.asarray(q_list, np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(by).type
        empty = pa.table({by: pa.array([], key_t),
                          "td": pa.array([], pa.large_binary()),
                          "__part": pa.array([], pa.int64())})
        t = batch.select([by, column]) \
                 .filter(pc.is_valid(batch.column(column)))
        if t.num_rows == 0:
            return empty
        keys = t.select([by]).to_pandas(
            types_mapper=int_types_mapper)[by]
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        vals = np.asarray(pc.cast(t.column(column), pa.float64()))
        order = np.argsort(codes, kind="stable")
        codes_s, vals_s = codes[order], vals[order]
        starts = np.searchsorted(codes_s, np.arange(len(uniq)))
        ends = np.append(starts[1:], len(codes_s))
        payloads = [TDigest.of(vals_s[s:e], delta).to_bytes()
                    for s, e in zip(starts, ends)]
        key_arr = pa.array(pd.Series(uniq)).cast(key_t)
        out = pa.table({by: key_arr,
                        "td": pa.array(payloads, pa.large_binary())})
        part = hash_partition(
            out.select([by]).to_pandas(types_mapper=int_types_mapper),
            [by], n_parts)
        return out.append_column("__part", pa.array(part, pa.int64()))

    staged = ds.select_columns([by, column]).map_batches(
        partial, batch_format="pyarrow")

    def part_fn(g: pa.Table) -> pa.Table:
        key_t = g.schema.field(by).type
        if g.num_rows == 0 or "td" not in g.column_names:
            return pa.table({by: pa.array([], key_t),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        keys = g.select([by]).to_pandas(
            types_mapper=int_types_mapper)[by]
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        payloads = g.column("td").to_pylist()
        out_keys, out_q, out_v = [], [], []
        for ci in range(len(uniq)):
            mine = sorted(payloads[i] for i in np.flatnonzero(codes == ci))
            d = TDigest(delta)
            for p in mine:
                d = d.merge(TDigest.from_bytes(p, delta))
            for q in qs_np:
                out_keys.append(ci)
                out_q.append(float(q))
                out_v.append(d.quantile(float(q)))
        key_arr = pa.array(pd.Series(uniq).iloc[out_keys]
                           .reset_index(drop=True)).cast(key_t)
        return pa.table({by: key_arr,
                         "q": pa.array(out_q, pa.float64()),
                         "value": pa.array(out_v, pa.float64())})

    return group_map(staged, "__part", part_fn, n_parts,
                     exchange=exchange)
