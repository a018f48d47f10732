"""Exact global ranking of a Dataset column, distributed.

``rank(v) = |{u < v}| + (count(v)+1)/2`` — the fractional average-tie
rank (SQL: ``RANK() OVER (ORDER BY v) + (COUNT(*) OVER (PARTITION BY
v) - 1) / 2.0``).

Scale shape (100 TB): the raw column never funnels to one place —

1. ``grouped_agg`` collapses it to the distinct ``(value, count)``
   table (per-block combiner, coarse hash exchange — O(distinct), not
   O(rows), through the wire);
2. ordered bucket boundaries come from a bounded stride sample of the
   DISTINCT values (boundaries affect balance only; counts stay exact);
3. per-bucket count totals (≤ ``n_buckets`` rows) prefix-sum on the
   driver — the same carry pattern as ``fill_directional``;
4. one task per bucket sorts its distinct values and cumsums the local
   "rows smaller" — global rank = driver base + local cumsum.

Reference ancestry: ``src/utils/stats.rs:374-381`` ranks via two
DataFusion ORDER BY windows over the whole table; this is the
explicitly partitioned equivalent with exact tie handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..shuffle import group_map, grouped_agg


def global_avg_rank(ds: rd.Dataset, col: str, n_buckets: int = 256,
                    num_partitions: int | None = None,
                    exchange: str | None = None) -> rd.Dataset:
    """Mapping Dataset ``(col, col + "__rank")`` — one row per distinct
    non-null value, rank exact over the whole input (1-based, average
    ties). Join it back on ``col`` to attach ranks to rows."""
    rank_col = f"{col}__rank"

    def drop_nulls(b: pa.Table) -> pa.Table:
        c = b.column(col)
        return b.filter(pc.is_valid(c)) if c.null_count else b

    clean = ds.select_columns([col]).map_batches(drop_nulls, batch_format="pyarrow")
    counts = grouped_agg(clean, [col], {"cnt": (col, "size")},
                         num_partitions=num_partitions, exchange=exchange)
    counts = counts.materialize()  # consumed twice below (narrow table)
    # ~4k distinct values per bucket task; tiny inputs get few buckets
    n_buckets = max(8, min(n_buckets, counts.count() // 4096 + 1))

    sch = counts.schema() or ds.schema()
    sch = sch.base_schema if hasattr(sch, "base_schema") else sch
    vt = sch.field(col).type
    is_str = pa.types.is_string(vt) or pa.types.is_large_string(vt)

    def _np_vals(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
        # strings rank fine (lexicographic, like SQL ORDER BY): bucket
        # via python-object comparisons over the DISTINCT values only
        if is_str:
            return np.asarray(arr.to_pylist(), dtype=object)
        return np.asarray(pc.cast(arr, pa.float64()))

    # bucket boundaries from a bounded sample of the distinct values
    def sample_part(t: pa.Table) -> pa.Table:
        v = t.column(col)
        stride = max(1, len(v) // 256)
        return pa.table({"v": pc.take(v, pa.array(range(0, len(v), stride)))})

    samp_blocks = [_np_vals(b.column("v")) for b in
                   counts.map_batches(sample_part, batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow")]
    samp = np.concatenate(samp_blocks) if samp_blocks else np.zeros(0)
    if len(samp) == 0:  # empty input: schema-correct empty mapping
        et = vt if hasattr(sch, "field") else pa.float64()
        return rd.from_arrow(pa.table({col: pa.array([], et),
                                       rank_col: pa.array([], pa.float64())}))
    # evenly spaced picks from the sorted sample (no interpolation —
    # works identically for numeric and string domains)
    samp.sort()
    picks = np.linspace(0, len(samp) - 1, n_buckets + 1)[1:-1].astype(int)
    bounds = np.unique(samp[picks])
    nb = len(bounds) + 1

    def with_bucket(t: pa.Table) -> pa.Table:
        v = _np_vals(t.column(col))
        bkt = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return t.append_column("__bkt", pa.array(bkt))

    bucketed = counts.map_batches(with_bucket, batch_format="pyarrow")

    # driver prefix over ≤ nb bucket totals → "rows in smaller buckets"
    totals = grouped_agg(bucketed, ["__bkt"], {"tot": ("cnt", "sum")}).to_pandas()
    base = np.zeros(nb, np.int64)
    csum = 0
    for _, r in totals.sort_values("__bkt").iterrows():
        base[int(r["__bkt"])] = csum
        csum += int(r["tot"])

    def rank_bucket(t: pa.Table) -> pa.Table:
        b = int(t.column("__bkt")[0].as_py())
        t = t.sort_by([(col, "ascending")])
        cnt = np.asarray(t.column("cnt"), dtype=np.int64)
        less = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else cnt
        rank = base[b] + less + (cnt + 1) / 2.0
        return pa.table({col: t.column(col),
                         rank_col: pa.array(rank, pa.float64())})

    return group_map(bucketed, "__bkt", rank_bucket, nb, exchange=exchange)


def _weighted_cd(x: np.ndarray, y: np.ndarray, c: np.ndarray) -> int:
    """Σ_{i<j} sign(x_i−x_j)·sign(y_i−y_j)·c_i·c_j — the concordant-
    minus-discordant pair count over a WEIGHTED point set (each row i
    stands for ``c_i`` identical observations). O(m log m): sort by
    (x, y), sweep groups of equal x, Fenwick tree over y-ranks holding
    the weight mass seen so far. Same-x pairs and same-y pairs
    contribute 0 (sign = 0), exactly the tau-b convention.

    The Fenwick holds int64 weight sums; the C−D accumulator is a
    Python int (products of two weights overflow int64 at 10^10+
    rows)."""
    n = len(x)
    if n < 2:
        return 0
    order = np.lexsort((y, x))
    x, y, c = x[order], y[order], c[order].astype(np.int64)
    yr = np.unique(y, return_inverse=True)[1].astype(np.int64) + 1  # 1-based
    K = int(yr.max())
    tree = np.zeros(K + 1, np.int64)
    cd = 0
    total = 0
    starts = np.flatnonzero(np.concatenate(([True], x[1:] != x[:-1])))
    ends = np.concatenate((starts[1:], [n]))
    for s, e in zip(starts, ends):
        for k in range(s, e):
            r = int(yr[k])
            i, less_eq = r, 0
            while i > 0:
                less_eq += int(tree[i]); i -= i & (-i)
            i, less = r - 1, 0
            while i > 0:
                less += int(tree[i]); i -= i & (-i)
            cd += int(c[k]) * (less - (total - less_eq))
        for k in range(s, e):
            i, v = int(yr[k]), int(c[k])
            while i <= K:
                tree[i] += v; i += i & (-i)
        total += int(c[s:e].sum())
    return cd


def _tie_moments(counts_ds: rd.Dataset, col: str) -> tuple[float, float, float]:
    """One pass over a (…, col) count Dataset → the three tie-group
    moments the tau-b significance test needs (Kendall 1945 variance):
    ``(Σ c(c−1)/2, Σ c(c−1)(2c+5), Σ c(c−1)(c−2))``. Float64 partials:
    exact below 2^53, and both tau and z are ratios so relative error
    beyond that is negligible."""
    def partial(b: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(b.column(col), pa.float64()))
        cc1 = v * (v - 1.0)
        return pa.table({
            "t1": pa.array([float((cc1 / 2.0).sum())]),
            "t2": pa.array([float((cc1 * (2.0 * v + 5.0)).sum())]),
            "t3": pa.array([float((cc1 * (v - 2.0)).sum())]),
        })

    t1 = t2 = t3 = 0.0
    for b in counts_ds.map_batches(partial, batch_format="pyarrow") \
                      .iter_batches(batch_format="pyarrow"):
        if "t1" in b.column_names:
            t1 += float(pc.sum(b.column("t1")).as_py() or 0.0)
            t2 += float(pc.sum(b.column("t2")).as_py() or 0.0)
            t3 += float(pc.sum(b.column("t3")).as_py() or 0.0)
    return t1, t2, t3


def _pair_sum(counts_ds: rd.Dataset, col: str) -> float:
    """Σ c·(c−1)/2 over a (…, col) count Dataset — the tie-pair total
    for one variable (see :func:`_tie_moments` for the full set)."""
    return _tie_moments(counts_ds, col)[0]


def _bucket_bounds(values_ds: rd.Dataset, col: str, n_buckets: int) -> np.ndarray:
    """Ordered bucket boundaries from a bounded stride sample of the
    DISTINCT values (same policy as :func:`global_avg_rank` — bounds
    affect balance only, never correctness)."""
    def sample_part(t: pa.Table) -> pa.Table:
        v = t.column(col)
        stride = max(1, len(v) // 256)
        return pa.table({"v": pc.take(v, pa.array(range(0, len(v), stride)))})

    samp = [np.asarray(pc.cast(b.column("v"), pa.float64()))
            for b in values_ds.map_batches(sample_part, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if "v" in b.column_names]
    samp = np.concatenate(samp) if samp else np.zeros(0)
    if len(samp) == 0:
        return np.zeros(0)
    samp.sort()
    picks = np.linspace(0, len(samp) - 1, n_buckets + 1)[1:-1].astype(int)
    return np.unique(samp[picks])


def kendall_exact(ds: rd.Dataset, x: str, y: str, n_buckets: int = 128,
                  num_partitions: int | None = None,
                  return_stats: bool = False) -> float | tuple[float, int]:
    """Exact Kendall tau-b, fully distributed — the scale answer to the
    reference's O(n²) self-CROSS-JOIN tau (src/utils/stats.rs:386-410).

    Decomposition: collapse to the distinct ``(x, y, count)`` table
    (``grouped_agg`` — the only thing that ever moves is O(distinct
    pairs)), bucket x and y by sampled distinct-value boundaries, then
    split the C−D pair sum three ways, each computed EXACTLY:

    - **same x-bucket** → one task per x-bucket runs the weighted
      Fenwick sweep (:func:`_weighted_cd`) over its raw (x, y) rows;
    - **different x-bucket, same y-bucket** → one task per y-bucket
      sweeps (x_bucket, y): across x-buckets the x-order equals the
      bucket order, and same-x-bucket pairs contribute sign 0 (already
      counted above);
    - **different x-bucket AND different y-bucket** → both signs are
      determined by bucket order alone, so the ≤ n_buckets² contingency
      COUNT matrix (a tiny grouped_agg result) closes the sum on the
      driver.

    Ties: tau-b = (C−D) / √((n0−n1)(n0−n2)) with n1/n2 the tie-pair
    sums per variable (distributed Σ c(c−1)/2 over the per-value
    counts). Pairs with a null in either column are dropped first.

    Driver state: two bounds arrays (≤ n_buckets floats), the bucket
    contingency matrix, and a handful of scalars — never a row set.

    ``return_stats=True`` returns a dict ``{tau, n, s, tie_x, tie_y}``
    — ``s`` the raw C−D sum and ``tie_x``/``tie_y`` the per-variable
    tie-group moments ``(Σt(t−1)/2, Σt(t−1)(2t+5), Σt(t−1)(t−2))`` —
    everything the tie-corrected tau-b significance test needs, all
    computed from aggregates this function already runs (no second
    dataset scan)."""
    import functools
    import math

    from ..shuffle import partition_count

    def _stats(tau: float, n: int, s: float = 0.0,
               tx: tuple = (0.0, 0.0, 0.0),
               ty: tuple = (0.0, 0.0, 0.0)) -> dict:
        return {"tau": tau, "n": n, "s": s, "tie_x": tx, "tie_y": ty}

    def complete(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column(x)), pc.is_valid(b.column(y)))
        b = b.filter(m)
        return pa.table({"x": pc.cast(b.column(x), pa.float64()),
                         "y": pc.cast(b.column(y), pa.float64())})

    clean = ds.select_columns([x, y]).map_batches(complete, batch_format="pyarrow")
    pairs = grouped_agg(clean, ["x", "y"], {"cnt": ("x", "size")},
                        num_partitions=num_partitions).materialize()
    m_distinct = pairs.count()
    if m_distinct == 0:
        return _stats(float("nan"), 0) if return_stats else float("nan")
    nb = max(4, min(n_buckets, m_distinct // 2048 + 1))

    # n and tie-pair sums — the two marginal aggregates are independent,
    # so their exchanges run overlapped (same driver-barrier hiding as
    # spearman_exact's two rank maps)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as _ex:
        _fx = _ex.submit(lambda: grouped_agg(
            pairs, ["x"], {"c": ("cnt", "sum")},
            num_partitions=num_partitions).materialize())
        _fy = _ex.submit(lambda: grouped_agg(
            pairs, ["y"], {"c": ("cnt", "sum")},
            num_partitions=num_partitions).materialize())
        gx, gy = _fx.result(), _fy.result()
    n = 0
    for b in gx.iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(b.column("c")).as_py() or 0)
    if n < 2:
        return _stats(float("nan"), n) if return_stats else float("nan")
    n0 = n * (n - 1) / 2.0
    tie_x = _tie_moments(gx, "c")
    tie_y = _tie_moments(gy, "c")
    n1, n2 = tie_x[0], tie_y[0]
    denom = math.sqrt((n0 - n1) * (n0 - n2))
    if denom == 0:
        return _stats(float("nan"), n, 0.0, tie_x, tie_y) \
            if return_stats else float("nan")

    bx_bounds = _bucket_bounds(gx, "x", nb)
    by_bounds = _bucket_bounds(gy, "y", nb)
    nbx, nby = len(bx_bounds) + 1, len(by_bounds) + 1

    def with_buckets(t: pa.Table) -> pa.Table:
        vx = np.asarray(t.column("x"))
        vy = np.asarray(t.column("y"))
        return (t.append_column("__bx", pa.array(
                    np.searchsorted(bx_bounds, vx, side="right").astype(np.int64)))
                 .append_column("__by", pa.array(
                    np.searchsorted(by_bounds, vy, side="right").astype(np.int64))))

    bucketed = pairs.map_batches(with_buckets, batch_format="pyarrow").materialize()

    def cd_kernel(g: pa.Table, xcol: str, ycol: str) -> pa.Table:
        cd = _weighted_cd(np.asarray(g.column(xcol)),
                          np.asarray(g.column(ycol)),
                          np.asarray(g.column("cnt")))
        return pa.table({"cd": pa.array([float(cd)], pa.float64())})

    def _sum_cd(d: rd.Dataset) -> float:
        t = 0.0
        for b in d.iter_batches(batch_format="pyarrow"):
            if "cd" in b.column_names:
                t += float(pc.sum(b.column("cd")).as_py() or 0.0)
        return t

    # term A: exact within each x-bucket
    def _term_a() -> float:
        return _sum_cd(group_map(
            bucketed, "__bx",
            functools.partial(cd_kernel, xcol="x", ycol="y"), nbx))

    # term B: same y-bucket, different x-bucket (x at bucket
    # granularity); collapse (bx, y) first so the sweep sees one row
    # per (bx, y)
    def _term_b() -> float:
        by_pairs = grouped_agg(bucketed, ["__bx", "__by", "y"],
                               {"cnt": ("cnt", "sum")},
                               num_partitions=num_partitions)

        def bx_as_float(t: pa.Table) -> pa.Table:
            return t.set_column(t.column_names.index("__bx"), "__bx",
                                pc.cast(t.column("__bx"), pa.float64()))

        return _sum_cd(group_map(
            by_pairs.map_batches(bx_as_float, batch_format="pyarrow"),
            "__by", functools.partial(cd_kernel, xcol="__bx", ycol="y"), nby))

    # term C: both bucket indices differ — tiny contingency matrix
    def _term_c() -> float:
        mat = grouped_agg(bucketed, ["__bx", "__by"],
                          {"cnt": ("cnt", "sum")},
                          num_partitions=num_partitions)
        mdf = mat.to_pandas()
        return float(_weighted_cd(mdf["__bx"].to_numpy(np.float64),
                                  mdf["__by"].to_numpy(np.float64),
                                  mdf["cnt"].to_numpy(np.int64)))

    # the three C−D terms are independent reductions over the shared
    # materialized `bucketed` — run their exchanges overlapped (the
    # direct group_map path materializes on call, so sequential calls
    # would serialize three driver barriers)
    with ThreadPoolExecutor(3) as _ex:
        _fa, _fb, _fc = (_ex.submit(_term_a), _ex.submit(_term_b),
                         _ex.submit(_term_c))
        cd_total = _fa.result() + _fb.result() + _fc.result()
    tau = cd_total / denom
    return _stats(tau, n, float(cd_total), tie_x, tie_y) \
        if return_stats else tau


def spearman_exact(ds: rd.Dataset, x: str, y: str,
                   num_partitions: int | None = None) -> float:
    """Exact Spearman rho, fully distributed: Pearson over exact global
    average-tie ranks; ranks per column via ``global_avg_rank`` (narrow
    shuffles only), attached back with hash joins on the value.

    Pairs with a null in either column are dropped FIRST (ranks are
    computed over the complete pairs, matching an oracle that filters
    ``x IS NOT NULL AND y IS NOT NULL`` before its rank windows)."""
    from .aggregates import pearson
    from .combine import merge

    def complete(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column(x)), pc.is_valid(b.column(y)))
        return b.filter(m)

    pair = ds.select_columns([x, y]).map_batches(complete, batch_format="pyarrow")
    pair = pair.materialize()  # reused 3×: two rank maps + the join spine
    # the two rank maps are independent pipelines with several driver
    # barriers each (materialize, sample collect, bucket totals) —
    # overlap them so neither's barrier idles the cluster
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fx = ex.submit(global_avg_rank, pair, x, 256, num_partitions)
        fy = ex.submit(global_avg_rank, pair, y, 256, num_partitions)
        mx, my = fx.result(), fy.result()
    # right side is (key, key__rank): key is dropped by the join and the
    # rank column is unique, so no prefix is needed
    j = merge(pair, mx, x, x, num_partitions=num_partitions, right_prefix="")
    j = merge(j, my, y, y, num_partitions=num_partitions, right_prefix="")
    return pearson(j, f"{x}__rank", f"{y}__rank")
