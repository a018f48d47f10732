"""Exact distributed quantiles without a sort.

``exact_quantiles`` computes EXACT order statistics (DuckDB
``quantile_disc`` semantics: 1-based rank ``max(1, ceil(q*n))`` over the
non-null values) with no all-to-all exchange at all: every pass is a
``map_batches`` that folds each block into a few KB (min/max/count, then
per-bracket histograms), and brackets shrink geometrically until the
candidate set is small enough to collect exactly.

Cost model at scale: a 4096-bin histogram over 10^12 rows leaves
~2.4·10^8 rows per bin after one round and ~6·10^4 after two — three
column-pruned scans replace the full sort a naive exact quantile needs.
Degenerate distributions (one value dominating a bracket) resolve
immediately when the bracket collapses to a point.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _col_values(batch: pa.Table, column: str) -> np.ndarray:
    arr = batch.column(column)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.drop_null().to_numpy(zero_copy_only=False)


def exact_quantiles(
    ds: rd.Dataset,
    column: str,
    qs: list[float],
    bins: int = 4096,
    collect_limit: int = 1 << 18,
    max_rounds: int = 64,
) -> pd.DataFrame:
    """Exact ``quantile_disc`` values for every q in ``qs``; returns a
    DataFrame ``(q, value)``. Nulls are ignored (SQL aggregate
    semantics); an all-null / empty column yields null values."""
    if not qs:
        return pd.DataFrame({"q": [], "value": []})
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    ds = ds.select_columns([column])

    def minmax(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, column).astype(np.float64, copy=False)
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([None], pa.float64()),
                             "hi": pa.array([None], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    n, gmin, gmax = 0, math.inf, -math.inf
    for b in ds.map_batches(minmax, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            n += r["n"]
            if r["lo"] is not None:
                gmin, gmax = min(gmin, r["lo"]), max(gmax, r["hi"])
    if n == 0:
        return pd.DataFrame({"q": list(qs), "value": [None] * len(qs)})

    # state per target: inclusive bracket [lo, hi] known to contain the
    # rank element, `below` = values < lo, `m` = values in the bracket
    targets = []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        targets.append({"q": q, "rank": rank, "lo": gmin, "hi": gmax,
                        "below": 0, "m": n, "value": None})

    for _ in range(max_rounds):
        open_t = [t for t in targets if t["value"] is None]
        if not open_t:
            break
        # point / unshrinkable brackets go through collect too: their
        # values are FLOAT-identical but may be distinct in the native
        # type (int64 beyond 2^53) — collect dedups per block, so a hot
        # value costs one (value, count) row per block, not m rows
        coll_t = [t for t in open_t if t["m"] <= collect_limit
                  or t["lo"] == t["hi"] or t.get("force_collect")]
        hist_t = [t for t in open_t if t not in coll_t]

        if coll_t:
            # bracket membership tests in float64 (consistent with the
            # histogram counts) but the VALUES come back in the column's
            # native dtype and the final sort is native: float64 rounding
            # is monotonic, so float-bracket + exact-native-sort is the
            # true order even for int64 beyond 2^53
            brackets = [(t["lo"], t["hi"]) for t in coll_t]

            def collect(batch: pa.Table, brackets=tuple(brackets)) -> pa.Table:
                native = _col_values(batch, column)
                v = native.astype(np.float64, copy=False)
                idxs, vals, cnts = [], [], []
                for i, (lo, hi) in enumerate(brackets):
                    sel = native[(v >= lo) & (v <= hi)]
                    if len(sel):
                        u, c = np.unique(sel, return_counts=True)
                        idxs.append(np.full(len(u), i, np.int32))
                        vals.append(u)
                        cnts.append(c.astype(np.int64))
                if not idxs:
                    return pa.table({"t": pa.array([], pa.int32()),
                                     "v": pa.array(np.array([], native.dtype)),
                                     "c": pa.array([], pa.int64())})
                return pa.table({"t": pa.array(np.concatenate(idxs)),
                                 "v": pa.array(np.concatenate(vals)),
                                 "c": pa.array(np.concatenate(cnts))})

            got_v: list[list[np.ndarray]] = [[] for _ in coll_t]
            got_c: list[list[np.ndarray]] = [[] for _ in coll_t]
            for b in ds.map_batches(collect, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
                ti = b.column("t").to_numpy(zero_copy_only=False)
                vv = b.column("v").to_numpy(zero_copy_only=False)
                cc = b.column("c").to_numpy(zero_copy_only=False)
                for i in range(len(coll_t)):
                    m = ti == i
                    if m.any():
                        got_v[i].append(vv[m])
                        got_c[i].append(cc[m])
            for i, t in enumerate(coll_t):
                vv = np.concatenate(got_v[i])
                cc = np.concatenate(got_c[i])
                order = np.argsort(vv, kind="mergesort")
                cum = np.cumsum(cc[order])
                k = t["rank"] - t["below"]  # 1-based within the bracket
                pos = int(np.searchsorted(cum, k, side="left"))
                t["value"] = vv[order][pos].item()

        if hist_t:
            edges_list = [np.linspace(t["lo"], t["hi"], bins + 1)
                          for t in hist_t]

            def hist(batch: pa.Table,
                     edges_list=tuple(e.tobytes() for e in edges_list)) -> pa.Table:
                v = _col_values(batch, column).astype(np.float64, copy=False)
                rows = []
                for i, eb in enumerate(edges_list):
                    edges = np.frombuffer(eb, np.float64)
                    sel = v[(v >= edges[0]) & (v <= edges[-1])]
                    c = (np.searchsorted(edges, sel, side="right") - 1) \
                        .clip(0, len(edges) - 2)
                    counts = np.bincount(c, minlength=len(edges) - 1) \
                        .astype(np.int64)
                    rows.append(counts.tobytes())
                return pa.table({"t": pa.array(range(len(rows)), pa.int32()),
                                 "c": pa.array(rows, pa.large_binary())})

            sums = [np.zeros(bins, np.int64) for _ in hist_t]
            for b in ds.map_batches(hist, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
                for r in b.to_pylist():
                    sums[r["t"]] += np.frombuffer(r["c"], np.int64)
            for i, t in enumerate(hist_t):
                cum = np.cumsum(sums[i])
                k = t["rank"] - t["below"]
                bidx = int(np.searchsorted(cum, k, side="left"))
                edges = edges_list[i]
                new_lo, new_hi = float(edges[bidx]), float(edges[bidx + 1])
                new_m = int(sums[i][bidx])
                if (new_lo, new_hi, new_m) == (t["lo"], t["hi"], t["m"]):
                    # float-precision floor: the bracket cannot shrink.
                    # The values are float64-identical but NOT necessarily
                    # native-identical — resolve via the deduping collect
                    t["force_collect"] = True
                    continue
                t["below"] += int(cum[bidx - 1]) if bidx > 0 else 0
                t["lo"], t["hi"], t["m"] = new_lo, new_hi, new_m

    unresolved = [t for t in targets if t["value"] is None]
    if unresolved:
        raise RuntimeError(
            f"quantile refinement did not converge in {max_rounds} rounds "
            f"for q={[t['q'] for t in unresolved]}")
    return pd.DataFrame({"q": [t["q"] for t in targets],
                         "value": [t["value"] for t in targets]})


def filter_quantile(ds: rd.Dataset, column: str, lo: float = 0.01,
                    hi: float = 0.99,
                    cache_input: bool | str = "auto") -> rd.Dataset:
    """Keep rows whose ``column`` lies within the [lo, hi] EXACT
    quantile bounds of the full dataset — the scale-safe outlier /
    heavy-tail trimming pass (no global sort: bounds come from
    :func:`exact_quantiles`' bracket-shrink scans, then one streaming
    filter).  NULL values never pass (SQL BETWEEN semantics); an
    all-null column drops every row.

    ``cache_input`` follows the two-pass auto policy — the input is
    consumed by the quantile scans and once more by the filter."""
    import pyarrow.compute as pc

    from ..io import resolve_cache_input as _resolve_cache_input

    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    if _resolve_cache_input(ds, cache_input):
        ds = ds.materialize()
    qdf = exact_quantiles(ds, column, [lo, hi])
    lov, hiv = qdf["value"].tolist()

    def fn(batch: pa.Table) -> pa.Table:
        if lov is None or hiv is None or (lov != lov) or (hiv != hiv):
            return batch.slice(0, 0)
        # compare in the column's NATIVE type — exact_quantiles returns
        # exact native scalars (a float64 round-trip would blur int64
        # values beyond 2^53 and diverge from the SQL BETWEEN oracle)
        x = batch.column(column)
        try:
            lo_s, hi_s = pa.scalar(lov, x.type), pa.scalar(hiv, x.type)
        except (pa.ArrowInvalid, OverflowError, TypeError):
            x = pc.cast(x, pa.float64())
            lo_s, hi_s = float(lov), float(hiv)
        keep = pc.and_(pc.greater_equal(x, lo_s), pc.less_equal(x, hi_s))
        return batch.filter(pc.fill_null(keep, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def quantiles_by(ds: rd.Dataset, column: str, by: str,
                 qs=(0.5,), num_partitions: int | None = None,
                 exchange: str | None = None) -> rd.Dataset:
    """Exact per-group quantiles — ``(by, q, value)`` one row per
    (group, q), linear interpolation over the sorted non-null values
    (DuckDB ``quantile_cont`` / numpy ``'linear'`` semantics; NULL
    values drop per group, an all-NULL group is omitted, NaN sorts
    greatest in both engines).

    Scale shape: groups hash-co-locate through ``group_map`` (the same
    per-group-fits-a-partition contract every grouped map op here
    documents; for unbounded single groups use the global sketch path
    instead).  Inside a partition there is ONE lexsort of
    (group code, value) and then fully vectorized interpolation across
    every (group, q) pair — no per-group Python loop.  The exchange
    carries only the two projected columns."""
    import pyarrow.compute as pc

    from ..shuffle import (group_map, hash_partition, int_types_mapper,
                           partition_count)
    from .projection import resolve_column

    names = ds.schema().names
    column = resolve_column(names, column)
    by = resolve_column(names, by)
    q_list = sorted(float(q) for q in qs)
    if not q_list or any(q < 0.0 or q > 1.0 for q in q_list):
        raise ValueError("qs must be fractions in [0, 1]")
    n_parts = partition_count(num_partitions)

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([by, column])
        part = hash_partition(
            t.select([by]).to_pandas(types_mapper=int_types_mapper),
            [by], n_parts)
        return t.append_column("__part", pa.array(part, pa.int32()))

    staged = ds.select_columns([by, column]).map_batches(
        project, batch_format="pyarrow")

    qs_np = np.asarray(q_list, np.float64)

    def part_fn(g: pa.Table) -> pa.Table:
        key_t = g.schema.field(by).type
        empty = pa.table({
            by: pa.array([], key_t),
            "q": pa.array([], pa.float64()),
            "value": pa.array([], pa.float64()),
        })
        g = g.filter(pc.is_valid(g.column(column)))
        if g.num_rows == 0:
            return empty
        # nullable-int mapper: the default conversion widens
        # int-with-null key blocks to float64, merging ids past 2^53
        keys = g.select([by]).to_pandas(
            types_mapper=int_types_mapper)[by]
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        vals = np.asarray(g.column(column).combine_chunks(),
                          np.float64)
        order = np.lexsort((vals, codes))
        codes_s, vals_s = codes[order], vals[order]
        n_g = len(uniq)
        starts = np.searchsorted(codes_s, np.arange(n_g))
        ends = np.append(starts[1:], len(codes_s))
        counts = ends - starts
        # vectorized linear interpolation across all (group, q) pairs;
        # the fractional index is computed BEFORE adding the partition
        # offset (a large integer start would eat fraction bits), and
        # the lo*(1-frac) + hi*frac form is DuckDB quantile_cont's —
        # matches it to the ulp
        rel = qs_np[None, :] * (counts - 1)[:, None]
        base = np.floor(rel)
        frac = rel - base
        lo = starts[:, None] + base.astype(np.int64)
        hi = np.minimum(lo + 1, (ends - 1)[:, None])
        out = vals_s[lo] * (1.0 - frac) + vals_s[hi] * frac
        key_arr = pa.array(pd.Series(uniq).repeat(len(qs_np))
                           .reset_index(drop=True)).cast(key_t)
        return pa.table({
            by: key_arr,
            "q": pa.array(np.tile(qs_np, n_g), pa.float64()),
            "value": pa.array(out.reshape(-1), pa.float64()),
        })

    return group_map(staged, "__part", part_fn, n_parts,
                     exchange=exchange)
