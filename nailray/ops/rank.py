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
