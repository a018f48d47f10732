"""Per-group analytic (window) functions: row_number / rank /
dense_rank, running aggregates, lag/lead — SQL's
``OVER (PARTITION BY key ORDER BY col)`` family.

The reference has no window functions; these are engine extras every
feature pipeline needs (dedup-rank, per-user running totals,
previous-event deltas). Execution shape: coarse hash-partition on the
group keys (``nailray.shuffle.group_map``) so all rows of one key land
in one partition; inside the partition the kernel is ONE stable pandas
sort + Cython groupby transforms (cumcount / rank / cumsum / shift) —
O(n log n) per partition, no per-key Python, and the Ray group count is
P (≈2×CPUs), never O(distinct keys). Null order keys sort last
(DuckDB's NULLS LAST default); null group keys form one group.
"""

from __future__ import annotations

import functools

import pyarrow as pa
import ray.data as rd

from ..shuffle import (group_map, hash_partition, int_types_mapper,
                       partition_count, to_arrow_clean)

_RANK_METHODS = {"row_number", "rank", "dense_rank", "percent_rank",
                 "cume_dist", "ntile"}
_RUNNING_FNS = {"sum", "count", "min", "max"}


def _tag(ds: rd.Dataset, keys: list[str], n_parts: int) -> rd.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        kb = batch.select(keys).to_pandas()
        return batch.append_column(
            "__part", pa.array(hash_partition(kb, keys, n_parts)))

    return ds.map_batches(tag, batch_format="pyarrow")


def _ordered_groupby(g: pa.Table, keys: list[str], order_col: str,
                     ascending: bool):
    """(base table, df in input order, ordered df, groupby over the
    ordered rows). The sort is stable (ties keep input order) and puts
    null order keys last; transform outputs map back to input order by
    index alignment."""
    base = g.drop_columns(["__part"])
    df = base.to_pandas(types_mapper=int_types_mapper)
    ordered = df.sort_values(order_col, ascending=ascending,
                             kind="mergesort", na_position="last")
    return base, df, ordered, ordered.groupby(keys, dropna=False, sort=False)


def _rank_partition(g: pa.Table, *, keys: list[str], order_col: str,
                    ascending: bool, method: str, out_col: str,
                    k: int) -> pa.Table:
    import numpy as np
    import pandas as pd

    base, df, ordered, gb = _ordered_groupby(g, keys, order_col, ascending)
    out_t = pa.int64()
    if method == "row_number":
        df[out_col] = gb.cumcount() + 1
    elif method in ("rank", "dense_rank"):
        r = gb[order_col].rank(method="min" if method == "rank" else "dense",
                               ascending=ascending, na_option="bottom")
        df[out_col] = r.astype("int64")
    elif method in ("percent_rank", "cume_dist"):
        # pandas na_option="bottom" ties nulls as one peer group — same
        # as SQL's NULLS LAST peer semantics (verified vs DuckDB)
        n = gb[order_col].transform("size")
        if method == "percent_rank":
            r = gb[order_col].rank(method="min", ascending=ascending,
                                   na_option="bottom")
            out = ((r - 1) / (n - 1).clip(lower=1)).where(n > 1, 0.0)
        else:
            r = gb[order_col].rank(method="max", ascending=ascending,
                                   na_option="bottom")
            out = r / n
        df[out_col] = out
        out_t = pa.float64()
    else:  # ntile: first (n % k) buckets hold one extra row
        c = gb.cumcount().to_numpy()
        n = gb[order_col].transform("size").to_numpy()
        q, r = n // k, n % k
        cut = r * (q + 1)
        tile = np.where(c < cut, c // np.maximum(q + 1, 1),
                        r + (c - cut) // np.maximum(q, 1)) + 1
        df[out_col] = pd.Series(tile, index=ordered.index)
    schema = pa.schema(list(base.schema) + [pa.field(out_col, out_t)])
    return to_arrow_clean(df, schema=schema)


def group_rank(ds: rd.Dataset, keys: list[str], order_col: str,
               ascending: bool = True, method: str = "row_number",
               out_col: str = "rn", k: int = 4,
               num_partitions: int | None = None) -> rd.Dataset:
    """Append ``out_col`` = ROW_NUMBER() / RANK() / DENSE_RANK() /
    PERCENT_RANK() / CUME_DIST() / NTILE(k) OVER (PARTITION BY keys
    ORDER BY order_col). row_number/ntile break ties by input order
    within a partition — pass a unique order key when the result must
    be deterministic (the other methods are tie-stable)."""
    if method not in _RANK_METHODS:
        raise ValueError(f"unknown method {method!r}: {sorted(_RANK_METHODS)}")
    if method == "ntile" and k < 1:
        raise ValueError("ntile requires k >= 1")
    n_parts = partition_count(num_partitions)
    return group_map(
        _tag(ds, keys, n_parts), "__part",
        functools.partial(_rank_partition, keys=keys, order_col=order_col,
                          ascending=ascending, method=method, out_col=out_col,
                          k=k),
        n_parts)


def _value_partition(g: pa.Table, *, keys: list[str], order_col: str,
                     value_col: str, which: str, ascending: bool,
                     out_col: str) -> pa.Table:
    import numpy as np
    import pandas as pd

    base, df, ordered, gb = _ordered_groupby(g, keys, order_col, ascending)
    # positional (SQL) semantics: FIRST_VALUE may be null — so take the
    # row at the group's first/last position, not pandas' first non-null
    pos = pd.Series(np.arange(len(ordered)), index=ordered.index)
    ordered = ordered.assign(__pos=pos)
    take = ordered.groupby(keys, dropna=False, sort=False)["__pos"] \
        .transform("min" if which == "first" else "max").to_numpy()
    vals = ordered[value_col].to_numpy()
    df[out_col] = pd.Series(vals[take], index=ordered.index)
    schema = pa.schema(list(base.schema)
                       + [pa.field(out_col, base.schema.field(value_col).type)])
    return to_arrow_clean(df, schema=schema)


def group_value(ds: rd.Dataset, keys: list[str], order_col: str,
                value_col: str, which: str = "first",
                ascending: bool = True, out_col: str | None = None,
                num_partitions: int | None = None) -> rd.Dataset:
    """Append ``out_col`` = FIRST_VALUE / LAST_VALUE (value_col) OVER
    (PARTITION BY keys ORDER BY order_col ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING) — positional, nulls included."""
    if which not in ("first", "last"):
        raise ValueError("which must be 'first' or 'last'")
    out_col = out_col or f"{which}_{value_col}"
    n_parts = partition_count(num_partitions)
    return group_map(
        _tag(ds, keys, n_parts), "__part",
        functools.partial(_value_partition, keys=keys, order_col=order_col,
                          value_col=value_col, which=which,
                          ascending=ascending, out_col=out_col),
        n_parts)


def _running_partition(g: pa.Table, *, keys: list[str], order_col: str,
                       value_col: str, fn: str, ascending: bool,
                       out_col: str) -> pa.Table:
    base, df, ordered, gb = _ordered_groupby(g, keys, order_col, ascending)
    if fn == "count":
        ordered["__nn"] = ordered[value_col].notna()
        out = ordered.groupby(keys, dropna=False, sort=False)["__nn"] \
            .cumsum().astype("int64")
        out_t = pa.int64()
    elif fn == "sum":
        # SQL SUM OVER ignores nulls; rows before the first non-null are NULL
        ordered["__v0"] = ordered[value_col].fillna(0)
        ordered["__nn"] = ordered[value_col].notna()
        gb2 = ordered.groupby(keys, dropna=False, sort=False)
        out = gb2["__v0"].cumsum().where(gb2["__nn"].cumsum() > 0)
        in_t = base.schema.field(value_col).type
        out_t = pa.float64() if pa.types.is_floating(in_t) else pa.int64()
    elif fn in ("min", "max"):
        # cummin/cummax leave NaN at null rows; SQL's frame min/max
        # ignores nulls, so the previous extremum carries forward
        ordered["__cm"] = (gb[value_col].cummin() if fn == "min"
                           else gb[value_col].cummax())
        out = ordered.groupby(keys, dropna=False, sort=False)["__cm"].ffill()
        out_t = base.schema.field(value_col).type
    else:
        raise ValueError(f"unknown fn {fn!r}: {sorted(_RUNNING_FNS)}")
    df[out_col] = out
    schema = pa.schema(list(base.schema) + [pa.field(out_col, out_t)])
    return to_arrow_clean(df, schema=schema)


def running_agg(ds: rd.Dataset, keys: list[str], order_col: str,
                value_col: str, fn: str = "sum", ascending: bool = True,
                out_col: str | None = None,
                num_partitions: int | None = None) -> rd.Dataset:
    """Append ``out_col`` = fn(value_col) OVER (PARTITION BY keys ORDER
    BY order_col ROWS UNBOUNDED PRECEDING). fn: sum | count | min | max.
    Null values are ignored per SQL (a running sum over an all-null
    prefix is NULL, not 0). Ties in ``order_col`` accumulate in input
    order — use a unique order key for ROWS-frame determinism."""
    if fn not in _RUNNING_FNS:
        raise ValueError(f"unknown fn {fn!r}: {sorted(_RUNNING_FNS)}")
    out_col = out_col or f"running_{fn}"
    n_parts = partition_count(num_partitions)
    return group_map(
        _tag(ds, keys, n_parts), "__part",
        functools.partial(_running_partition, keys=keys, order_col=order_col,
                          value_col=value_col, fn=fn, ascending=ascending,
                          out_col=out_col),
        n_parts)


def _shift_partition(g: pa.Table, *, keys: list[str], order_col: str,
                     value_col: str, offset: int, ascending: bool,
                     out_col: str) -> pa.Table:
    base, df, ordered, gb = _ordered_groupby(g, keys, order_col, ascending)
    df[out_col] = gb[value_col].shift(offset)
    schema = pa.schema(list(base.schema)
                       + [pa.field(out_col, base.schema.field(value_col).type)])
    return to_arrow_clean(df, schema=schema)


def group_lag(ds: rd.Dataset, keys: list[str], order_col: str,
              value_col: str, offset: int = 1, ascending: bool = True,
              out_col: str | None = None,
              num_partitions: int | None = None) -> rd.Dataset:
    """Append ``out_col`` = LAG(value_col, offset) OVER (PARTITION BY
    keys ORDER BY order_col); negative ``offset`` gives LEAD. First
    (last) rows of each group are NULL."""
    out_col = out_col or ("lag_" if offset >= 0 else "lead_") + value_col
    n_parts = partition_count(num_partitions)
    return group_map(
        _tag(ds, keys, n_parts), "__part",
        functools.partial(_shift_partition, keys=keys, order_col=order_col,
                          value_col=value_col, offset=offset,
                          ascending=ascending, out_col=out_col),
        n_parts)
