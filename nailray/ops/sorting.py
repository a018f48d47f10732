"""sort (multi-column, per-column strategy) and shuffle
(SURVEY §2.6: src/commands/sort.rs, shuffle.rs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..expr import resolve_column

_STRATEGIES = {"auto", "numeric", "alphabetic", "date", "hour",
               "alphabetic-numeric", "numeric-alphabetic"}

# user-friendly token → strptime, matching the reference's converters
# (src/commands/sort.rs:401-414 convert_date_format, 416-427 convert_time_format)
_DATE_TOKENS = [("yyyy", "%Y"), ("yy", "%y"), ("mm", "%m"), ("MM", "%m"),
                ("dd", "%d"), ("DD", "%d")]
_TIME_TOKENS = [("hh", "%H"), ("HH", "%H"), ("mm", "%M"), ("MM", "%M"),
                ("ss", "%S"), ("SS", "%S")]


def convert_date_format(fmt: str) -> str:
    """``mm/dd/yyyy`` → ``%m-%d-%Y`` (reference sort.rs:401-414: tokens
    substituted, ``/`` normalized to ``-``; values are dash-normalized
    before parsing so slash-separated data still sorts)."""
    for a, b in _DATE_TOKENS:
        fmt = fmt.replace(a, b)
    return fmt.replace("/", "-")


def convert_time_format(fmt: str) -> str:
    """``hh:mm:ss`` → ``%H:%M:%S`` (reference sort.rs:416-427)."""
    for a, b in _TIME_TOKENS:
        fmt = fmt.replace(a, b)
    return fmt


def _key_expr(col: pa.ChunkedArray, strategy: str, case_insensitive: bool,
              date_format: str | None = None, hour_format: str | None = None):
    """Computed sort-key column per strategy (src/commands/sort.rs:253-376)."""
    t = col.type
    if strategy == "auto":
        strategy = "numeric" if (pa.types.is_integer(t) or pa.types.is_floating(t)
                                 or pa.types.is_temporal(t)) else "alphabetic"
    if strategy == "numeric":
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            try:
                return pc.cast(col, pa.float64(), safe=False)
            except pa.ArrowInvalid:
                # unparseable values → null keys (sorted per nulls=...)
                import pandas as pd

                coerced = pd.to_numeric(col.to_pandas(), errors="coerce")
                return pa.array(coerced, pa.float64())
        return col
    if strategy == "alphabetic":
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            col = pc.cast(col, pa.string())
        return pc.utf8_lower(col) if case_insensitive else col
    if strategy == "alphabetic-numeric":
        # reference semantics (sort.rs:344-358): strings sort as plain
        # alphabetic (ci applies); non-strings use the base column — the
        # reference documents the composite as a "simplified approach"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pc.utf8_lower(col) if case_insensitive else col
        return col
    if strategy == "numeric-alphabetic":
        # reference semantics (sort.rs:359-368): base column as-is
        return col
    if strategy == "date":
        if pa.types.is_temporal(t):
            return col
        if date_format:
            fmt = convert_date_format(date_format)
            col = pc.replace_substring(col, pattern="/", replacement="-")
            return pc.strptime(col, format=fmt, unit="us", error_is_null=True)
        return pc.strptime(col, format="%Y-%m-%d", unit="us", error_is_null=True)
    if strategy == "hour":
        if pa.types.is_temporal(t):
            ts = col
        else:
            fmt = convert_time_format(hour_format) if hour_format else "%H:%M:%S"
            ts = pc.strptime(col, format=fmt, unit="us", error_is_null=True)
        return pc.hour(ts)
    raise ValueError(f"unknown sort strategy {strategy!r}")


def sort(
    ds: rd.Dataset,
    columns: list[str] | str,
    descending: list[bool] | bool = False,
    strategies: list[str] | None = None,
    nulls: str = "last",
    case_insensitive: bool = False,
    date_format: str | None = None,
    hour_format: str | None = None,
) -> rd.Dataset:
    """Distributed range-partition sort with strategy-derived key columns
    added via map_batches, dropped after (src/commands/sort.rs:109-223).

    nulls: first | last | skip (skip = pre-filter null keys); the
    default 'last' matches the reference CLI default
    (sort.rs SortArgs --nulls default_value "last"). Placement is
    enforced with an explicit leading is-null key per sort key; it
    applies to nulls PRODUCED by the key expression too (failed numeric
    casts, unparseable dates)."""
    if nulls not in ("first", "last", "skip"):
        raise ValueError(f"unknown null handling {nulls!r}")
    sch = ds.schema()
    if sch is None:  # fully empty derived dataset: nothing to sort
        return ds
    names = sch.names
    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    columns = [resolve_column(names, c) for c in columns]
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    # pad short per-column lists with defaults (reference clap semantics:
    # missing entries fall back) — zip truncation would silently DROP
    # trailing sort keys
    descending = list(descending) + [False] * (len(columns) - len(descending))
    if len(descending) > len(columns):
        raise ValueError(f"{len(descending)} descending flags for "
                         f"{len(columns)} sort columns")
    strategies = list(strategies or []) + ["auto"] * (len(columns) - len(strategies or []))
    if len(strategies) > len(columns):
        raise ValueError(f"{len(strategies)} strategies for {len(columns)} sort columns")
    for s in strategies:
        if s not in _STRATEGIES:
            raise ValueError(f"unknown sort strategy {s!r}")

    key_names = [f"__sort_key_{i}" for i in range(len(columns))]
    null_names = [f"__sort_null_{i}" for i in range(len(columns))]

    def add_keys(batch: pa.Table) -> pa.Table:
        for kn, nn, c, s in zip(key_names, null_names, columns, strategies):
            key = _key_expr(batch.column(c), s, case_insensitive,
                            date_format, hour_format)
            batch = batch.append_column(kn, key)
            batch = batch.append_column(nn, pc.is_null(key))
        return batch

    out = ds.map_batches(add_keys, batch_format="pyarrow")
    if nulls == "skip":
        def drop_nulls(batch: pa.Table) -> pa.Table:
            mask = None
            for nn in null_names:
                m = pc.invert(batch.column(nn))
                mask = m if mask is None else pc.and_(mask, m)
            return batch.filter(mask)
        out = out.map_batches(drop_nulls, batch_format="pyarrow")
        sort_cols, sort_desc = list(key_names), list(descending)
    else:
        # interleave (is_null, key): is_null=True sorts first under
        # descending=True → nulls first; ascending → nulls last
        sort_cols, sort_desc = [], []
        for nn, kn, d in zip(null_names, key_names, descending):
            sort_cols.append(nn)
            sort_desc.append(nulls == "first")
            sort_cols.append(kn)
            sort_desc.append(d)
    out = out.sort(sort_cols, descending=sort_desc)
    return out.drop_columns(key_names + null_names)


def topk(
    ds: rd.Dataset,
    columns: list[str] | str,
    k: int,
    descending: list[bool] | bool = False,
    nulls: str = "last",
) -> rd.Dataset:
    """Top-k rows by sort order WITHOUT a global sort: each block keeps
    its own top k (vectorized ``pc.sort_indices``), then the surviving
    ≤ k·num_blocks rows take a final (tiny) range sort + limit.

    At scale this replaces the all-to-all exchange of a full sort with a
    map-side reduction to k rows per block. Null keys honor ``nulls``
    (first|last) in both passes. Keys should totally order rows: ties
    at the k boundary are chosen arbitrarily (block order before, heap
    order now — neither is a contract)."""
    sch = ds.schema()
    if sch is None:  # fully empty derived dataset: nothing to rank
        return ds
    names = sch.names
    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    columns = [resolve_column(names, c) for c in columns]
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    keys = [(c, "descending" if d else "ascending")
            for c, d in zip(columns, descending)]
    placement = "at_start" if nulls == "first" else "at_end"

    def partial(batch: pa.Table) -> pa.Table:
        # O(n log k) heap select when no null key can reorder (the
        # 14x-cheaper path for big blocks); sort_indices only when a
        # null's placement could differ from select_k's
        if placement == "at_end" and all(
                batch.column(c).null_count == 0 for c, _ in keys):
            idx = pc.select_k_unstable(batch, k=min(k, batch.num_rows),
                                       sort_keys=keys)
            return batch.take(idx)
        idx = pc.sort_indices(batch, sort_keys=keys, null_placement=placement)
        return batch.take(idx.slice(0, min(k, len(idx))))

    part = ds.map_batches(partial, batch_format="pyarrow")
    return sort(part, columns, descending=descending, nulls=nulls).limit(k)


def _topk_group_kernel(df, group_keys, sort_cols, ascending, k, nulls):
    df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort",
                        na_position="first" if nulls == "first" else "last")
    return df.groupby(group_keys, dropna=False, sort=False,
                      observed=True).head(k)


def _topk_group_partition(g: pa.Table, group_keys, sort_cols, ascending,
                          k, nulls, schema_ser: bytes) -> pa.Table:
    from ..shuffle import int_types_mapper, to_arrow_clean

    schema = pa.ipc.read_schema(pa.py_buffer(schema_ser))
    df = g.to_pandas(types_mapper=int_types_mapper).drop(columns="__part")
    out = _topk_group_kernel(df, group_keys, sort_cols, ascending, k, nulls)
    return to_arrow_clean(out.reset_index(drop=True), schema=schema)


def topk_per_group(
    ds: rd.Dataset,
    group_keys: list[str] | str,
    sort_cols: list[str] | str,
    k: int,
    descending: list[bool] | bool = True,
    nulls: str = "last",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Top-k rows per group (the "keep the k best documents per domain"
    training-data shape) — SQL ``row_number() OVER (PARTITION BY keys
    ORDER BY cols) <= k`` — without a global sort.

    Two-level reduction: each BLOCK first pre-reduces to its local
    top-k per group (vectorized sort + groupby-head), so at most
    ``k`` rows per (block, group) enter the exchange; the survivors
    hash-partition on the group keys (coarse ``mod P`` — see
    nailray/shuffle.py) and each partition takes the final top-k per
    group. Deterministic only if ``sort_cols`` totally orders rows
    within a group — include a tie-breaker column. Null group keys form
    one group; null sort values place per ``nulls`` (DuckDB default:
    last)."""
    import functools

    from ..shuffle import (group_map, hash_partition, int_types_mapper,
                           partition_count, to_arrow_clean)

    s = ds.schema()
    schema = s.base_schema if hasattr(s, "base_schema") else s
    names = list(schema.names)
    if isinstance(group_keys, str):
        group_keys = [c.strip() for c in group_keys.split(",") if c.strip()]
    if isinstance(sort_cols, str):
        sort_cols = [c.strip() for c in sort_cols.split(",") if c.strip()]
    group_keys = [resolve_column(names, c) for c in group_keys]
    sort_cols = [resolve_column(names, c) for c in sort_cols]
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    ascending = [not d for d in descending]
    if nulls not in ("first", "last"):
        raise ValueError(f"unknown null handling {nulls!r}: first|last")
    n_parts = partition_count(num_partitions)
    schema_ser = schema.serialize().to_pybytes()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas(types_mapper=int_types_mapper)
        out = _topk_group_kernel(df, group_keys, sort_cols, ascending, k, nulls)
        out = out.reset_index(drop=True)
        t = to_arrow_clean(out, schema=schema)
        part = hash_partition(out[group_keys], group_keys, n_parts)
        return t.append_column("__part", pa.array(part))

    return group_map(
        ds.map_batches(partial, batch_format="pyarrow"), "__part",
        functools.partial(_topk_group_partition, group_keys=group_keys,
                          sort_cols=sort_cols, ascending=ascending, k=k,
                          nulls=nulls, schema_ser=schema_ser),
        n_parts)


def shuffle(ds: rd.Dataset, seed: int | None = None) -> rd.Dataset:
    """Seeded distributed shuffle — replaces the reference's
    full-materialize Fisher-Yates (src/commands/shuffle.rs:33-131)."""
    return ds.random_shuffle(seed=seed)
