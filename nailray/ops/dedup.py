"""dedup row-wise / col-wise (SURVEY §2.7: src/commands/dedup.rs)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

from ..expr import resolve_column
from ..io import ROW_ID


def _dedup_partition(g, keys: list[str], order_column: str, keep: str):
    """Keep the first/last row by order within each key combo of one
    hash partition — one vectorized sort + drop_duplicates (NaN keys
    compare equal, matching the groupby path). Arrow group + nullable-int
    conversion keeps int keys beyond 2^53 exact (float widening would
    make distinct ids compare equal)."""
    from ..shuffle import int_types_mapper, to_arrow_clean

    out_schema = pa.schema([f for f in g.schema if f.name != "__part"])
    df = g.to_pandas(types_mapper=int_types_mapper)
    df = df.sort_values(order_column, kind="mergesort")
    df = df.drop_duplicates(subset=keys, keep=keep).drop(columns="__part")
    return to_arrow_clean(df, out_schema)


def dedup_rows(
    ds: rd.Dataset,
    columns: list[str] | None = None,
    keep: str = "first",
    order_column: str = ROW_ID,
    winner_strategy: str = "broadcast",
) -> rd.Dataset:
    """Exact dedup on selected (default all) columns; keep first/last by
    original order (reference: ROW_NUMBER OVER (PARTITION BY keys ORDER
    BY rn), src/commands/dedup.rs:67-136).

    Ray shape: hash groupby on the keys → per-group min/max of the order
    column. Needs ingest row_id (or any explicit order column).

    ``winner_strategy="shuffle"`` switches to hash-partitioning the FULL
    rows by key and deduping vectorized inside each partition — one
    all-to-all of the rows, no driver-collected winner table; use when
    the distinct-key count is too large to broadcast."""
    names = ds.schema().names
    keys = [resolve_column(names, c) for c in (columns or names) if c != order_column]
    if not keys:
        return ds  # reference: empty column spec → no-op

    if winner_strategy == "shuffle":
        import functools

        from ..shuffle import (group_map, hash_partition, int_types_mapper,
                               partition_count)

        n_parts = partition_count(None)

        def add_part(batch: pa.Table) -> pa.Table:
            # hash only the KEY columns through pandas (nullable ints stay
            # exact); full rows stay Arrow — a pandas block would widen
            # int-with-null columns to float64, breaking both the block
            # schema and >2^53 key exactness
            kdf = batch.select(keys).to_pandas(types_mapper=int_types_mapper)
            return batch.append_column(
                "__part", pa.array(hash_partition(kdf, keys, n_parts)))

        return group_map(
            ds.map_batches(add_part, batch_format="pyarrow"), "__part",
            functools.partial(_dedup_partition, keys=keys,
                              order_column=order_column, keep=keep),
            n_parts)
    if winner_strategy != "broadcast":
        raise ValueError(f"unknown winner_strategy {winner_strategy!r}")

    # Scale shape: shuffle only (keys..., order_column) — a projection —
    # through the groupby; pick the winning order value per key combo
    # with a pre-combined Min/Max aggregate, then broadcast the winner
    # TABLE and filter rows with an exact per-batch merge on the keys
    # (full rows never enter a shuffle). The merge — not a bare order-
    # value semi join — keeps correctness when order values repeat
    # across groups; pandas merge matches null keys like the groupby.
    import ray as _ray

    from ..shuffle import grouped_agg, int_types_mapper

    winners = grouped_agg(
        ds.select_columns(keys + [order_column]), keys,
        {"__keep_id": (order_column, "min" if keep == "first" else "max")})
    wdf = pa.concat_tables(
        [b for b in winners.iter_batches(batch_format="pyarrow")],
        promote_options="default").to_pandas(types_mapper=int_types_mapper)
    ref = _ray.put(wdf)

    def keep_winners(batch: pa.Table) -> pa.Table:
        # pandas only for the KEY columns (nullable ints stay exact, NA
        # keys match like the groupby); full rows filter zero-copy Arrow
        w = _ray.get(ref)
        df = batch.select(keys + [order_column]).to_pandas(
            types_mapper=int_types_mapper)
        m = df.merge(w, on=keys, how="left")
        mask = (m["__keep_id"].reset_index(drop=True)
                .eq(df[order_column].reset_index(drop=True))
                .fillna(False).to_numpy(bool))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def dedup_columns(ds: rd.Dataset, keep: str = "first") -> rd.Dataset:
    """Drop columns with identical content (src/commands/dedup.rs:138-281).

    Reference collects everything and compares O(cols²·rows); here each
    column gets a streaming content hash (one pass), equal-hash columns
    are dropped. Duplicate column *names* are impossible in Arrow-land;
    the reference errors on them (dedup.rs:155-161)."""
    names = ds.schema().names

    def col_hashes(batch: pa.Table) -> pa.Table:
        # canonical bytes per column via Arrow IPC of the offset-0
        # combined chunk — no Python materialization of the values.
        # (A spurious buffer-layout difference can only SPLIT equal
        # columns — never merges unequal ones — so drops stay safe.)
        out = {}
        for c in names:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, pa.schema([("c", col.type)])) as w:
                w.write_table(pa.table({"c": col}))
            h = hashlib.sha256(sink.getvalue())
            out[c] = [h.hexdigest()]
        return pa.table(out)

    # combine per-batch hashes into a whole-column fingerprint
    partials = ds.map_batches(col_hashes, batch_format="pyarrow").take_all()
    agg: dict[str, hashlib._hashlib.HASH] = {c: hashlib.sha256() for c in names}
    for row in partials:
        for c in names:
            agg[c].update(row[c].encode())
    fingerprint = {c: agg[c].hexdigest() for c in names}

    seen: dict[str, str] = {}
    drop: list[str] = []
    order = names if keep == "first" else list(reversed(names))
    for c in order:
        f = fingerprint[c]
        if f in seen:
            drop.append(c)
        else:
            seen[f] = c
    if not drop:
        return ds
    return ds.drop_columns(drop)
