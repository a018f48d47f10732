"""merge (two-table equi-join) and append (schema-checked union)
(SURVEY §2.4/§2.7: src/commands/merge.rs, append.rs)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..expr import resolve_column


def merge(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    right_prefix: str = "r_",
    num_partitions: int = 16,
    broadcast: bool = False,
) -> rd.Dataset:
    """Equi-join; right columns renamed `r_<name>`, right key dropped
    after the join (src/commands/merge.rs:30-147).

    Two physical strategies:
    - hash join (`Dataset.join`, shuffle both sides) — the default;
    - broadcast (`ray.put` the collected right side once, lookup inside
      map_batches) — for small dimension tables, no shuffle.
    """
    lk = resolve_column(left.schema().names, left_key)
    rk = resolve_column(right.schema().names, right_key or left_key)

    if broadcast:
        if how not in ("inner", "left"):
            # per-batch pandas would re-emit unmatched right rows once per
            # block for right/full joins — route those to the shuffle join
            raise ValueError(
                f"broadcast merge supports how='inner'|'left', not {how!r}; "
                "use broadcast=False for right/full joins")
        import ray as _ray
        import pandas as pd

        rt = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in right.iter_batches(batch_format="pyarrow")],
            promote_options="default",
        ).to_pandas()
        rt = rt.rename(columns={c: f"{right_prefix}{c}" for c in rt.columns if c != rk})
        ref = _ray.put(rt)

        def join_batch(batch: "pd.DataFrame") -> "pd.DataFrame":
            small = _ray.get(ref)
            out = batch.merge(small, left_on=lk, right_on=rk,
                              how="inner" if how == "inner" else how)
            if rk != lk and rk in out.columns:
                out = out.drop(columns=[rk])
            return out

        return left.map_batches(join_batch, batch_format="pandas")

    # rename right columns up-front so the output matches the reference
    rnames = right.schema().names
    right2 = right.rename_columns({c: f"{right_prefix}{c}" for c in rnames if c != rk})
    jt = {"inner": "inner", "left": "left_outer", "right": "right_outer",
          "full": "full_outer"}.get(how, how)
    joined = left.join(
        right2,
        join_type=jt,
        num_partitions=num_partitions,
        on=(lk,),
        right_on=(rk,),
        validate_schemas=True,
    )
    if rk != lk and rk in joined.schema().names:
        joined = joined.drop_columns([rk])
    return joined


def append(
    base: rd.Dataset, others: list[rd.Dataset], ignore_schema: bool = False
) -> rd.Dataset:
    """Union with strict schema check (names + types in order), or
    name-based alignment filling missing columns with typed nulls when
    ignore_schema=True (src/commands/append.rs:23-131)."""
    def schema_of(ds):
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    base_schema = schema_of(base)
    aligned = [base]
    for o in others:
        so = schema_of(o)
        if not ignore_schema:
            if [f.name for f in so] != [f.name for f in base_schema] or \
               [f.type for f in so] != [f.type for f in base_schema]:
                raise ValueError(
                    f"schema mismatch: {so} vs {base_schema} (use ignore_schema)"
                )
            aligned.append(o)
        else:
            lowered = {f.name.lower(): f.name for f in so}

            def align(batch: pa.Table, lowered=dict(lowered)) -> pa.Table:
                cols = []
                for f in base_schema:
                    src = lowered.get(f.name.lower())
                    if src is not None and src in batch.column_names:
                        cols.append(batch.column(src).cast(f.type))
                    else:
                        cols.append(pa.nulls(batch.num_rows, f.type))
                return pa.table(dict(zip([f.name for f in base_schema], cols)))

            aligned.append(o.map_batches(align, batch_format="pyarrow"))
    out = aligned[0]
    for o in aligned[1:]:
        out = out.union(o)
    return out


def _key_set(ds: rd.Dataset, key: str) -> pa.Array:
    """Distinct key values of the (small) right side, collected once for
    broadcast — the semi/anti pattern from the Ray guide: ship the key
    set (or a Bloom filter of it at larger scale), filter in map_batches,
    no shuffle.

    Vectorized: per-batch ``pc.unique`` partials concatenated and
    uniqued once — no per-value Python set churn (the winner set of an
    exact dedup can be millions of ids)."""
    import pyarrow.compute as pc

    partials = []
    small = ds.select_columns([key])
    for b in small.iter_batches(batch_format="pyarrow"):
        partials.append(pc.unique(b.column(key).combine_chunks()))
    if not partials:
        return pa.array([])
    merged = pc.unique(pa.concat_arrays(partials))
    return merged.drop_null()


def semi_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
              right_key: str | None = None,
              strategy: str = "broadcast", num_partitions: int = 16) -> rd.Dataset:
    """Rows of left whose key appears in right.

    Not present in the reference (SURVEY §2.4: 'no semi/anti joins') —
    an engine extra for pipeline filtering against allowlists.

    strategy="broadcast" (default): collect the right side's distinct
    keys once, ``ray.put``, filter in map_batches — no shuffle; right
    side must fit in driver/worker heap. strategy="shuffle": distributed
    hash join against the distinct-key table — the scale path when the
    key set itself is too large to broadcast (e.g. the winner set of an
    exact dedup over a mostly-unique corpus)."""
    import ray as _ray
    import pyarrow.compute as pc

    from ..expr import resolve_column

    lk = resolve_column(left.schema().names, left_key)
    rk = resolve_column(right.schema().names, right_key or left_key)

    if strategy == "shuffle":
        keys = right.select_columns([rk]).groupby(rk).count()

        def strip(batch: pa.Table) -> pa.Table:
            out = pa.table({"__semi_key": batch.column(rk)})
            return out

        keys = keys.map_batches(strip, batch_format="pyarrow")
        joined = left.join(keys, join_type="inner", num_partitions=num_partitions,
                           on=(lk,), right_on=("__semi_key",))
        if "__semi_key" in joined.schema().names:
            joined = joined.drop_columns(["__semi_key"])
        return joined
    if strategy != "broadcast":
        raise ValueError(f"unknown semi_join strategy {strategy!r}")

    ref = _ray.put(_key_set(right, rk))

    def fn(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        return batch.filter(pc.is_in(batch.column(lk), value_set=keys))

    return left.map_batches(fn, batch_format="pyarrow")


def anti_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
              right_key: str | None = None) -> rd.Dataset:
    """Rows of left whose key does NOT appear in right (broadcast)."""
    import ray as _ray
    import pyarrow.compute as pc

    from ..expr import resolve_column

    lk = resolve_column(left.schema().names, left_key)
    rk = resolve_column(right.schema().names, right_key or left_key)
    ref = _ray.put(_key_set(right, rk))

    def fn(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        mask = pc.is_in(batch.column(lk), value_set=keys)
        return batch.filter(pc.invert(pc.fill_null(mask, False)))

    return left.map_batches(fn, batch_format="pyarrow")
