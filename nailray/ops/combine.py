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
    num_partitions: int | None = None,
    broadcast: bool = False,
    strategy: str = "partitioned",
) -> rd.Dataset:
    """Equi-join; right columns renamed `r_<name>`, right key dropped
    after the join (src/commands/merge.rs:30-147).

    Three physical strategies:
    - partitioned (default): both sides shuffle by hash(key) mod P
      through one union + groupby; each partition joins with a pandas
      merge (see :func:`_merge_partitioned`);
    - ``strategy="ray"``: `Dataset.join` (Ray's actor-based hash join);
    - ``broadcast=True`` (`ray.put` the collected right side once,
      lookup inside map_batches) — for small dimension tables, no
      shuffle.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unknown join type {how!r}: inner|left|right|full")
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

    if strategy == "partitioned":
        return _merge_partitioned(left, right, lk, rk, how, right_prefix,
                                  num_partitions)

    # rename right columns up-front so the output matches the reference
    rnames = right.schema().names
    right2 = right.rename_columns({c: f"{right_prefix}{c}" for c in rnames if c != rk})
    jt = {"inner": "inner", "left": "left_outer", "right": "right_outer",
          "full": "full_outer"}.get(how, how)
    joined = left.join(
        right2,
        join_type=jt,
        num_partitions=num_partitions or 16,
        on=(lk,),
        right_on=(rk,),
        validate_schemas=True,
    )
    if rk != lk and rk in joined.schema().names:
        joined = joined.drop_columns([rk])
    return joined


def _norm_key_type(t: pa.DataType) -> pa.DataType:
    """Join-key exchange type: both sides must hash and compare
    identically, so integers widen to int64 and floats to float64."""
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    return t


def _join_partition(g: pa.Table, lk: str, how: str, left_cols: list[str],
                    right_cols: list[str], out_schema_ser: bytes):
    """Join one hash partition's rows of both sides with a pandas merge
    and restore the exact output schema. The group arrives as ARROW and
    integer columns convert to nullable pandas ints (see
    :func:`_int_types_mapper`) so null padding never widens them to
    float."""
    import pandas as pd

    out_schema = pa.ipc.read_schema(pa.py_buffer(out_schema_ser))
    from ..shuffle import int_types_mapper

    df = g.to_pandas(types_mapper=int_types_mapper)
    side = df["__side"].to_numpy()
    lf = df.loc[side == 0, left_cols]
    rf = df.loc[side == 1, right_cols]
    # SQL join semantics for null keys: never match (pandas merge would
    # happily match NaN == NaN) — split them out, merge non-null frames,
    # re-append the null-keyed rows for the sides that keep unmatched
    lnull = lf["__lkey"].isna()
    rnull = rf["__rkey"].isna()
    out = lf[~lnull].merge(rf[~rnull], left_on="__lkey", right_on="__rkey",
                           how={"full": "outer"}.get(how, how))
    extra = []
    if how in ("left", "full") and lnull.any():
        extra.append(lf[lnull])
    if how in ("right", "full") and rnull.any():
        extra.append(rf[rnull])
    if extra:
        out = pd.concat([out] + extra, ignore_index=True)
    # rows with no left partner (right/full): the surviving key column
    # is the left-named one — fill it from the right key
    if how in ("right", "full"):
        miss = out[lk].isna() & out["__rkey"].notna()
        if miss.any():
            out.loc[miss, lk] = out.loc[miss, "__rkey"]
    out = out.drop(columns=["__lkey", "__rkey"])
    # replace_schema_metadata: from_pandas attaches a pandas-metadata
    # dict that makes hash(schema) raise downstream (see io._stripped_schema)
    return pa.Table.from_pandas(out, schema=out_schema,
                                preserve_index=False).replace_schema_metadata(None)


def _tagged_union(left, right, lk, rk, right_prefix, num_partitions,
                  lts=None, rts=None, right_schema: pa.Schema | None = None):
    """Shared exchange for the partitioned joins (equi / asof / range):
    both sides tagged with a normalized key scratch column — plus
    normalized timestamp scratch columns when ``lts``/``rts`` are given
    (the temporal joins) — padded with the OTHER side's columns as TYPED
    Arrow nulls (those ship as validity bitmaps, so the exchange payload
    stays ≈ the two tables), unioned, and key-hash partitioned so every
    row of a key lands in one partition.

    Returns ``(tagged_ds, left_names, right_out_names, out_schema_ser,
    n_parts)``; right columns come back ``right_prefix``-ed with the
    right key dropped."""
    import numpy as np
    import pandas as pd

    from ..shuffle import hash_partition, partition_count

    from ..shuffle import arrow_schema_of as schema_of

    with_ts = lts is not None
    n_parts = partition_count(num_partitions)
    # right_schema overrides schema_of(right): Ray 2.49's
    # select_columns(...).schema() reports the stale UNPROJECTED schema
    # when the upstream dataset was already executed (blocks are fine)
    l_schema = schema_of(left)
    r_schema = right_schema if right_schema is not None else schema_of(right)
    left_names = list(l_schema.names)
    right_out_fields = [pa.field(f"{right_prefix}{f.name}", f.type)
                        for f in r_schema if f.name != rk]
    right_out_names = [f.name for f in right_out_fields]
    clash = set(left_names) & set(right_out_names)
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {sorted(clash)}")
    reserved = {"__lkey", "__rkey", "__lts", "__rts", "__side", "__part"}
    bad = reserved & (set(left_names) | set(r_schema.names))
    if bad:
        raise ValueError(f"input columns collide with join scratch columns: {sorted(bad)}")
    key_t = _norm_key_type(l_schema.field(lk).type)
    if with_ts:
        lt, rt_ = l_schema.field(lts).type, r_schema.field(rts).type
        ts_t = pa.timestamp("us") if (pa.types.is_timestamp(lt)
                                      or pa.types.is_timestamp(rt_)) else _norm_key_type(lt)
    out_schema = pa.schema(list(l_schema) + right_out_fields)
    out_schema_ser = out_schema.serialize().to_pybytes()
    scratch = ["__lkey", "__rkey"] + (["__lts", "__rts"] if with_ts else []) \
        + ["__side", "__part"]

    def part_of(keys: pa.Array):
        import pyarrow.compute as pc

        norm = pc.cast(keys, key_t)
        part = hash_partition(pd.DataFrame({"k": norm.to_pandas()}), ["k"], n_parts)
        return pa.array(part), norm

    def tag_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        part, norm = part_of(t.column(lk).combine_chunks())
        arrays = [t.column(c) for c in left_names]
        arrays += [pa.nulls(n, f.type) for f in right_out_fields]
        arrays += [norm, pa.nulls(n, key_t)]
        if with_ts:
            arrays += [pc.cast(t.column(lts), ts_t), pa.nulls(n, ts_t)]
        arrays += [pa.array(np.zeros(n, np.int8)), part]
        return pa.table(arrays, names=left_names + right_out_names + scratch)

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        part, norm = part_of(t.column(rk).combine_chunks())
        arrays = [pa.nulls(n, f.type) for f in l_schema]
        arrays += [t.column(f) for f in r_schema.names if f != rk]
        arrays += [pa.nulls(n, key_t), norm]
        if with_ts:
            arrays += [pa.nulls(n, ts_t), pc.cast(t.column(rts), ts_t)]
        arrays += [pa.array(np.ones(n, np.int8)), part]
        return pa.table(arrays, names=left_names + right_out_names + scratch)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    return tagged, left_names, right_out_names, out_schema_ser, n_parts


def _merge_partitioned(left: rd.Dataset, right: rd.Dataset, lk: str, rk: str,
                       how: str, right_prefix: str,
                       num_partitions: int | None = None) -> rd.Dataset:
    """Partitioned hash join without `Dataset.join`'s actor
    infrastructure: both sides shuffle by ``hash(key) mod P`` through
    ONE union + groupby (:func:`_tagged_union`), and each partition
    joins with a pandas merge. All rows of a key land in one partition,
    so inner/left/right/full all emit each unmatched row exactly once."""
    import functools

    from ..shuffle import group_map

    tagged, left_names, right_out_names, out_schema_ser, n_parts = \
        _tagged_union(left, right, lk, rk, right_prefix, num_partitions)
    return group_map(
        tagged, "__part",
        functools.partial(_join_partition, lk=lk, how=how,
                          left_cols=left_names + ["__lkey"],
                          right_cols=right_out_names + ["__rkey"],
                          out_schema_ser=out_schema_ser),
        n_parts)


def _asof_partition(g: pa.Table, how: str, direction: str,
                    left_cols: list[str], right_cols: list[str],
                    out_schema_ser: bytes) -> pa.Table:
    """As-of-join one hash partition: split sides, sorted pandas
    merge_asof on the normalized (key, ts) scratch columns, restore the
    exact output schema."""
    import pandas as pd

    from ..shuffle import int_types_mapper

    out_schema = pa.ipc.read_schema(pa.py_buffer(out_schema_ser))
    df = g.to_pandas(types_mapper=int_types_mapper)
    side = df["__side"].to_numpy()
    lf = df.loc[side == 0, left_cols + ["__lkey", "__lts"]].copy()
    rf = df.loc[side == 1, right_cols + ["__rkey", "__rts"]].copy()
    # SQL semantics: null keys / null timestamps never match
    lnull = lf["__lkey"].isna() | lf["__lts"].isna()
    rf = rf[rf["__rkey"].notna() & rf["__rts"].notna()].copy()
    lfm = lf[~lnull].copy()
    # merge_asof wants plain by/on dtypes: keys → object (exact ints),
    # nullable-int timestamps → int64 (null rows already split/filtered)
    for f_, kc, tc in ((lfm, "__lkey", "__lts"), (rf, "__rkey", "__rts")):
        f_[kc] = f_[kc].astype(object)
        if str(f_[tc].dtype).startswith(("Int", "UInt")):
            f_[tc] = f_[tc].astype("int64")
    matched = pd.merge_asof(
        lfm.sort_values("__lts", kind="mergesort"),
        rf.sort_values("__rts", kind="mergesort"),
        left_on="__lts", right_on="__rts",
        left_by="__lkey", right_by="__rkey", direction=direction)
    if lnull.any():
        matched = pd.concat([matched, lf[lnull]], ignore_index=True)
    if how == "inner":
        matched = matched[matched["__rts"].notna()]
    elif how != "left":
        raise ValueError(f"unknown asof how {how!r}: left|inner")
    out = matched[left_cols + right_cols]
    return pa.Table.from_pandas(out, schema=out_schema,
                                preserve_index=False).replace_schema_metadata(None)


def merge_asof(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts: str,
    right_key: str | None = None,
    right_ts: str | None = None,
    right_prefix: str = "r_",
    how: str = "left",
    direction: str = "backward",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed as-of join (beyond the reference surface — the
    training-data staple of joining events to the latest snapshot /
    feature row): for each left row, the single right row with the
    latest ``right_ts <= ts`` in the same key (``direction='backward'``;
    ``'forward'`` = earliest ``>=``).

    Partitioned shape: both sides hash-partition on the key through one
    union (typed-null padding, like :func:`merge`); each partition runs
    a sorted pandas ``merge_asof`` — all rows of a key co-locate, so the
    result equals the global as-of join. Right columns come back
    ``r_``-prefixed; the right key is dropped."""
    import functools

    from ..shuffle import group_map

    rk = right_key or key
    rts = right_ts or ts
    if how not in ("left", "inner"):
        raise ValueError(f"unknown asof how {how!r}: left|inner")
    tagged, left_names, right_out_names, out_schema_ser, n_parts = \
        _tagged_union(left, right, key, rk, right_prefix, num_partitions,
                      lts=ts, rts=rts)
    return group_map(
        tagged, "__part",
        functools.partial(_asof_partition, how=how, direction=direction,
                          left_cols=left_names, right_cols=right_out_names,
                          out_schema_ser=out_schema_ser),
        n_parts)


def _range_partition(g: pa.Table, lower: float, upper: float,
                     left_cols: list[str], right_cols: list[str],
                     out_schema_ser: bytes) -> pa.Table:
    """Range-join one hash partition: equi-merge on the normalized key,
    then filter pairs to ``__rts ∈ [__lts + lower, __lts + upper]``."""
    import pandas as pd

    from ..shuffle import int_types_mapper

    out_schema = pa.ipc.read_schema(pa.py_buffer(out_schema_ser))
    df = g.to_pandas(types_mapper=int_types_mapper)
    side = df["__side"].to_numpy()
    lf = df.loc[side == 0, left_cols + ["__lkey", "__lts"]]
    rf = df.loc[side == 1, right_cols + ["__rkey", "__rts"]]
    lf = lf[lf["__lkey"].notna() & lf["__lts"].notna()]
    rf = rf[rf["__rkey"].notna() & rf["__rts"].notna()]
    out = lf.merge(rf, left_on="__lkey", right_on="__rkey")
    delta = (out["__rts"] - out["__lts"])
    if hasattr(delta, "dt"):
        delta = delta.dt.total_seconds()
    out = out[(delta >= lower) & (delta <= upper)]
    out = out[left_cols + right_cols]
    return pa.Table.from_pandas(out, schema=out_schema,
                                preserve_index=False).replace_schema_metadata(None)


def merge_range(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts: str,
    lower: float,
    upper: float,
    right_key: str | None = None,
    right_ts: str | None = None,
    right_prefix: str = "r_",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed range join (beyond the reference surface): emit every
    (left, right) pair with equal keys whose right timestamp falls in
    ``[left.ts + lower, left.ts + upper]`` seconds — SQL
    ``JOIN ... ON a.k = b.k AND b.t BETWEEN a.t + lower AND a.t + upper``.
    Inner semantics; null keys/timestamps never match.

    Partitioned shape identical to :func:`merge_asof` (typed-null padded
    union, one key-hash exchange); each partition equi-merges then
    filters the window predicate. Output size is the true pair count —
    a wide window on a hot key is inherently quadratic; bound the window
    or pre-aggregate when that bites."""
    import functools

    from ..shuffle import group_map

    rk = right_key or key
    rts = right_ts or ts
    tagged, left_names, right_out_names, out_schema_ser, n_parts = \
        _tagged_union(left, right, key, rk, right_prefix, num_partitions,
                      lts=ts, rts=rts)
    return group_map(
        tagged, "__part",
        functools.partial(_range_partition, lower=lower, upper=upper,
                          left_cols=left_names, right_cols=right_out_names,
                          out_schema_ser=out_schema_ser),
        n_parts)


def append(
    base: rd.Dataset, others: list[rd.Dataset], ignore_schema: bool = False
) -> rd.Dataset:
    """Union with strict schema check (names + types in order), or
    name-based alignment filling missing columns with typed nulls when
    ignore_schema=True (src/commands/append.rs:23-131)."""
    from ..shuffle import arrow_schema_of as schema_of

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
        return _semi_partitioned(left, right, lk, rk, num_partitions,
                                 anti=False)
    if strategy != "broadcast":
        raise ValueError(f"unknown semi_join strategy {strategy!r}")

    ref = _ray.put(_key_set(right, rk))

    def fn(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        return batch.filter(pc.is_in(batch.column(lk), value_set=keys))

    return left.map_batches(fn, batch_format="pyarrow")


def _semi_anti_partition(g: pa.Table, *, left_names: list[str],
                         anti: bool) -> pa.Table:
    """Semi/anti one hash partition, Arrow-native: left rows filtered by
    key membership in the partition's right-side key set. Null left keys
    never match (semi drops them, anti keeps them — NOT EXISTS)."""
    import pyarrow.compute as pc

    side = g.column("__side")
    lrows = g.filter(pc.equal(side, 0))
    rkeys = g.filter(pc.equal(side, 1)).column("__rkey").combine_chunks()
    rkeys = rkeys.drop_null().unique() if len(rkeys) else rkeys
    mask = pc.fill_null(pc.is_in(lrows.column("__lkey"), value_set=rkeys),
                        False)
    out = lrows.filter(pc.invert(mask) if anti else mask)
    return out.select(left_names)


def _semi_partitioned(left: rd.Dataset, right: rd.Dataset, lk: str, rk: str,
                      num_partitions: int | None, anti: bool) -> rd.Dataset:
    """Distributed semi/anti join through the shared partitioned-join
    exchange (`_tagged_union` + `group_map`): only the right KEY column
    ships (the right side is projected first), and the per-partition
    kernel is a pyarrow ``is_in`` — no pandas merge, no `Dataset.join`
    actor infrastructure (which costs seconds of fixed startup)."""
    import functools

    from ..shuffle import group_map

    rs = right.schema()
    rbase = rs.base_schema if hasattr(rs, "base_schema") else rs
    tagged, left_names, _ro, _schema, n_parts = _tagged_union(
        left, right.select_columns([rk]), lk, rk, "r_", num_partitions,
        right_schema=pa.schema([rbase.field(rk)]))
    return group_map(
        tagged, "__part",
        functools.partial(_semi_anti_partition, left_names=left_names,
                          anti=anti),
        n_parts)


def anti_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
              right_key: str | None = None, strategy: str = "broadcast",
              num_partitions: int | None = None) -> rd.Dataset:
    """Rows of left whose key does NOT appear in right. NOT EXISTS
    semantics: null left keys never match, so they are kept.

    strategy="broadcast" (default) collects the right key set once;
    strategy="shuffle" is the partitioned scale path for key sets too
    large to broadcast."""
    import ray as _ray
    import pyarrow.compute as pc

    from ..expr import resolve_column

    lk = resolve_column(left.schema().names, left_key)
    rk = resolve_column(right.schema().names, right_key or left_key)
    if strategy == "shuffle":
        return _semi_partitioned(left, right, lk, rk, num_partitions,
                                 anti=True)
    if strategy != "broadcast":
        raise ValueError(f"unknown anti_join strategy {strategy!r}")
    ref = _ray.put(_key_set(right, rk))

    def fn(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        mask = pc.is_in(batch.column(lk), value_set=keys)
        return batch.filter(pc.invert(pc.fill_null(mask, False)))

    return left.map_batches(fn, batch_format="pyarrow")


def bloom_semi_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
                    right_key: str | None = None,
                    bits_per_key: int = 12,
                    expected_keys: int | None = None,
                    verify: str = "shuffle",
                    num_partitions: int = 16) -> rd.Dataset:
    """Semi join for key sets too large to broadcast exactly: the right
    side folds into a Bloom filter (``bits_per_key``/8 bytes per key —
    ~12× smaller than an int64 key set, far smaller than strings),
    which broadcasts ONCE via ``ray.put`` and prefilters the big left
    side in map_batches with no shuffle. Survivors (true matches plus
    ~0.03% false positives at the default sizing) then get an exact
    ``verify`` pass: "shuffle" (distributed hash semi join of only the
    survivors — the 100 TB path), "broadcast" (exact key-set is_in),
    or "none" (keep the FP tail; fastest, approximate).

    Not in the reference (engine extra, like semi/anti): the standard
    scale shape for filtering a fact table by a large dimension key set.
    """
    import numpy as np
    import ray as _ray
    import pyarrow.compute as pc

    from ..expr import resolve_column
    from ..sketch import _bloom_key_hashes, build_bloom

    lk = resolve_column(left.schema().names, left_key)
    rk = resolve_column(right.schema().names, right_key or left_key)
    rs = right.schema()
    rbase = rs.base_schema if hasattr(rs, "base_schema") else rs
    key_type = _norm_key_type(rbase.field(rk).type)

    bf = build_bloom(right, rk, expected_keys=expected_keys,
                     bits_per_key=bits_per_key)
    ref = _ray.put(bf)

    def prefilter(batch: pa.Table) -> pa.Table:
        col = batch.column(lk)
        h = _bloom_key_hashes(col, key_type)
        # null keys dropped from h: rebuild a full-length mask (nulls
        # never match, matching SQL semi-join semantics)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        mask = np.zeros(len(batch), bool)
        mask[valid] = _ray.get(ref).contains_hashes(h)
        return batch.filter(pa.array(mask))

    candidates = left.map_batches(prefilter, batch_format="pyarrow")
    if verify == "none":
        return candidates
    if verify in ("shuffle", "broadcast"):
        return semi_join(candidates, right, lk, rk, strategy=verify,
                         num_partitions=num_partitions)
    raise ValueError(f"unknown verify mode {verify!r}")


def _set_op(a: rd.Dataset, b: rd.Dataset, keep: str,
            num_partitions: int | None = None) -> rd.Dataset:
    """Shared engine for SQL ``INTERSECT`` / ``EXCEPT`` (DISTINCT
    semantics, NULLs compare equal like ``IS NOT DISTINCT FROM``):
    each side pre-dedups per block and ships one (row, side-flag)
    partial, then one ``grouped_agg`` keyed on ALL columns folds
    presence flags — exchange volume is O(distinct rows per block),
    never raw row counts."""
    import pyarrow.compute as pc

    from ..shuffle import grouped_agg

    na = a.schema().names
    nb = b.schema().names
    if na != nb:
        raise ValueError(
            f"set operation requires identical schemas: {na} vs {nb}")
    cols = list(na)

    def tag(flag_a: int, flag_b: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols).combine_chunks() \
                     .group_by(cols, use_threads=False).aggregate([])
            return t.append_column(
                "__in_a", pa.array([flag_a] * t.num_rows, pa.int64())) \
                .append_column(
                "__in_b", pa.array([flag_b] * t.num_rows, pa.int64()))
        return fn

    tagged = a.map_batches(tag(1, 0), batch_format="pyarrow").union(
        b.map_batches(tag(0, 1), batch_format="pyarrow"))
    folded = grouped_agg(tagged, cols,
                         {"__a": ("__in_a", "max"), "__b": ("__in_b", "max")},
                         num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        if "__a" not in batch.column_names:  # empty-input schema quirk
            return batch.select([c for c in batch.column_names
                                 if c in cols])
        ia = pc.equal(batch.column("__a"), 1)
        ib = pc.equal(batch.column("__b"), 1)
        mask = pc.and_(ia, ib) if keep == "both" \
            else pc.and_(ia, pc.invert(ib))
        return batch.filter(mask).select(cols)

    return folded.map_batches(finish, batch_format="pyarrow")


def intersect_distinct(a: rd.Dataset, b: rd.Dataset,
                       num_partitions: int | None = None) -> rd.Dataset:
    """SQL ``INTERSECT``: distinct rows present in BOTH inputs."""
    return _set_op(a, b, "both", num_partitions)


def except_distinct(a: rd.Dataset, b: rd.Dataset,
                    num_partitions: int | None = None) -> rd.Dataset:
    """SQL ``EXCEPT``: distinct rows of ``a`` absent from ``b``."""
    return _set_op(a, b, "a_only", num_partitions)
