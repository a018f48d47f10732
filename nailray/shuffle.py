"""Coarse hash-partitioning helpers for grouped operators.

Ray's ``groupby(keys).map_groups`` spends ~100 µs of per-group
machinery per group; operators whose natural key space is huge (LSH
buckets, (user, time-bucket) pairs, candidate edges) instead group by
``hash(keys) mod P`` — the same all-to-all exchange volume, but only P
Ray groups — and run the per-key logic vectorized (pandas/numpy C
kernels) inside each partition.

Partition count trade-off: P should be ≥ cluster CPUs for parallelism
and small enough that one partition's rows fit a worker's heap. The
default 2×CPUs is right for the common case; callers expose a
``num_partitions`` override for skewed or very large key spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_SCHEMA_PEEK_ROWS = 16
_schema_cache: "weakref.WeakKeyDictionary" = None  # initialized below


def arrow_schema_of(ds) -> "pa.Schema":
    """``ds.schema()`` normalized to a REAL ``pyarrow.Schema``.

    Ray 2.49 returns a ``PandasBlockSchema`` namedtuple for
    pandas-block datasets (e.g. ``from_pandas``); iterating that yields
    its (names, types) tuple elements, not fields — code doing
    ``for f in schema`` silently breaks. Unambiguous numpy dtypes
    convert via ``pa.from_numpy_dtype``; for ambiguous object columns
    (strings? lists? structs?) the first ``_SCHEMA_PEEK_ROWS`` rows are
    peeked and Arrow-inferred — guessing string would silently mistype
    list/struct columns and crash the join exchange downstream. The
    peek is a hidden partial pipeline execution, so the normalized
    schema is CACHED per dataset (weakly — repeated merges/appends over
    the same pandas-block dataset pay it once); a column heterogeneous
    beyond the peeked prefix (row 1 string, row 100 list) can still be
    mistyped. Empty datasets fall back to string (nothing to peek,
    nothing to mistype)."""
    global _schema_cache
    if _schema_cache is None:
        import weakref

        _schema_cache = weakref.WeakKeyDictionary()
    try:
        cached = _schema_cache.get(ds)
    except TypeError:  # non-weakref-able dataset subclass
        cached = None
    if cached is not None:
        return cached
    s = ds.schema()
    s = s.base_schema if hasattr(s, "base_schema") else s
    if isinstance(s, pa.Schema):
        return s
    fields = []
    ambiguous: list[int] = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
            continue
        try:
            fields.append(pa.field(n, pa.from_numpy_dtype(t)))
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            ambiguous.append(len(fields))
            fields.append(pa.field(n, pa.string()))
    if ambiguous:
        try:
            head = ds.limit(_SCHEMA_PEEK_ROWS).to_pandas()
            if len(head):
                inferred = pa.Table.from_pandas(
                    head, preserve_index=False).schema
                for i in ambiguous:
                    t = inferred.field(fields[i].name).type
                    # all-None in the peeked rows infers null — keep
                    # the string fallback rather than poisoning casts
                    if not pa.types.is_null(t):
                        fields[i] = pa.field(fields[i].name, t)
        except Exception:  # keep the string fallback, but say so
            import logging

            logging.getLogger(__name__).warning(
                "arrow_schema_of: head peek failed; object columns "
                "fall back to string", exc_info=True)
    out = pa.schema(fields)
    try:
        _schema_cache[ds] = out
    except TypeError:
        pass
    return out


def fold_scalar_sum(ds, col: str) -> int:
    """Distributed integer-sum fold: each block collapses to ONE scalar
    before crossing to the driver (pulling a full table through
    iter_batches serializes; measured -8 s on the bench corpus's
    distinct-token table). Missing-column blocks contribute 0."""
    import pyarrow.compute as pc

    total = 0
    folded = ds.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(pc.sum(t.column(col)).as_py() or 0)
             if col in t.column_names else 0], pa.int64())}),
        batch_format="pyarrow")
    for b in folded.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b.column("s")).as_py() or 0)
    return total


def actor_pool_size(concurrency=None) -> tuple[int, int]:
    """Default actor-pool bounds for stateful map_batches stages:
    (1, cluster CPUs) — a fixed small cap leaves most of a wide node
    idle; Ray only spawns actors while there are pending blocks, so the
    upper bound costs nothing on small inputs."""
    if concurrency is not None:
        return concurrency
    try:
        import ray

        # leave headroom below total CPUs: a pool that can reserve every
        # CPU starves an unfinished upstream stage (observed Ray 2.49
        # deadlock mode with full-width pools)
        return (1, max(8, int(ray.cluster_resources().get("CPU", 8)) - 4))
    except Exception:
        return (1, 8)


def partition_count(num_partitions: int | None = None) -> int:
    if num_partitions:
        return num_partitions
    try:
        import ray

        return max(32, int(ray.cluster_resources().get("CPU", 16)) * 2)
    except Exception:
        return 32


def task_concurrency(concurrency):
    """Translate an actor-pool concurrency spec to the task-stage form:
    a ``(min, max)`` tuple (the form these functions accepted when they
    ran actor pools) caps concurrent tasks at ``max``; ints and None
    pass through. Keeps the public ``concurrency=`` argument backward
    compatible across the pool→task conversion."""
    if isinstance(concurrency, tuple):
        return concurrency[1]
    return concurrency


def default_exchange() -> str:
    """THE auto policy for grouped-exchange strategy, shared by
    :func:`group_map` and :func:`nailray.encode.pipeline.encode_dataset`
    (one definition so a policy change — e.g. counting only alive
    nodes — can't miss a site): ``"direct"`` raw-task routing on a
    single-node cluster, Ray's ``"sort"`` streaming shuffle otherwise
    (driver metadata O(P), spills under pressure — the multi-node /
    100 TB path)."""
    try:
        import ray

        return "direct" if len(ray.nodes()) <= 1 else "sort"
    except Exception:
        return "sort"


def hash_partition(df: pd.DataFrame, cols: list[str], n_parts: int) -> np.ndarray:
    """Deterministic per-row partition ids from the given key columns
    (stable across processes/runs — pandas' fixed-key sip hash, unlike
    builtin ``hash`` on strings).

    Numeric/bool columns are canonicalized to float64 BEFORE hashing:
    ``hash_pandas_object`` hashes the physical dtype, and arrow→pandas
    conversion widens int-with-null blocks to float64 while null-free
    blocks stay int64 — without canonicalization the same key value
    would land in different partitions depending on which BLOCK it
    arrived in. (Distinct ints beyond 2^53 may share a float image and
    thus a partition — harmless co-location, never a missed match.)"""
    parts = {}
    for c in cols:
        s = df[c]
        if pd.api.types.is_numeric_dtype(s) or pd.api.types.is_bool_dtype(s):
            s = s.astype("float64")
        parts[c] = s
    h = pd.util.hash_pandas_object(pd.DataFrame(parts), index=False).to_numpy()
    return (h.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)


def _route_block_impl(block, part_col: str, n_parts: int):
    """Split one block into per-partition slices (one stable sort +
    searchsorted — no per-partition filter passes). Returns n_parts
    slices (None when empty) plus the per-partition row counts."""
    import pyarrow as pa

    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if block.num_rows == 0:
        # Ray skips map_batches UDFs on empty blocks, so an empty block
        # may not even carry the part column — nothing to route either way
        return [None] * n_parts + [np.zeros(n_parts, np.int64)]
    pv = np.asarray(block.column(part_col).combine_chunks())
    order = np.argsort(pv, kind="stable")
    st = block.take(pa.array(order))
    spv = pv[order]
    bounds = np.searchsorted(spv, np.arange(n_parts + 1))
    out = [st.slice(b, e - b) if e > b else None
           for b, e in zip(bounds[:-1], bounds[1:])]
    out.append((bounds[1:] - bounds[:-1]).astype(np.int64))
    return out


def _apply_group_impl(ctx, *slices):
    import pyarrow as pa

    fn, batch_format = ctx
    ts = [s for s in slices if s is not None and s.num_rows]
    t = pa.concat_tables(ts, promote_options="default")
    if batch_format == "pandas":
        out = fn(t.to_pandas())
    else:
        out = fn(t)
    if isinstance(out, pd.DataFrame):
        return to_arrow_clean(out)
    return out.replace_schema_metadata(None)


def group_map(ds, part_col: str, fn, n_parts: int,
              batch_format: str = "pyarrow", exchange: str | None = None):
    """Apply ``fn`` once to ALL rows of each coarse partition.

    Two physical exchanges:

    - ``"direct"`` — raw-task routing (the encode pipeline's measured
      2.7× win over Dataset groupby, encode/pipeline.py:525): one route
      task per upstream block emits per-partition slices; one apply
      task per partition concatenates its slices and runs ``fn``. No
      sort barrier, no block rewrite — but the driver holds O(blocks ×
      P) object refs and the result materializes, so it is the
      SINGLE-NODE / moderate-block-count path.
    - ``"sort"`` — ``Dataset.groupby(part_col).map_groups``: Ray's
      streaming sort shuffle (driver metadata O(P), spills under
      pressure) — the multi-node / 100 TB path.

    Default policy (``exchange=None``): direct on a single-node
    cluster, sort otherwise."""
    import ray
    import ray.data as rd

    if exchange is None:
        exchange = default_exchange()

    if exchange == "sort":
        return ds.groupby(part_col).map_groups(
            lambda g: _apply_group_impl((fn, batch_format), g),
            batch_format="pyarrow")
    if exchange != "direct":
        raise ValueError(f"unknown exchange {exchange!r}: direct|sort")

    route = ray.remote(num_cpus=1)(_route_block_impl)
    apply_r = ray.remote(num_cpus=1)(_apply_group_impl)
    refs: list[list] = [[] for _ in range(n_parts)]
    count_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            *slices, counts = route.options(
                num_returns=n_parts + 1).remote(bref, part_col, n_parts)
            for p, r in enumerate(slices):
                refs[p].append(r)
            count_refs.append(counts)
    totals = (np.sum(ray.get(count_refs), axis=0)
              if count_refs else np.zeros(n_parts, np.int64))
    ctx_ref = ray.put((fn, batch_format))
    out_refs = [apply_r.remote(ctx_ref, *refs[p])
                for p in range(n_parts) if totals[p] > 0]
    if not out_refs:
        # every upstream block was empty: an empty result with the
        # upstream schema (matches what groupby().map_groups returns
        # when no group ever materializes — fn never runs)
        return ds.limit(0)
    return rd.from_arrow_refs(out_refs)


# partial op applied per block / combine op applied per partition
_AGG_OPS = {"sum": ("sum", "sum"), "count": ("count", "sum"),
            "size": ("size", "sum"), "min": ("min", "min"),
            "max": ("max", "max")}


def grouped_agg(ds, keys: list[str],
                aggs: dict[str, tuple[str, str]],
                num_partitions: int | None = None,
                exchange: str | None = None):
    """Distributed groupby-aggregate for LARGE key spaces.

    ``aggs`` maps output column → (input column, fn) with fn one of
    sum | count (non-null) | size (rows) | min | max — all combinable,
    so each block pre-aggregates to one row per (block, group) before
    anything moves, then a coarse hash partition on the keys combines
    partials vectorized. The exchange volume is O(groups-per-block) and
    the Ray group count is P — unlike ``Dataset.groupby(keys).aggregate``,
    whose sort-based exchange degrades with the distinct-key count
    (key × hour spaces, content hashes, ...)."""
    import pyarrow as pa

    n_parts = partition_count(num_partitions)
    bad = {f for _, f in aggs.values()} - set(_AGG_OPS)
    if bad:
        raise ValueError(f"unsupported agg fns {sorted(bad)}: {sorted(_AGG_OPS)}")

    def _agg_out_type(in_type, fn):
        if fn in ("size", "count"):
            return pa.int64()
        if fn in ("min", "max"):
            return in_type
        # sum: pandas widens to the platform accumulator
        if pa.types.is_integer(in_type) or pa.types.is_boolean(in_type):
            return pa.int64()
        if pa.types.is_floating(in_type):
            return pa.float64()
        return None  # let from_pandas infer (decimal, duration, ...)

    def _typed(df, types: dict) -> pa.Table:
        """pandas→arrow with per-column target types. A partition whose
        key (or min/max input) is ALL null degrades to float64 NaN in
        pandas — inferring would emit an incompatible schema AND hash
        null keys differently from other blocks."""
        arrays = [pa.Array.from_pandas(df[c], type=types.get(c))
                  for c in df.columns]
        return pa.table(arrays, names=list(df.columns))

    def partial(batch: pa.Table) -> pa.Table:
        types = {k: batch.schema.field(k).type for k in keys}
        for o, (c, f) in aggs.items():
            types[o] = _agg_out_type(batch.schema.field(c).type, f)
        df = batch.to_pandas(types_mapper=int_types_mapper)
        gb = df.groupby(keys, dropna=False, sort=False, observed=True)
        out = gb.agg(**{o: (c, _AGG_OPS[f][0]) for o, (c, f) in aggs.items()})
        t = _typed(out.reset_index(), types)
        part = hash_partition(t.select(keys).to_pandas(), keys, n_parts)
        return t.append_column("__part", pa.array(part))

    def combine(g: pa.Table) -> pa.Table:
        types = {f.name: f.type for f in g.schema if f.name != "__part"}
        df = g.to_pandas(types_mapper=int_types_mapper)
        gb = df.groupby(keys, dropna=False, sort=False, observed=True)
        out = gb.agg(**{o: (o, _AGG_OPS[f][1]) for o, (_, f) in aggs.items()})
        return _typed(out.reset_index(), types)

    return group_map(ds.map_batches(partial, batch_format="pyarrow"),
                     "__part", combine, n_parts, exchange=exchange)


def to_arrow_clean(df: pd.DataFrame, schema=None):
    """pandas→arrow for partition-kernel returns. Casts to ``schema``
    when given (restoring the exact input types after a nullable-int
    round-trip) and strips the pandas metadata blob — leaving it on
    makes a later ``to_pandas`` reconstruct nullable Int64 dtypes in
    user-facing outputs and re-triggers Ray's schema-hash warnings."""
    import pyarrow as pa

    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    return t.replace_schema_metadata(None)


_PANDAS_NULLABLE = None


def int_types_mapper(t):
    """arrow→pandas ``types_mapper`` keeping integer/bool columns as
    NULLABLE pandas dtypes: the default conversion widens int-with-null
    blocks to float64, silently rounding ids beyond 2^53 — a correctness
    bug for keys and payload columns alike. Use with ``to_pandas`` in any
    partition-grouped kernel that must round-trip integers exactly."""
    global _PANDAS_NULLABLE
    import pyarrow as pa

    if _PANDAS_NULLABLE is None:
        _PANDAS_NULLABLE = {
            pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
            pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
            pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
            pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
            pa.bool_(): pd.BooleanDtype(),
        }
    return _PANDAS_NULLABLE.get(t)
