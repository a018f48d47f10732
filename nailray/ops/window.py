"""Windowed aggregates over event streams (tumbling / sliding / session).

Ray Data is a batch engine with no event-time watermarks (SURVEY §2.9);
stream-shaped work is expressed as: partition by key, sort by timestamp
within the group, window with vectorized pandas inside
``groupby(key).map_groups`` (ordering assumption: one group holds all of
a key's events — guaranteed by the hash groupby).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def tumbling(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
             width: str = "hour") -> rd.Dataset:
    """Fixed windows = floor the timestamp, then a pre-combined
    distributed aggregate: the (key × window) space grows with the time
    range, so per-block partials + a coarse-partition combine
    (:func:`nailray.shuffle.grouped_agg`) replace a sort-based groupby
    over the full key space."""
    from ..shuffle import grouped_agg

    def win(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "window_start": pc.floor_temporal(batch.column(ts_col), unit=width),
            value_col: batch.column(value_col),
        })

    return grouped_agg(
        ds.map_batches(win, batch_format="pyarrow"),
        [key, "window_start"],
        {"n": (value_col, "size"), "sum_value": (value_col, "sum")})


def sliding(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
            width_s: float, slide_s: float) -> rd.Dataset:
    """Sliding windows: each event lands in width/slide windows → explode
    to (key, window_start) rows inside map_batches, then groupby."""
    k = int(np.ceil(width_s / slide_s))

    def explode(batch: pa.Table) -> pa.Table:
        # Normalize to microseconds first so ns/ms/s-unit timestamp columns
        # all land on the same epoch-second scale.
        ts_us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        ts = np.asarray(ts_us) / 1e6  # epoch sec (float)
        keys = batch.column(key).combine_chunks() \
            if isinstance(batch.column(key), pa.ChunkedArray) else batch.column(key)
        vals = pc.cast(batch.column(value_col), pa.float64())
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        out_k, out_w, out_v = [], [], []
        base = (np.floor(ts / slide_s)).astype(np.int64)
        for j in range(k):
            # candidate slide-aligned window starts: (base-j)*slide, j in [0, k).
            # Containment [start, start+width) must be checked explicitly: when
            # width is not a multiple of slide, the earliest candidate windows
            # end before the event. start <= ts always holds by construction.
            start = (base - j) * float(slide_s)
            mask = ts < start + width_s
            if mask.all():
                out_k.append(keys)
                out_w.append(pa.array(start, type=pa.float64()))
                out_v.append(vals)
            else:
                idx = np.flatnonzero(mask)
                out_k.append(keys.take(pa.array(idx)))
                out_w.append(pa.array(start[idx], type=pa.float64()))
                out_v.append(vals.take(pa.array(idx)))
        return pa.table({
            key: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_k]),
            "window_start_s": pa.concat_arrays(out_w),
            value_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_v]),
        })

    from ..shuffle import grouped_agg

    return grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        [key, "window_start_s"],
        {"n": (value_col, "size"), "sum_value": (value_col, "sum")})


def _pin_key_type(t: pa.Table, key: str, key_t: pa.DataType) -> pa.Table:
    """Restore the key column's input Arrow type: a partition whose keys
    are ALL null degrades to a null-typed (or float64) column in pandas,
    emitting blocks with divergent schemas."""
    if t.schema.field(key).type != key_t:
        i = t.column_names.index(key)
        col = t.column(key).combine_chunks().to_pandas()
        t = t.set_column(i, key, pa.Array.from_pandas(col, type=key_t))
    return t


def _key_changed(cur: pd.Series, prev: pd.Series) -> pd.Series:
    """Row-wise 'key differs from previous row' that treats null == null
    (matching groupby semantics: null keys form ONE group, not one group
    per row — a bare ne() flags every consecutive null pair as a
    change)."""
    same = cur.eq(prev) | (cur.isna() & prev.isna())
    return ~same.fillna(False).astype(bool)


def _sessionize_partition(g: pa.Table, key: str, ts_col: str,
                          value_col: str, gap_s: float,
                          n_parts: int) -> pa.Table:
    """Phase 1: sessionize every (key, bucket) group inside one hash
    partition in ONE vectorized pass — sort by (key, bucket, ts), flag
    session starts where the key/bucket changes or the gap exceeds
    gap_s, cumsum the flags into session ids. The group arrives as
    Arrow; integers convert to nullable pandas ints (exact beyond 2^53,
    no float widening from null keys)."""
    from ..shuffle import hash_partition, int_types_mapper, to_arrow_clean

    key_t = g.schema.field(key).type
    g = g.to_pandas(types_mapper=int_types_mapper)
    g = g.sort_values([key, "__bucket", ts_col], kind="mergesort")
    ts = g[ts_col]
    gap = ts.diff().dt.total_seconds()
    boundary = (_key_changed(g[key], g[key].shift())
                | g["__bucket"].ne(g["__bucket"].shift()))
    sid = (boundary | (gap > gap_s)).cumsum()
    out = g.groupby(sid).agg(
        __key=(key, "first"),
        session_start=(ts_col, "min"),
        session_end=(ts_col, "max"),
        n=(ts_col, "count"),
        sum_value=(value_col, "sum"),
    ).reset_index(drop=True).rename(columns={"__key": key})
    out["__part2"] = hash_partition(out, [key], n_parts)
    t = to_arrow_clean(out)
    return _pin_key_type(t, key, key_t)


def _merge_sessions_partition(g: pa.Table, key: str,
                              gap_s: float) -> pa.Table:
    """Phase 2: merge adjacent bucket-boundary sessions per key, again
    one vectorized pass over the whole partition's session summaries.
    Within a key, sorted session starts have nondecreasing ends (bucket
    time-ranges are disjoint), so the previous ROW's end is the running
    max and the pairwise gap test equals single-pass sessionization."""
    from ..shuffle import int_types_mapper, to_arrow_clean

    key_t = g.schema.field(key).type
    g = g.to_pandas(types_mapper=int_types_mapper)
    g = g.sort_values([key, "session_start"], kind="mergesort")
    gap = (g["session_start"] - g["session_end"].shift()).dt.total_seconds()
    mid = (_key_changed(g[key], g[key].shift()) | (gap > gap_s)).cumsum()
    out = g.groupby(mid).agg(
        __key=(key, "first"),
        session_start=("session_start", "min"),
        n=("n", "sum"),
        sum_value=("sum_value", "sum"),
    ).reset_index(drop=True).rename(columns={"__key": key})
    t = to_arrow_clean(out[[key, "session_start", "n", "sum_value"]])
    return _pin_key_type(t, key, key_t)


def session(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
            gap_s: float, bucket_s: float | None = None,
            num_partitions: int | None = None) -> rd.Dataset:
    """Session windows: per key, a new session starts where the gap to
    the previous event exceeds ``gap_s``. Output one row per session:
    key, session_start, n, sum_value.

    Scalable two-phase shape (a hot key no longer serializes its whole
    event stream through one task): phase 1 sessionizes each
    (key, coarse-time-bucket) group independently; phase 2 merges
    adjacent sessions per key over session SUMMARIES (≪ events) —
    within a bucket adjacent sessions are > gap_s apart by
    construction, so only bucket-boundary sessions ever merge, and the
    result is exactly the single-pass sessionization.

    Both phases shuffle by ``hash(group keys) mod P`` and run the
    per-key logic vectorized inside each partition (see
    ``nailray.shuffle``) — per-Ray-group overhead is O(P), not
    O(keys × buckets)."""
    import functools

    from ..shuffle import hash_partition, partition_count

    if bucket_s is None:
        bucket_s = gap_s * 1000  # summaries stay tiny; hot keys split well
    n_parts = partition_count(num_partitions)

    def bucketize(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        b = np.asarray(ts_us) // int(bucket_s * 1e6)
        batch = batch.append_column("__bucket", pa.array(b))
        kb = batch.select([key, "__bucket"]).to_pandas()
        return batch.append_column(
            "__part", pa.array(hash_partition(kb, [key, "__bucket"], n_parts)))

    from ..shuffle import group_map

    partial = group_map(
        ds.map_batches(bucketize, batch_format="pyarrow"), "__part",
        functools.partial(_sessionize_partition, key=key, ts_col=ts_col,
                          value_col=value_col, gap_s=gap_s, n_parts=n_parts),
        n_parts)

    return group_map(
        partial, "__part2",
        functools.partial(_merge_sessions_partition, key=key, gap_s=gap_s),
        n_parts)


def _lookback_partition(g: pa.Table, key: str, ts_col: str, value_col: str,
                        lookback_s: float) -> pa.Table:
    """Per-event lookback aggregates over one hash partition: sort by
    (key, ts); per key segment, one vectorized searchsorted gives each
    row its window start and prefix sums give sum/count in O(n log n).
    SQL RANGE-frame semantics: the window is [ts - lookback_s, ts] and
    includes ALL peers sharing the row's timestamp."""
    from ..shuffle import int_types_mapper, to_arrow_clean

    key_t = g.schema.field(key).type
    df = g.to_pandas(types_mapper=int_types_mapper)
    df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
    n = len(df)
    ts_valid = df[ts_col].notna().to_numpy()
    ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
    # null values sum as 0 (SQL SUM skips nulls; COUNT(*) still counts
    # the row); null TIMESTAMPS get null outputs and never enter a
    # window — NaT.astype(int64) is INT64_MIN and would break the
    # sorted precondition of searchsorted for the whole key
    vals = df[value_col].astype("float64").fillna(0.0).to_numpy()
    codes = pd.factorize(df[key], use_na_sentinel=False)[0]
    lb_n = np.zeros(n, np.float64)
    lb_sum = np.zeros(n, np.float64)
    vi = np.flatnonzero(ts_valid)
    tsv, valsv, codesv = ts[vi], vals[vi], codes[vi]
    seg_bounds = np.flatnonzero(np.r_[True, codesv[1:] != codesv[:-1], True])
    for s, e in zip(seg_bounds[:-1], seg_bounds[1:]):
        seg = tsv[s:e]
        lo = np.searchsorted(seg, seg - lookback_s, side="left")
        hi = np.searchsorted(seg, seg, side="right")
        csum = np.concatenate([[0.0], np.cumsum(valsv[s:e])])
        lb_n[vi[s:e]] = hi - lo
        lb_sum[vi[s:e]] = csum[hi] - csum[lo]
    lb_n[~ts_valid] = np.nan
    lb_sum[~ts_valid] = np.nan
    out = df.drop(columns="__part")
    out["lb_n"] = pd.array(lb_n, dtype="Int64")
    out["lb_sum"] = lb_sum
    if (~ts_valid).any():
        out.loc[~ts_valid, "lb_sum"] = None
    t = to_arrow_clean(out)
    return _pin_key_type(t, key, key_t)


def lookback_agg(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
                 lookback_s: float,
                 num_partitions: int | None = None) -> rd.Dataset:
    """Per-event rolling features (beyond the reference surface): for
    every event, the count and sum of the SAME key's events in the
    trailing ``[ts - lookback_s, ts]`` window — SQL's
    ``RANGE BETWEEN lookback PRECEDING AND CURRENT ROW`` frame, the
    standard feature-engineering primitive for training data.

    Shape: hash-partition full rows by key (a key's whole history must
    co-locate — document the hot-key caveat; a two-phase bucket split
    like :func:`session` does not apply because windows cross bucket
    boundaries), then one vectorized pass per partition."""
    import functools

    from ..shuffle import group_map, hash_partition, int_types_mapper, partition_count

    n_parts = partition_count(num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        kdf = batch.select([key]).to_pandas(types_mapper=int_types_mapper)
        return batch.append_column(
            "__part", pa.array(hash_partition(kdf, [key], n_parts)))

    return group_map(
        ds.map_batches(add_part, batch_format="pyarrow"), "__part",
        functools.partial(_lookback_partition, key=key, ts_col=ts_col,
                          value_col=value_col, lookback_s=lookback_s),
        n_parts)
