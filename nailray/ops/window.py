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
from ray.data.aggregate import Count, Sum


def tumbling(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
             width: str = "hour") -> rd.Dataset:
    """Fixed windows = floor the timestamp, then a plain groupby
    (no per-group logic needed — the cheapest window shape)."""
    def win(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "window_start", pc.floor_temporal(batch.column(ts_col), unit=width))

    return (ds.map_batches(win, batch_format="pyarrow")
            .groupby([key, "window_start"])
            .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value")))


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

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby([key, "window_start_s"])
            .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value")))


def session(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
            gap_s: float, bucket_s: float | None = None) -> rd.Dataset:
    """Session windows: per key, a new session starts where the gap to
    the previous event exceeds ``gap_s``. Output one row per session:
    key, session_start, n, sum_value.

    Scalable two-phase shape (a hot key no longer serializes its whole
    event stream through one task): phase 1 sessionizes each
    (key, coarse-time-bucket) group independently; phase 2 merges
    adjacent sessions per key over session SUMMARIES (≪ events) —
    within a bucket adjacent sessions are > gap_s apart by
    construction, so only bucket-boundary sessions ever merge, and the
    result is exactly the single-pass sessionization."""
    if bucket_s is None:
        bucket_s = gap_s * 1000  # summaries stay tiny; hot keys split well

    def bucketize(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        b = np.asarray(ts_us) // int(bucket_s * 1e6)
        return batch.append_column("__bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(float("inf"))
        sid = (gap > gap_s).cumsum()
        agg = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n=(ts_col, "count"),
            sum_value=(value_col, "sum"),
        ).reset_index(drop=True)
        agg[key] = g[key].iloc[0]
        return agg[[key, "session_start", "session_end", "n", "sum_value"]]

    partial = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby([key, "__bucket"])
               .map_groups(per_bucket, batch_format="pandas"))

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start")
        gap = (g["session_start"] - g["session_end"].shift()) \
            .dt.total_seconds().fillna(float("inf"))
        mid = (gap > gap_s).cumsum()
        agg = g.groupby(mid).agg(
            session_start=("session_start", "min"),
            n=("n", "sum"),
            sum_value=("sum_value", "sum"),
        ).reset_index(drop=True)
        agg[key] = g[key].iloc[0]
        return agg[[key, "session_start", "n", "sum_value"]]

    return partial.groupby(key).map_groups(merge_key, batch_format="pandas")
