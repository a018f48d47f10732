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
        ts = np.asarray(pc.cast(batch.column(ts_col), pa.int64())) / 1e6  # epoch sec
        keys = batch.column(key)
        vals = pc.cast(batch.column(value_col), pa.float64())
        out_k, out_w, out_v = [], [], []
        base = (np.floor(ts / slide_s)).astype(np.int64)
        for j in range(k):
            # every event belongs to exactly k slide-aligned windows:
            # starts (base-j)*slide for j in [0, k)
            out_k.append(keys)
            out_w.append(pa.array((base - j) * slide_s))
            out_v.append(vals)
        return pa.table({
            key: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_k]),
            "window_start_s": pa.concat_arrays([a for a in out_w]),
            value_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_v]),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby([key, "window_start_s"])
            .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value")))


def session(ds: rd.Dataset, key: str, ts_col: str, value_col: str,
            gap_s: float) -> rd.Dataset:
    """Session windows: per key, sort by ts; a new session starts where
    the gap to the previous event exceeds ``gap_s``. Output one row per
    session: key, session_start, n, sum_value."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(float("inf"))
        sid = (gap > gap_s).cumsum()
        agg = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            n=(ts_col, "count"),
            sum_value=(value_col, "sum"),
        ).reset_index(drop=True)
        agg[key] = g[key].iloc[0]
        return agg[[key, "session_start", "n", "sum_value"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
