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


def partition_count(num_partitions: int | None = None) -> int:
    if num_partitions:
        return num_partitions
    try:
        import ray

        return max(32, int(ray.cluster_resources().get("CPU", 16)) * 2)
    except Exception:
        return 32


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
