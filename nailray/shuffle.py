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
