"""Per-chunk per-column sampled statistics feeding codec auto-selection.

Deterministic (fixed sample prefix, no RNG) so a resumed run re-derives
identical codec choices for any partition it re-encodes (SURVEY §7.6
"codec choice determinism").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SAMPLE_ROWS = 4096


def column_stats(arr: pa.Array) -> dict:
    """Cheap stats: exact n/nbytes, sampled distinct/runs/avg_len."""
    n = len(arr)
    s = arr.slice(0, min(n, _SAMPLE_ROWS))
    out: dict = {"n": n, "nbytes": arr.nbytes, "sample_n": len(s)}
    if n == 0:
        out.update(distinct=0, runs=0, avg_len=0.0, sorted=True)
        return out
    ls = len(s)
    out["distinct"] = int(pc.count_distinct(s).as_py() or 0)
    if ls > 1:
        neq = pc.not_equal(s.slice(1), s.slice(0, ls - 1))
        sample_runs = 1 + int(pc.sum(neq.fill_null(True).cast(pa.int64())).as_py() or 0)
    else:
        sample_runs = ls
    out["runs"] = int(round(sample_runs / ls * n))
    typ = arr.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ) or pa.types.is_binary(typ):
        out["avg_len"] = float(arr.nbytes - 8 * n) / max(n, 1)
    elif pa.types.is_integer(typ):
        out["avg_len"] = 8.0
        mn = pc.min(s).as_py()
        mx = pc.max(s).as_py()
        rng = (mx - mn) if (mx is not None and mn is not None) else 0
        out["int_width"] = max(int(rng).bit_length(), 1)
        out["sorted"] = bool(
            np.all(np.diff(np.asarray(s.drop_null(), dtype=np.int64)) >= 0)
        ) if ls > 1 else True
    else:
        out["avg_len"] = arr.nbytes / max(n, 1)
    return out


def entropy_estimate(arr: pa.Array, stats: dict) -> float:
    """Sampled byte entropy (bits/byte) for string columns — a guard
    against applying FSST to already-compressed/binary-looking data."""
    from .codecs.base import strings_to_buffer

    s = arr.slice(0, min(len(arr), 512))
    data, _ = strings_to_buffer(s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s)
    data = data[: 1 << 16]
    if len(data) == 0:
        return 0.0
    counts = np.bincount(data, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum())
