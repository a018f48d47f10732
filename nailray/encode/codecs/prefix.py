"""Front-coding (incremental prefix) codec for sorted string columns.

Partitions are written sorted by (repo, path, commit) — `path` within a
partition is lexicographically ordered, so adjacent values share long
prefixes (``api/codec/batch_10059.cpp`` → ``api/codec/batch_10151.py``).
Each value stores only the byte length it shares with its predecessor
(LCP) plus its own suffix; LCPs and suffix lengths are FOR-bit-packed
and the suffix bytes stay one contiguous buffer for the downstream zstd
frame. Classic prefix-B-tree / Parquet DELTA_BYTE_ARRAY shape (public:
Bayer & Unterauer 1977; Parquet format spec), built from scratch on
numpy over the Arrow offsets/data buffers.

Both encode and decode are level-vectorized: the LCP scan advances one
byte position per iteration over the still-matching rows (total work is
linear in shared bytes), and decode resolves byte position ``j`` for
every row at once by gathering from the last preceding row whose own
suffix covers ``j`` (a ``maximum.accumulate`` over entry indices) — no
per-row Python in either direction.

Reference ancestry: the sorted path/commit run encodings of
`src/commands/optimize.rs:18-135` (dictionary+zstd) — this codec is the
engine's stronger replacement for those columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import (Codec, apply_nulls, buffer_to_strings, frame,
                   split_nulls, strings_to_buffer, unframe)
from .bitpack import ForCodec


def _lcp_with_previous(data: np.ndarray, offsets: np.ndarray,
                       lengths: np.ndarray) -> np.ndarray:
    """lcp[i] = shared-prefix byte count of row i with row i-1 (lcp[0]=0).
    Level loop: one vectorized compare per byte position over the rows
    still matching — O(total shared bytes) work."""
    n = len(lengths)
    lcp = np.zeros(n, np.int64)
    if n < 2:
        return lcp
    m = np.minimum(lengths[:-1], lengths[1:])  # bound for rows 1..n-1
    alive = np.flatnonzero(m > 0) + 1  # row indices with a nonzero bound
    j = 0
    while alive.size:
        eq = data[offsets[alive - 1] + j] == data[offsets[alive] + j]
        matched = alive[eq]
        lcp[matched] += 1
        j += 1
        alive = matched[m[matched - 1] > j]
    return lcp


def _gather_ranges(data: np.ndarray, starts: np.ndarray,
                   counts: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[i] : starts[i]+counts[i]] — one gather."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.uint8)
    out_off = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=out_off[1:])
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - out_off, counts)
    return data[idx]


class PrefixCodec(Codec):
    name = "prefix"

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        typ = str(arr.type)
        filled, validity = split_nulls(arr)
        data, lengths = strings_to_buffer(filled)
        offsets = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        lcp = _lcp_with_previous(data, offsets, lengths)
        slen = lengths - lcp
        suffix = _gather_ranges(data, offsets[:-1] + lcp, slen)
        fc = ForCodec()
        lcp_p, _ = fc.encode(pa.array(lcp))
        slen_p, _ = fc.encode(pa.array(slen))
        head = struct.pack("<I", len(lengths))
        return (
            frame([head, suffix.tobytes(), lcp_p, slen_p, validity]),
            {"type": typ, "suffix_bytes": int(slen.sum())},
        )

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        head, suffix_b, lcp_p, slen_p, validity = unframe(payload)
        (n,) = struct.unpack_from("<I", head)
        fc = ForCodec()
        lcp = np.asarray(fc.decode(lcp_p, {"type": "int64"}), dtype=np.int64)
        slen = np.asarray(fc.decode(slen_p, {"type": "int64"}), dtype=np.int64)
        suffix = np.frombuffer(suffix_b, np.uint8)
        lengths = lcp + slen
        out_off = np.zeros(n + 1, np.int64)
        np.cumsum(lengths, out=out_off[1:])
        sstart = np.zeros(n, np.int64)
        if n > 1:
            np.cumsum(slen[:-1], out=sstart[1:])
        out = np.empty(int(out_off[-1]), np.uint8)
        # own-suffix bytes: one scatter
        total = int(slen.sum())
        if total:
            dst = np.arange(total, dtype=np.int64) + np.repeat(
                out_off[:-1] + lcp - sstart, slen)
            out[dst] = suffix
        # prefix bytes, one byte position per level: position j of row i
        # lives in the suffix of the last row k<=i with lcp[k] <= j
        # (front-coding invariant guarantees j < len[k])
        max_lcp = int(lcp.max()) if n else 0
        rows = np.arange(n, dtype=np.int64)
        for j in range(max_lcp):
            need = lcp > j
            if not need.any():
                continue
            src = np.maximum.accumulate(np.where(lcp <= j, rows, -1))
            k = src[need]
            out[out_off[:-1][need] + j] = suffix[sstart[k] + (j - lcp[k])]
        typ = (pa.string() if meta["type"] in ("string", "utf8")
               else pa.large_string() if meta["type"] == "large_string"
               else pa.binary() if meta["type"] == "binary"
               else pa.large_binary())
        res = buffer_to_strings(out, lengths, typ)
        return apply_nulls(res, validity)

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        # sample the real LCP on a small prefix of the chunk
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        s = arr.slice(0, min(len(arr), 512))
        filled, _ = split_nulls(s)
        data, lengths = strings_to_buffer(filled)
        offsets = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        lcp = _lcp_with_previous(data, offsets, lengths)
        shared = float(lcp.sum()) / max(float(lengths.sum()), 1.0)
        return stats["nbytes"] * (1.0 - shared) + stats["n"] * 0.4 + 64
