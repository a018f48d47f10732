"""Bit-packing and frame-of-reference (FOR) for integer columns.

Vectorized numpy kernels: values are reduced to unsigned deltas from a
frame minimum (optionally after delta-encoding sorted runs), then packed
to ``ceil(log2(range))`` bits each via ``np.packbits``. Decode reverses
exactly — bit-identity guaranteed for all int64/int32 inputs including
negatives (handled by the int64 frame minimum).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import Codec, apply_nulls, frame, split_nulls, unframe


def pack_uints(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into `width` bits each (little-endian bit order)."""
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    v = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_uints(data: bytes, width: int, n: int) -> np.ndarray:
    if n == 0 or width == 0:
        return np.zeros(n, np.uint64)
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")[: n * width]
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def _width_for(max_val: int) -> int:
    return int(max_val).bit_length() if max_val > 0 else 0


class ForCodec(Codec):
    """Frame-of-reference + optional delta + bit-packing for integers.

    Mode ``delta`` is chosen automatically when the column is sorted
    (deltas are then non-negative and tiny). Reference ancestry: the
    derived-integer columns of SURVEY §1.2 / §7.3.6a.
    """

    name = "for"

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        typ = str(arr.type)
        filled, validity = split_nulls(arr)
        v = np.asarray(filled, dtype=np.int64)
        n = len(v)
        mode = "for"
        if n > 1:
            d = np.diff(v)
            if np.all(d >= 0):
                mode = "delta"
                first = int(v[0])
                work = d
            else:
                work = v
        else:
            work = v
        if mode == "for":
            first = 0
        base = int(work.min()) if len(work) else 0
        # modular (wrapping) subtraction → bit-reinterpret as uint64 so the
        # full int64 domain round-trips even when max-min exceeds 2^63
        rel = (work - np.int64(base)).view(np.uint64)
        width = _width_for(int(rel.max()) if len(rel) else 0)
        packed = pack_uints(rel, width)
        head = struct.pack("<qqiB", base, first, n, width) + (b"D" if mode == "delta" else b"F")
        return frame([head, packed, validity]), {"type": typ, "mode": mode, "width": width}

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        head, packed, validity = unframe(payload)
        base, first, n, width = struct.unpack_from("<qqiB", head)
        mode = head[21:22]
        if mode == b"D":
            deltas = unpack_uints(packed, width, max(n - 1, 0)).view(np.int64) + np.int64(base)
            v = np.empty(n, np.int64)
            if n:
                v[0] = first
                if n > 1:
                    np.cumsum(deltas, out=v[1:])
                    v[1:] += np.int64(first)
        else:
            base_u = np.array(base, np.int64).view(np.uint64)
            v = (unpack_uints(packed, width, n) + base_u).view(np.int64)
        out = pa.array(v).cast(meta["type"])
        return apply_nulls(out, validity)

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        n = stats["n"]
        width = stats.get("int_width", 32)
        return n * width / 8 + 64
