"""Run-length codec for sorted/runny columns (path prefixes, commit runs).

Runs are detected vectorized (``values[1:] != values[:-1]``); run values
are themselves encoded with the dictionary codec (runs of a sorted
column are usually still low-cardinality within a chunk) and run lengths
with frame-of-reference bit-packing.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, apply_nulls, frame, split_nulls, unframe
from .bitpack import ForCodec


class RleCodec(Codec):
    name = "rle"

    def __init__(self):
        self._for = ForCodec()

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        from .dict_codec import DictCodec

        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        typ = str(arr.type)
        filled, validity = split_nulls(arr)
        n = len(filled)
        if n == 0:
            starts = np.zeros(0, np.int64)
        else:
            neq = pc.not_equal(filled.slice(1), filled.slice(0, n - 1))
            neq_np = np.asarray(neq.fill_null(True))
            starts = np.concatenate([[0], np.flatnonzero(neq_np) + 1]).astype(np.int64)
        run_values = filled.take(pa.array(starts)) if n else filled
        run_lengths = np.diff(np.concatenate([starts, [n]])).astype(np.int64) if n else np.zeros(0, np.int64)
        val_payload, val_meta = DictCodec().encode(run_values)
        len_payload, _ = self._for.encode(pa.array(run_lengths))
        head = struct.pack("<II", n, len(starts))
        return (
            frame([head, val_payload, len_payload, validity]),
            {"type": typ, "runs": len(starts), "value_meta": val_meta},
        )

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        from .dict_codec import DictCodec

        head, val_payload, len_payload, validity = unframe(payload)
        n, n_runs = struct.unpack_from("<II", head)
        run_values = DictCodec().decode(val_payload, meta["value_meta"])
        run_lengths = np.asarray(self._for.decode(len_payload, {"type": "int64"}), dtype=np.int64)
        idx = np.repeat(np.arange(n_runs, dtype=np.int64), run_lengths)
        out = pc.take(run_values, pa.array(idx))
        return apply_nulls(out, validity)

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        runs = max(stats.get("runs", stats["n"]), 1)
        return runs * (stats.get("avg_len", 8) + 2) + stats["n"] * 0.02 + 64
