"""Codec interface, payload framing, null handling, and the plain codec.

Every codec maps one ``pyarrow.Array`` (one column of one chunk) to a
self-contained ``(payload: bytes, meta: dict)`` and back, bit-exact.
Payloads are multi-section byte frames; meta is a small JSON-able dict
recorded in the chunk row and (summarized) in the partition manifest.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"NRC1"


def frame(sections: list[bytes]) -> bytes:
    """[MAGIC][u32 n][u64 len...][bytes...] — simple self-describing frame."""
    head = MAGIC + struct.pack("<I", len(sections))
    head += b"".join(struct.pack("<Q", len(s)) for s in sections)
    return head + b"".join(sections)


def unframe(payload: bytes) -> list[bytes]:
    assert payload[:4] == MAGIC, "bad codec payload magic"
    (n,) = struct.unpack_from("<I", payload, 4)
    lens = struct.unpack_from(f"<{n}Q", payload, 8)
    out = []
    off = 8 + 8 * n
    for ln in lens:
        out.append(payload[off : off + ln])
        off += ln
    return out


def split_nulls(arr: pa.Array) -> tuple[pa.Array, bytes]:
    """Return (null-free array with nulls replaced by type default, packed
    validity bitmap or b"" when no nulls)."""
    if arr.null_count == 0:
        return arr, b""
    valid = np.asarray(arr.is_valid())
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        filled = arr.fill_null("")
    elif pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        filled = arr.fill_null(b"")
    else:
        filled = arr.fill_null(0)
    return filled, np.packbits(valid, bitorder="little").tobytes()


def apply_nulls(arr: pa.Array, validity: bytes) -> pa.Array:
    if not validity:
        return arr
    valid = np.unpackbits(np.frombuffer(validity, np.uint8), bitorder="little")[: len(arr)].astype(bool)
    mask = pa.array(~valid)  # True = null
    import pyarrow.compute as pc

    return pc.if_else(mask, pa.nulls(len(arr), arr.type), arr)


def strings_to_buffer(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """String/binary array → (uint8 data buffer, int64 lengths). Zero-copy
    via the Arrow offsets/data buffers where possible."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_string(arr.type) else pa.large_binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    data = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return data, lengths


def digest_column(col, algo: str = "sha256",
                  digest_size: int | None = None) -> "pa.Array":
    """Per-row hex digests straight off the Arrow data buffer (nulls
    hash as ``""``). Digesting is inherently per-value, but everything
    around the hashlib call is zero-copy: each digest reads a
    memoryview slice of the batch's concatenated utf-8 buffer —
    identical values to ``algo(text.encode()).hexdigest()``. THE single
    digest loop shared by exact dedup (sha256) and fingerprinting
    (blake2b) so buffer-slicing fixes land in one place."""
    import hashlib
    import pyarrow.compute as pc

    col = pc.fill_null(col, "")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    data, lengths = strings_to_buffer(col)
    mv = memoryview(data)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    if digest_size is not None:
        ctor = getattr(hashlib, algo)
        mk = lambda b: ctor(b, digest_size=digest_size)  # noqa: E731
    else:
        mk = getattr(hashlib, algo)
    return pa.array([mk(mv[s:e]).hexdigest()
                     for s, e in zip(starts.tolist(), ends.tolist())])


def buffer_to_strings(data: np.ndarray, lengths: np.ndarray, typ: pa.DataType) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    kind = pa.large_string() if typ in (pa.string(), pa.large_string()) else pa.large_binary()
    large = pa.Array.from_buffers(
        kind, len(lengths), [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())]
    )
    return large.cast(typ)


class Codec:
    name: str = "abstract"

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        raise NotImplementedError

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        raise NotImplementedError

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        """Predicted encoded bytes (cheap, from stats; used by the chooser)."""
        raise NotImplementedError


def _ipc_serialize(arr: pa.Array) -> bytes:
    table = pa.table({"v": arr})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _ipc_deserialize(data: bytes) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(data)) as r:
        t = r.read_all()
    return t.column("v").combine_chunks()


class PlainCodec(Codec):
    """Arrow-IPC passthrough — the always-correct fallback; downstream
    parquet page compression (zstd) still applies to the payload."""

    name = "plain"

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        return frame([_ipc_serialize(arr)]), {"type": str(arr.type)}

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        return _ipc_deserialize(unframe(payload)[0])

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        return float(stats["nbytes"])
