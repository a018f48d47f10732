"""Dictionary codec for low-cardinality columns (repo, lang, ...).

Layout: bit-packed codes (width = ceil(log2(cardinality))) + the
dictionary values as one concatenated buffer with FOR-packed lengths.
Built from scratch on ``pyarrow.compute.dictionary_encode`` +
numpy bit-packing (SURVEY §7.3.6a).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, apply_nulls, buffer_to_strings, frame, split_nulls, strings_to_buffer, unframe
from .bitpack import pack_uints, unpack_uints, _width_for

# hex-packing of dictionary values: commit-hash-like columns are
# lowercase-hex of even length; two chars pack to one byte (zstd can't
# model 4-bit-per-char text this tightly). 255 = not a hex digit.
_HEX_VAL = np.full(256, 255, np.uint8)
for _i, _ch in enumerate(b"0123456789abcdef"):
    _HEX_VAL[_ch] = _i
_HEX_CHR = np.frombuffer(b"0123456789abcdef", np.uint8)


def _try_hex_pack(data: np.ndarray, lengths: np.ndarray) -> np.ndarray | None:
    """Packed nibbles if every value is even-length lowercase hex, else
    None. Even per-value lengths keep char pairs value-aligned in the
    concatenated buffer."""
    if data.size == 0 or (lengths % 2).any():
        return None
    nib = _HEX_VAL[data]
    if (nib == 255).any():
        return None
    return (nib[0::2] << 4) | nib[1::2]


def _hex_unpack(packed: np.ndarray) -> np.ndarray:
    out = np.empty(packed.size * 2, np.uint8)
    out[0::2] = _HEX_CHR[packed >> 4]
    out[1::2] = _HEX_CHR[packed & 15]
    return out


class DictCodec(Codec):
    name = "dict"

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        typ = str(arr.type)
        filled, validity = split_nulls(arr)
        denc = pc.dictionary_encode(filled)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64).astype(np.uint64)
        dictionary = denc.dictionary
        card = len(dictionary)
        width = _width_for(max(card - 1, 0))
        packed = pack_uints(codes, width)
        if pa.types.is_string(dictionary.type) or pa.types.is_large_string(dictionary.type) \
                or pa.types.is_binary(dictionary.type) or pa.types.is_large_binary(dictionary.type):
            data, lengths = strings_to_buffer(dictionary)
            packed_hex = _try_hex_pack(data, lengths)
            if packed_hex is not None:
                dict_kind = b"H"
                dict_buf = packed_hex.tobytes()
            else:
                dict_kind = b"S"
                dict_buf = data.tobytes()
            len_buf = lengths.astype(np.int64).tobytes()
        else:
            dict_kind = b"I"
            dict_buf = np.asarray(dictionary, dtype=np.int64).tobytes()
            len_buf = b""
        head = struct.pack("<IIB", len(arr), card, width) + dict_kind
        return (
            frame([head, packed, dict_buf, len_buf, validity]),
            {"type": typ, "cardinality": card, "width": width},
        )

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        head, packed, dict_buf, len_buf, validity = unframe(payload)
        n, card, width = struct.unpack_from("<IIB", head)
        dict_kind = head[9:10]
        codes = unpack_uints(packed, width, n).astype(np.int32)
        typ = pa.type_for_alias(meta["type"]) if isinstance(meta["type"], str) else meta["type"]
        if dict_kind in (b"S", b"H"):
            lengths = np.frombuffer(len_buf, np.int64)
            data = np.frombuffer(dict_buf, np.uint8)
            if dict_kind == b"H":
                data = _hex_unpack(data)
            dictionary = buffer_to_strings(data, lengths, typ)
        else:
            dictionary = pa.array(np.frombuffer(dict_buf, np.int64)).cast(typ)
        out = pc.take(dictionary, pa.array(codes))
        return apply_nulls(out, validity)

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        n, card = stats["n"], max(stats["distinct"], 1)
        sample_n = max(stats.get("sample_n", n), 1)
        if card >= 0.5 * sample_n:  # sampled distinct saturated → extrapolate
            card = max(int(card / sample_n * n), card)
        width = _width_for(card - 1)
        return n * width / 8 + card * stats.get("avg_len", 8) + 64
