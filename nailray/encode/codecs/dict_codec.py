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
        if dict_kind == b"S":
            lengths = np.frombuffer(len_buf, np.int64)
            dictionary = buffer_to_strings(np.frombuffer(dict_buf, np.uint8), lengths, typ)
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
