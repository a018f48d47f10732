"""Codec registry: name → codec instance.

The registry is the engine's user-extension surface (SURVEY §2.10): a
new codec is registered by name with encode/decode/estimate callables.
"""

from __future__ import annotations

from .base import Codec, PlainCodec
from .bitpack import ForCodec, pack_uints, unpack_uints
from .dict_codec import DictCodec
from .prefix import PrefixCodec
from .rle import RleCodec
from .fsst import FsstCodec

_REGISTRY: dict[str, Codec] = {}


def register(codec: Codec) -> None:
    _REGISTRY[codec.name] = codec


def get(name: str) -> Codec:
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


for _c in (PlainCodec(), DictCodec(), RleCodec(), FsstCodec(), ForCodec(),
           PrefixCodec()):
    register(_c)

__all__ = [
    "Codec", "PlainCodec", "DictCodec", "RleCodec", "FsstCodec", "ForCodec",
    "PrefixCodec",
    "register", "get", "names", "pack_uints", "unpack_uints",
]
